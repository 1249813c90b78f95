"""Spatial domain decomposition over a device mesh (SURVEY.md section 7,
M5; design delta #7).

The domain is cut into S vertical stripes along x, one per device.  Each
device owns the slab of floe slots whose centroids lie in its stripe.  Per
step, inside ``shard_map``:

1. **Halo exchange** — floes within a halo width of a stripe edge are packed
   into fixed-capacity ghost buffers and sent to the neighbor with
   ``lax.ppermute`` over the mesh ring (the TPU-native generalization of the
   reference's ghost-floe machinery, floe_interactions_all.m:18-66; on a
   doubly-periodic domain the ring wraps, so the periodic seam is just
   another stripe boundary).
2. **Contact** — each local floe searches candidates among (local + ghosts);
   the chord antisymmetry again gives Newton's third law with no cross-shard
   force reduction: the mirrored pair is computed by the neighbor shard
   itself.
3. **Trajectory update** — purely local.
4. **Migration** — floes whose centroid crossed into a neighboring stripe
   are packed and transferred (one stripe per step; a floe cannot cross two
   stripe widths in one step at physical velocities), landing in free slots
   of the receiving slab.

The global state layout is one big ``FloeState`` of ``S * n_loc`` slots
sharded along the floe axis; slab s = slots [s*n_loc, (s+1)*n_loc).
Host-side lifecycle surgery operates on the gathered global state at process
cadence and ``rebalance_slabs`` restores the ownership invariant afterwards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..forcing import Forcing
from ..state import FloeState
from ..dynamics.broadphase import neighbor_candidates
from ..dynamics.contact import boundary_contact, contact_forces
from ..dynamics.trajectory import (
    push_stress, stress_from_sums, trajectory_update,
)
from ..dynamics.step import StepAux, domain_polygon

AXIS = "shards"

# ghost-exchange payload: the fields a neighbor needs for contact
GHOST_FIELDS = ("verts_body", "nv", "x", "y", "alpha", "u", "v", "ksi",
                "h", "area", "rmax", "alive")


def slab_bounds(cfg: SimConfig, n_shards: int, s):
    """x-range of stripe s on [-lx, lx]."""
    w = 2.0 * cfg.domain.lx / n_shards
    lo = -cfg.domain.lx + s * w
    return lo, lo + w


def _pack(mask: jnp.ndarray, cap: int):
    """Indices of up to ``cap`` True entries (packed first), + valid mask +
    overflow flag.  jit-safe fixed-shape compaction."""
    n = mask.shape[0]
    order = jnp.argsort(~mask)            # True entries first, stable
    idx = order[:cap]
    valid = mask[idx]
    overflow = jnp.sum(mask) > cap
    return idx, valid, overflow


def _gather_ghost(state: FloeState, idx, valid):
    out = {}
    for f in GHOST_FIELDS:
        arr = getattr(state, f)[idx]
        if f == "alive":
            arr = arr & valid
        out[f] = arr
    return out


def make_spatial_step(cfg: SimConfig, forcing: Forcing, modulus: float,
                      heat_flux: float, mesh: Mesh):
    """Build a jitted sharded ``step(state, step_idx) -> (state, aux)``.

    ``state`` must be sharded along the floe axis over ``mesh`` (use
    ``shard_state``); its capacity must be divisible by the shard count.
    """
    n_shards = int(np.prod(mesh.devices.shape))
    cap_total = cfg.capacity.max_floes
    assert cap_total % n_shards == 0
    n_loc = cap_total // n_shards
    n_ghost = max(min(cfg.capacity.max_ghosts, n_loc), 1)
    domain_verts = domain_polygon(cfg)
    lx, ly = cfg.domain.lx, cfg.domain.ly
    stripe_w = 2.0 * lx / n_shards
    periodic = cfg.processes.periodic

    from jax import shard_map

    def shard_fn(state: FloeState, step_idx, forcing_rep, domain_rep):
        s = jax.lax.axis_index(AXIS)
        x_lo = -lx + s * stripe_w
        x_hi = x_lo + stripe_w

        # halo width: global max interaction radius (2 * max rmax)
        halo = 2.0 * jax.lax.pmax(
            jnp.max(jnp.where(state.alive, state.rmax, 0.0)), AXIS
        )

        # ---- 1. ghost exchange ---------------------------------------
        right_mask = state.alive & (state.x > x_hi - halo)
        left_mask = state.alive & (state.x < x_lo + halo)
        r_idx, r_val, r_of = _pack(right_mask, n_ghost)
        l_idx, l_val, l_of = _pack(left_mask, n_ghost)
        send_r = _gather_ghost(state, r_idx, r_val)
        send_l = _gather_ghost(state, l_idx, l_val)

        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        from_left = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, AXIS, fwd), send_r)
        from_right = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, AXIS, bwd), send_l)

        if not periodic:
            # non-periodic: edge shards discard the wrapped-around ghosts
            edge_l = s == 0
            edge_r = s == n_shards - 1
            from_left["alive"] = from_left["alive"] & ~edge_l
            from_right["alive"] = from_right["alive"] & ~edge_r
        else:
            # periodic seam: ghosts crossing the torus edge are shifted
            wrap_l = jnp.where(s == 0, -2.0 * lx, 0.0)
            wrap_r = jnp.where(s == n_shards - 1, 2.0 * lx, 0.0)
            from_left["x"] = from_left["x"] + wrap_l
            from_right["x"] = from_right["x"] + wrap_r

        ghosts = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b]), from_left, from_right)

        # ---- 2. contact: local queries vs local+ghost sources ---------
        def world(verts_body, alpha, x, y):
            c, si = jnp.cos(alpha), jnp.sin(alpha)
            rot = jnp.stack([jnp.stack([c, -si], -1),
                             jnp.stack([si, c], -1)], axis=-2)
            vr = jnp.einsum("nij,nvj->nvi", rot, verts_body)
            return vr + jnp.stack([x, y], -1)[:, None, :]

        verts_loc = world(state.verts_body, state.alpha, state.x, state.y)
        verts_gho = world(ghosts["verts_body"], ghosts["alpha"],
                          ghosts["x"], ghosts["y"])

        x_src = jnp.concatenate([state.x, ghosts["x"]])
        y_src = jnp.concatenate([state.y, ghosts["y"]])
        r_src = jnp.concatenate([state.rmax, ghosts["rmax"]])
        a_src = jnp.concatenate([state.alive, ghosts["alive"]])

        k_cap = cfg.capacity.max_neighbors
        dom_gate = None if periodic else domain_rep
        if cfg.numerics.overlap_halo:
            # ---- SURVEY M5: halo exchange overlapped with interior
            # contact compute.  The interior pass (all local floes vs
            # LOCAL sources only) has no data dependency on the ppermute
            # above, so the TPU latency-hiding scheduler can run the
            # collective underneath it; only the small packed band pass
            # (floes within a halo width of a slab edge, vs the arrived
            # ghosts) waits for the exchange.  Results merge back into the
            # standard [N, K] pair tables (band entries appended after
            # each row's interior entries), so every downstream consumer —
            # force reduction, merge flags, the lifecycle aux tables — is
            # unchanged.
            nbr_i = neighbor_candidates(
                state.x, state.y, state.rmax, state.alive, k_cap,
                # periodicity in y only: x wrap is realized by the ring
                periodic, 1e30 if periodic else lx, ly,
            )
            pc_i = contact_forces(
                verts_loc, state.x, state.y, state.u, state.v, state.ksi,
                state.h, state.area, nbr_i, modulus, cfg,
                nv=state.nv, domain_verts=dom_gate, axis_names=(AXIS,),
            )

            # band floes = exactly the send masks: a local floe can reach
            # a ghost only if it sits within one halo width of a slab edge
            band_mask = right_mask | left_mask
            n_band = max(min(2 * n_ghost, n_loc), 1)
            b_idx, b_val, band_of = _pack(band_mask, n_band)
            kg = min(k_cap, 2 * n_ghost)
            nbr_b = neighbor_candidates(
                state.x[b_idx], state.y[b_idx], state.rmax[b_idx],
                state.alive[b_idx] & b_val, kg,
                periodic, 1e30 if periodic else lx, ly,
                src=(ghosts["x"], ghosts["y"], ghosts["rmax"],
                     ghosts["alive"], 0),
            )
            pc_b = contact_forces(
                verts_loc[b_idx], state.x[b_idx], state.y[b_idx],
                state.u[b_idx], state.v[b_idx], state.ksi[b_idx],
                state.h[b_idx], state.area[b_idx], nbr_b, modulus, cfg,
                src=(verts_gho, ghosts["x"], ghosts["y"], ghosts["u"],
                     ghosts["v"], ghosts["ksi"], ghosts["h"],
                     ghosts["area"]),
                nv=state.nv[b_idx], nv_s=ghosts["nv"],
                domain_verts=dom_gate, axis_names=(AXIS,),
            )

            pc, nbr = _merge_band(pc_i, nbr_i, pc_b, nbr_b, b_idx, b_val,
                                  kg, k_cap, n_loc, band_of)
        else:
            nbr = neighbor_candidates(
                state.x, state.y, state.rmax, state.alive, k_cap,
                # periodicity in y only: x wrap is realized by the ring
                periodic, 1e30 if periodic else lx, ly,
                src=(x_src, y_src, r_src, a_src, n_loc),
            )
            src = (
                jnp.concatenate([verts_loc, verts_gho]),
                x_src, y_src,
                jnp.concatenate([state.u, ghosts["u"]]),
                jnp.concatenate([state.v, ghosts["v"]]),
                jnp.concatenate([state.ksi, ghosts["ksi"]]),
                jnp.concatenate([state.h, ghosts["h"]]),
                jnp.concatenate([state.area, ghosts["area"]]),
            )
            pc = contact_forces(
                verts_loc, state.x, state.y, state.u, state.v, state.ksi,
                state.h, state.area, nbr, modulus, cfg, src=src,
                nv=state.nv,
                nv_s=jnp.concatenate([state.nv, ghosts["nv"]]),
                domain_verts=dom_gate,
                axis_names=(AXIS,),
            )

        if not periodic:
            bc = boundary_contact(
                verts_loc, state.x, state.y, state.u, state.v, state.ksi,
                state.h, state.area, state.alive, domain_rep, modulus, cfg,
                nv=state.nv, axis_names=(AXIS,),
            )
            # wall component zeroing applied inside boundary_contact
            b_fx, b_fy, b_px, b_py = bc.fx, bc.fy, bc.px, bc.py
            b_tq, b_sxx, b_syy, b_sxy = bc.tq, bc.sxx, bc.syy, bc.sxy
            b_overlap, b_absorb, b_out = bc.overlap, bc.absorb, bc.out
            b_rov = bc.region_overflow
            b_need = bc.region_need
        else:
            zn = jnp.zeros_like(state.x)
            b_fx = b_fy = b_px = b_py = b_overlap = zn
            b_tq = b_sxx = b_syy = b_sxy = zn
            b_absorb = b_out = jnp.zeros_like(state.alive)
            b_rov = jnp.zeros((), bool)
            b_need = jnp.zeros((), jnp.int32)

        f_valid = (jnp.abs(pc.fx) + jnp.abs(pc.fy)) > 0
        b_valid = (jnp.abs(b_fx) + jnp.abs(b_fy)) > 0
        cf_x = jnp.sum(pc.fx, axis=1) + b_fx
        cf_y = jnp.sum(pc.fy, axis=1) + b_fy
        cf_t = jnp.sum(pc.tq, axis=1) + b_tq

        # Virial sums Σ (p - r) ⊗ F, precomputed in the narrow phase
        # (per-region exact).
        s_new = stress_from_sums(
            state,
            jnp.sum(pc.sxx, axis=1) + b_sxx,
            jnp.sum(pc.syy, axis=1) + b_syy,
            jnp.sum(pc.sxy, axis=1) + b_sxy,
        )
        state = push_stress(state, s_new, step_idx)
        state = state.replace(
            overlap_area=jnp.sum(pc.overlap, axis=1) + b_overlap)

        alive_before = state.alive
        killed = b_absorb | b_out
        if cfg.processes.kill_below_ymin and not periodic:
            killed = killed | (state.alive & (
                jnp.min(verts_loc[..., 1], axis=1)
                < jnp.min(domain_rep[:, 1])))
        exported = alive_before & killed  # mass leaves the domain
        if not cfg.processes.keep_min:
            killed = killed | (state.area < cfg.min_floe_size)
        state = state.replace(alive=state.alive & ~killed)

        do_int = (step_idx % cfg.processes.n_ocean_force) == 0
        state = trajectory_update(
            state, forcing_rep, cf_x, cf_y, cf_t, heat_flux, do_int, cfg)

        # ---- periodic wrap in x/y ------------------------------------
        if periodic:
            xw = state.x
            yw = state.y
            xw = jnp.where(jnp.abs(xw) > lx, xw - 2 * lx * jnp.sign(xw), xw)
            yw = jnp.where(jnp.abs(yw) > ly, yw - 2 * ly * jnp.sign(yw), yw)
            state = state.replace(x=xw, y=yw)

        # ---- 4. migration --------------------------------------------
        # Direction by MINIMUM-IMAGE offset from the slab center: a floe
        # that wrapped across the torus seam (x: -lx -> +lx) is one hop to
        # the LEFT neighbor on the ring, not n_shards-1 hops right — a
        # naive x >= x_hi test would keep it mis-owned (contacts computed
        # against the wrong halo) for several steps.
        if periodic:
            block_r = jnp.zeros((), bool)
            block_l = jnp.zeros((), bool)
            slab_w = x_hi - x_lo
            dx_c = state.x - 0.5 * (x_lo + x_hi)
            dx_c = dx_c - 2 * lx * jnp.round(dx_c / (2 * lx))
            go_right = state.alive & (dx_c >= 0.5 * slab_w)
            go_left = state.alive & (dx_c < -0.5 * slab_w)
        else:
            block_r = s == n_shards - 1
            block_l = s == 0
            go_right = state.alive & (state.x >= x_hi) & ~block_r
            go_left = state.alive & (state.x < x_lo) & ~block_l
        state, mig_of = _migrate(state, go_right, go_left, n_ghost,
                                 n_shards, periodic)

        # global sum FIRST, then halve: a cross-shard pair contributes one
        # endpoint to each of two shards (local //2 would drop it)
        n_collisions = (
            jax.lax.psum(jnp.sum(f_valid.astype(jnp.int32)), AXIS) // 2
            + jax.lax.psum(jnp.sum(b_valid.astype(jnp.int32)), AXIS)
        ).astype(jnp.int32)

        aux = StepAux(
            n_collisions=n_collisions,
            merge_i=pc.merge_i, merge_j=pc.merge_j,
            absorb_boundary=b_absorb,
            killed=alive_before & ~state.alive,
            exported=exported,
            nbr_overflow=nbr.overflow | r_of | l_of | mig_of,
            nbr_demand=jax.lax.pmax(nbr.demand.astype(jnp.int32), AXIS),
            overlap_area=state.overlap_area,
            collision_force=jnp.stack([cf_x, cf_y], -1),
            collision_torque=cf_t,
            nbr_idx=nbr.idx.astype(jnp.int32),
            pair_valid=f_valid,
            pair_px=pc.px, pair_py=pc.py,
            pair_fx=pc.fx, pair_fy=pc.fy, pair_overlap=pc.overlap,
            boundary_contact=b_valid | (b_overlap > 0),
            region_overflow=jax.lax.psum((pc.region_overflow | b_rov).astype(jnp.int32), AXIS) > 0,
            # pc/bc region_need are already globally psum'd (axis_names)
            region_pool_need=pc.region_need + b_need,
            pair_pool_overflow=pc.pair_pool_overflow,
            pair_pool_need=pc.pair_pool_need.astype(jnp.int32),
        )
        return state, aux

    state_spec = P(AXIS)
    fields = [f.name for f in __import__("dataclasses").fields(FloeState)]
    state_specs = FloeState(**{f: state_spec for f in fields})
    aux_specs = StepAux(
        n_collisions=P(), merge_i=state_spec, merge_j=state_spec,
        absorb_boundary=state_spec, killed=state_spec, exported=state_spec,
        nbr_overflow=P(), nbr_demand=P(),
        overlap_area=state_spec, collision_force=state_spec,
        collision_torque=state_spec, nbr_idx=state_spec,
        pair_valid=state_spec, pair_px=state_spec, pair_py=state_spec,
        pair_fx=state_spec, pair_fy=state_spec, pair_overlap=state_spec,
        boundary_contact=state_spec, region_overflow=P(),
        region_pool_need=P(), pair_pool_overflow=P(), pair_pool_need=P(),
    )

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(state_specs, P(), P(), P()),
        out_specs=(state_specs, aux_specs),
        check_vma=False,
    )

    @jax.jit
    def step(state: FloeState, step_idx, domain=None):
        """``domain``: runtime domain polygon override (moving walls —
        the uniaxial case closes the y-walls while the x-stripe
        decomposition stays fixed)."""
        dom = domain_verts if domain is None else domain
        return sharded(state, step_idx, forcing, dom)

    return step


def _merge_band(pc_i, nbr_i, pc_b, nbr_b, b_idx, b_val, kg: int,
                k_cap: int, n_loc: int, band_of):
    """Merge the packed band pass's pair tables into the interior tables
    (SURVEY M5 overlapped halo exchange; shared by the 1-D slab and 2-D
    tile meshes).  Both row kinds are valid-prefix (the top-K argmax
    selects valid candidates first), so band entries append at each row's
    interior count; ghost indices offset past the local slots, matching
    the concatenated-source convention downstream consumers expect."""
    v_int = jnp.sum(nbr_i.valid.astype(jnp.int32), axis=1)      # [N]
    pos = v_int[b_idx][:, None] + jnp.arange(kg)[None, :]       # [B, kg]
    okw = nbr_b.valid & b_val[:, None]
    pos_w = jnp.where(okw, pos, k_cap)      # out of bounds -> dropped
    rows = jnp.broadcast_to(b_idx[:, None], pos.shape)

    def put(dst, srcv):
        return dst.at[rows, pos_w].set(srcv, mode="drop")

    pc = pc_i._replace(
        fx=put(pc_i.fx, pc_b.fx), fy=put(pc_i.fy, pc_b.fy),
        px=put(pc_i.px, pc_b.px), py=put(pc_i.py, pc_b.py),
        tq=put(pc_i.tq, pc_b.tq),
        sxx=put(pc_i.sxx, pc_b.sxx), syy=put(pc_i.syy, pc_b.syy),
        sxy=put(pc_i.sxy, pc_b.sxy),
        overlap=put(pc_i.overlap, pc_b.overlap),
        merge_i=put(pc_i.merge_i, pc_b.merge_i),
        merge_j=put(pc_i.merge_j, pc_b.merge_j),
        region_overflow=pc_i.region_overflow | pc_b.region_overflow,
        region_need=pc_i.region_need + pc_b.region_need,
        pair_pool_overflow=(pc_i.pair_pool_overflow
                            | pc_b.pair_pool_overflow),
        pair_pool_need=(pc_i.pair_pool_need
                        + pc_b.pair_pool_need).astype(jnp.int32),
    )
    vg = jnp.zeros((n_loc,), jnp.int32).at[b_idx].add(
        jnp.sum(okw.astype(jnp.int32), axis=1) * b_val)
    # demand upper bound covering the band rows' PRE-clamp ghost candidate
    # counts (nbr_b.demand): a band row with more ghost contacts than kg
    # must raise overflow and report a demand that, once adopted as K,
    # stops the truncation — vg alone is post-clamp and would under-report
    # it (leaving contacts silently dropped forever).
    band_int_max = jnp.max(jnp.where(b_val, v_int[b_idx], 0))
    demand = jnp.maximum(jnp.max(v_int + vg),
                         jnp.maximum(nbr_i.demand,
                                     band_int_max + nbr_b.demand))
    nbr = nbr_i._replace(
        idx=put(nbr_i.idx, nbr_b.idx + n_loc),
        valid=put(nbr_i.valid, okw),
        overflow=(nbr_i.overflow | nbr_b.overflow | band_of
                  | (jnp.max(v_int + vg) > k_cap)
                  | jnp.any(okw & (pos >= k_cap))),
        demand=demand,
    )
    return pc, nbr


def _migrate(state: FloeState, go_right, go_left, cap: int, n_shards: int,
             periodic: bool, axis: str = AXIS):
    """Transfer out-of-stripe floes to ring neighbors into free slots."""
    fields = [f.name for f in __import__("dataclasses").fields(FloeState)]

    def pack_payload(mask):
        idx, valid, of = _pack(mask, cap)
        payload = {f: getattr(state, f)[idx] for f in fields}
        payload["alive"] = payload["alive"] & valid
        return payload, of

    pay_r, of_r = pack_payload(go_right)
    pay_l, of_l = pack_payload(go_left)
    # remove migrated floes locally
    state = state.replace(alive=state.alive & ~(go_right | go_left))

    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    in_l = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis, fwd), pay_r)
    in_r = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis, bwd), pay_l)

    incoming = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b]), in_l, in_r)

    # pack incoming so live entries come first, then pair them with the
    # first free local slots (at most one slab's worth)
    n_loc = state.alive.shape[0]
    n_in = min(incoming["alive"].shape[0], n_loc)
    in_order = jnp.argsort(~incoming["alive"])
    dropped = jnp.any(incoming["alive"][in_order[n_in:]]) if (
        incoming["alive"].shape[0] > n_in) else jnp.zeros((), bool)
    incoming = {f: v[in_order[:n_in]] for f, v in incoming.items()}

    free = ~state.alive
    slots = jnp.argsort(~free)[:n_in]   # free slots first
    can = free[slots]
    write = can & incoming["alive"]
    # a live incoming floe without a free slot = capacity overflow
    ins_of = jnp.any(incoming["alive"] & ~can) | dropped

    upd = {}
    for f in fields:
        if f == "alive":
            continue
        cur = getattr(state, f)
        val = incoming[f]
        sel = jnp.where(
            write.reshape((-1,) + (1,) * (val.ndim - 1)), val, cur[slots])
        upd[f] = cur.at[slots].set(sel)
    upd["alive"] = state.alive.at[slots].set(state.alive[slots] | write)
    state = state.replace(**upd)
    return state, of_r | of_l | ins_of


def shard_state(state: FloeState, mesh: Mesh):
    """Device-put a FloeState sharded along the floe axis."""
    spec = NamedSharding(mesh, P(AXIS))

    def put(a):
        return jax.device_put(a, spec)

    return jax.tree_util.tree_map(put, state)


def rebalance_slabs(state: FloeState, cfg: SimConfig, n_shards: int,
                    ) -> FloeState:
    """Host-side: reorder floes so each lives in the slab owning its
    centroid (called after lifecycle surgery)."""
    import dataclasses

    cap = cfg.capacity.max_floes
    n_loc = cap // n_shards
    lx = cfg.domain.lx
    w = 2.0 * lx / n_shards

    arrs = {f.name: np.asarray(getattr(state, f.name))
            for f in dataclasses.fields(state)}
    alive = arrs["alive"]
    owner = np.clip(((arrs["x"] + lx) // w).astype(int), 0, n_shards - 1)

    # Vectorized slot assignment: sort live floes by owner slab (stable), go
    # to consecutive slots within each slab block — one fancy-indexed copy
    # per field instead of a per-floe Python loop (VERDICT round-1 item 4).
    live_idx = np.nonzero(alive)[0]
    order = np.argsort(owner[live_idx], kind="stable")
    src = live_idx[order]                       # sources grouped by slab
    own_sorted = owner[src]
    counts = np.bincount(own_sorted, minlength=n_shards)
    if np.any(counts > n_loc):
        s = int(np.argmax(counts > n_loc))
        raise RuntimeError(
            f"slab {s} over capacity during rebalance "
            f"(raise max_floes or shard count)")
    within = np.arange(len(src)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    dst = own_sorted * n_loc + within

    new = {k: v.copy() for k, v in arrs.items()}
    new["alive"][:] = False
    for k, v in arrs.items():
        new[k][dst] = v[src]
    new["alive"][dst] = True

    import jax.numpy as jnp

    return state.replace(**{
        k: jnp.asarray(v, getattr(state, k).dtype) for k, v in new.items()
    })

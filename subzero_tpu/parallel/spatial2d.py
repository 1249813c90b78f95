"""2-D (x, y) tile decomposition over a 2-axis device mesh.

The 1-D stripe decomposition (``parallel/spatial.py``) scales poorly when
floes cluster (the reference's gyres concentrate the pack): one stripe can
own most of the population.  Here the domain is cut into ``Sx x Sy`` tiles
over a ``Mesh(devices.reshape(Sx, Sy), ("sx", "sy"))``; each tile owns the
floes whose centroid lies inside it.

Halo exchange follows the reference's ghost construction order
(floe_interactions_all.m:18-66: X ghosts first, then Y ghosts over the
extended list): ppermute over "sx" exchanges x-edge floes, then ppermute
over "sy" exchanges y-edge floes *including the just-received x-ghosts* —
which yields the diagonal corner ghosts with no extra collective.
Migration is likewise two-phase (x then y), so a diagonal crosser settles
in its new tile within one step.

The 1-D floe axis is sharded over both mesh axes, P(("sx", "sy")): tile
(i, j) owns slot block ``i * Sy + j``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..dynamics.contact import boundary_contact, contact_forces
from ..dynamics.broadphase import neighbor_candidates
from ..dynamics.step import StepAux, domain_polygon
from ..dynamics.trajectory import (
    push_stress, stress_from_sums, trajectory_update,
)
from ..forcing import Forcing
from ..state import FloeState
from .spatial import GHOST_FIELDS, _gather_ghost, _migrate, _pack

AX, AY = "sx", "sy"


def make_spatial_step_2d(cfg: SimConfig, forcing: Forcing, modulus: float,
                         heat_flux: float, mesh: Mesh):
    """Jitted sharded ``step(state, step_idx[, domain]) -> (state, aux)``
    over a 2-D ("sx", "sy") mesh."""
    assert mesh.axis_names == (AX, AY), mesh.axis_names
    sx, sy = mesh.devices.shape
    cap_total = cfg.capacity.max_floes
    assert cap_total % (sx * sy) == 0
    n_loc = cap_total // (sx * sy)
    n_ghost = max(min(cfg.capacity.max_ghosts, n_loc), 1)
    domain_verts = domain_polygon(cfg)
    lx, ly = cfg.domain.lx, cfg.domain.ly
    tile_w = 2.0 * lx / sx
    tile_h = 2.0 * ly / sy
    periodic = cfg.processes.periodic

    from jax import shard_map

    def exchange(axis, n_axis, send_hi, send_lo):
        """ppermute a (hi, lo) ghost payload pair along one mesh axis."""
        fwd = [(i, (i + 1) % n_axis) for i in range(n_axis)]
        bwd = [(i, (i - 1) % n_axis) for i in range(n_axis)]
        from_lo = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, fwd), send_hi)
        from_hi = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, bwd), send_lo)
        return from_lo, from_hi

    def shard_fn(state: FloeState, step_idx, forcing_rep, domain_rep):
        ix = jax.lax.axis_index(AX)
        iy = jax.lax.axis_index(AY)
        x_lo = -lx + ix * tile_w
        x_hi = x_lo + tile_w
        y_lo = -ly + iy * tile_h
        y_hi = y_lo + tile_h

        halo = 2.0 * jax.lax.pmax(jax.lax.pmax(
            jnp.max(jnp.where(state.alive, state.rmax, 0.0)), AX), AY)

        # ---- 1a. X halo exchange -------------------------------------
        right = state.alive & (state.x > x_hi - halo)
        left = state.alive & (state.x < x_lo + halo)
        r_idx, r_val, r_of = _pack(right, n_ghost)
        l_idx, l_val, l_of = _pack(left, n_ghost)
        gx_from_left, gx_from_right = exchange(
            AX, sx, _gather_ghost(state, r_idx, r_val),
            _gather_ghost(state, l_idx, l_val))
        if not periodic:
            gx_from_left["alive"] &= ix != 0
            gx_from_right["alive"] &= ix != sx - 1
        else:
            gx_from_left["x"] = gx_from_left["x"] + jnp.where(
                ix == 0, -2.0 * lx, 0.0)
            gx_from_right["x"] = gx_from_right["x"] + jnp.where(
                ix == sx - 1, 2.0 * lx, 0.0)
        ghosts_x = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b]), gx_from_left,
            gx_from_right)

        # ---- 1b. Y halo exchange over local + x-ghosts ----------------
        # (x-then-y gives the corner ghosts, floe_interactions_all.m:18-66)
        def cat(f):
            return jnp.concatenate([getattr(state, f), ghosts_x[f]])

        union = {f: cat(f) for f in GHOST_FIELDS}
        up = union["alive"] & (union["y"] > y_hi - halo)
        dn = union["alive"] & (union["y"] < y_lo + halo)
        u_idx, u_val, u_of = _pack(up, n_ghost)
        d_idx, d_val, d_of = _pack(dn, n_ghost)

        def gather_union(idx, val):
            out = {f: union[f][idx] for f in GHOST_FIELDS}
            out["alive"] = out["alive"] & val
            return out

        gy_from_dn, gy_from_up = exchange(
            AY, sy, gather_union(u_idx, u_val), gather_union(d_idx, d_val))
        if not periodic:
            gy_from_dn["alive"] &= iy != 0
            gy_from_up["alive"] &= iy != sy - 1
        else:
            gy_from_dn["y"] = gy_from_dn["y"] + jnp.where(
                iy == 0, -2.0 * ly, 0.0)
            gy_from_up["y"] = gy_from_up["y"] + jnp.where(
                iy == sy - 1, 2.0 * ly, 0.0)
        ghosts = jax.tree_util.tree_map(
            lambda a, b, c: jnp.concatenate([a, b, c]),
            ghosts_x, gy_from_dn, gy_from_up)

        # ---- 2. contact: local queries vs local + ghosts ---------------
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
            # ---- SURVEY M5 overlap, 2-D: the interior pass (local
            # queries vs LOCAL sources) has no data dependency on either
            # ppermute above, so the latency-hiding scheduler can run both
            # exchanges underneath it; only the packed band pass (floes
            # within one halo width of ANY tile edge, vs the arrived
            # ghosts) waits.  Merge identical to the 1-D slab path
            # (parallel/spatial.py _merge_band).
            from .spatial import _merge_band

            nbr_i = neighbor_candidates(
                state.x, state.y, state.rmax, state.alive, k_cap,
                # both periodic axes are realized by the ghost rings
                False, lx, ly,
            )
            pc_i = contact_forces(
                verts_loc, state.x, state.y, state.u, state.v, state.ksi,
                state.h, state.area, nbr_i, modulus, cfg,
                nv=state.nv, domain_verts=dom_gate, axis_names=(AX, AY),
            )
            up_loc = state.alive & (state.y > y_hi - halo)
            dn_loc = state.alive & (state.y < y_lo + halo)
            band_mask = right | left | up_loc | dn_loc
            n_gho_tot = int(ghosts["x"].shape[0])          # 4 * n_ghost
            n_band = max(min(n_gho_tot, n_loc), 1)
            b_idx, b_val, band_of = _pack(band_mask, n_band)
            kg = min(k_cap, n_gho_tot)
            nbr_b = neighbor_candidates(
                state.x[b_idx], state.y[b_idx], state.rmax[b_idx],
                state.alive[b_idx] & b_val, kg,
                False, lx, ly,
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
                domain_verts=dom_gate, axis_names=(AX, AY),
            )
            pc, nbr = _merge_band(pc_i, nbr_i, pc_b, nbr_b, b_idx, b_val,
                                  kg, k_cap, n_loc, band_of)
        else:
            nbr = neighbor_candidates(
                state.x, state.y, state.rmax, state.alive, k_cap,
                # both periodic axes are realized by the ghost rings
                False, lx, ly,
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
                axis_names=(AX, AY),
            )

        if not periodic:
            bc = boundary_contact(
                verts_loc, state.x, state.y, state.u, state.v, state.ksi,
                state.h, state.area, state.alive, domain_rep, modulus, cfg,
                nv=state.nv, axis_names=(AX, AY))
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

        if periodic:
            xw = state.x
            yw = state.y
            xw = jnp.where(jnp.abs(xw) > lx, xw - 2 * lx * jnp.sign(xw), xw)
            yw = jnp.where(jnp.abs(yw) > ly, yw - 2 * ly * jnp.sign(yw), yw)
            state = state.replace(x=xw, y=yw)

        # ---- 4. two-phase migration (x then y) -------------------------
        # Periodic direction by MINIMUM-IMAGE offset from the tile center:
        # a seam-wrapped floe is one hop to the wrapping neighbor, not
        # s-1 hops the other way (see parallel/spatial.py).
        if periodic:
            tile_wx = x_hi - x_lo
            dx_c = state.x - 0.5 * (x_lo + x_hi)
            dx_c = dx_c - 2 * lx * jnp.round(dx_c / (2 * lx))
            go_r = state.alive & (dx_c >= 0.5 * tile_wx)
            go_l = state.alive & (dx_c < -0.5 * tile_wx)
        else:
            blk_r = ix == sx - 1
            blk_l = ix == 0
            go_r = state.alive & (state.x >= x_hi) & ~blk_r
            go_l = state.alive & (state.x < x_lo) & ~blk_l
        state, mig_of_x = _migrate(state, go_r, go_l, n_ghost, sx, periodic,
                                   axis=AX)
        if periodic:
            tile_wy = y_hi - y_lo
            dy_c = state.y - 0.5 * (y_lo + y_hi)
            dy_c = dy_c - 2 * ly * jnp.round(dy_c / (2 * ly))
            go_u = state.alive & (dy_c >= 0.5 * tile_wy)
            go_d = state.alive & (dy_c < -0.5 * tile_wy)
        else:
            blk_u = iy == sy - 1
            blk_d = iy == 0
            go_u = state.alive & (state.y >= y_hi) & ~blk_u
            go_d = state.alive & (state.y < y_lo) & ~blk_d
        state, mig_of_y = _migrate(state, go_u, go_d, n_ghost, sy, periodic,
                                   axis=AY)

        # global sum FIRST, then halve: a cross-tile pair contributes one
        # endpoint to each of two tiles (local //2 would drop it)
        def psum2(v):
            return jax.lax.psum(jax.lax.psum(v, AX), AY)

        n_collisions = (
            psum2(jnp.sum(f_valid.astype(jnp.int32))) // 2
            + psum2(jnp.sum(b_valid.astype(jnp.int32)))
        ).astype(jnp.int32)

        aux = StepAux(
            n_collisions=n_collisions,
            merge_i=pc.merge_i, merge_j=pc.merge_j,
            absorb_boundary=b_absorb,
            killed=alive_before & ~state.alive,
            exported=exported,
            nbr_overflow=(nbr.overflow | r_of | l_of | u_of | d_of
                          | mig_of_x | mig_of_y),
            nbr_demand=jax.lax.pmax(nbr.demand.astype(jnp.int32),
                                    (AX, AY)),
            overlap_area=state.overlap_area,
            collision_force=jnp.stack([cf_x, cf_y], -1),
            collision_torque=cf_t,
            nbr_idx=nbr.idx.astype(jnp.int32),
            pair_valid=f_valid,
            pair_px=pc.px, pair_py=pc.py,
            pair_fx=pc.fx, pair_fy=pc.fy, pair_overlap=pc.overlap,
            boundary_contact=b_valid | (b_overlap > 0),
            region_overflow=psum2(
                (pc.region_overflow | b_rov).astype(jnp.int32)) > 0,
            # pc/bc region_need are already globally psum'd (axis_names)
            region_pool_need=pc.region_need + b_need,
            pair_pool_overflow=pc.pair_pool_overflow,
            pair_pool_need=pc.pair_pool_need.astype(jnp.int32),
        )
        return state, aux

    from jax import shard_map

    spec = P((AX, AY))
    fields = [f.name for f in dataclasses.fields(FloeState)]
    state_specs = FloeState(**{f: spec for f in fields})
    aux_specs = StepAux(
        n_collisions=P(), merge_i=spec, merge_j=spec,
        absorb_boundary=spec, killed=spec, exported=spec,
        nbr_overflow=P(), nbr_demand=P(),
        overlap_area=spec, collision_force=spec,
        collision_torque=spec, nbr_idx=spec,
        pair_valid=spec, pair_px=spec, pair_py=spec,
        pair_fx=spec, pair_fy=spec, pair_overlap=spec,
        boundary_contact=spec, region_overflow=P(),
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
        dom = domain_verts if domain is None else domain
        return sharded(state, step_idx, forcing, dom)

    return step


def shard_state_2d(state: FloeState, mesh: Mesh):
    spec = NamedSharding(mesh, P((AX, AY)))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), state)


def rebalance_tiles(state: FloeState, cfg: SimConfig, sx: int, sy: int
                    ) -> FloeState:
    """Host-side: reorder floes so each lives in the tile owning its
    centroid; tile (i, j) owns slot block ``i*sy + j``."""
    cap = cfg.capacity.max_floes
    n_tiles = sx * sy
    n_loc = cap // n_tiles
    lx, ly = cfg.domain.lx, cfg.domain.ly
    wx = 2.0 * lx / sx
    wy = 2.0 * ly / sy

    arrs = {f.name: np.asarray(getattr(state, f.name))
            for f in dataclasses.fields(state)}
    alive = arrs["alive"]
    ox = np.clip(((arrs["x"] + lx) // wx).astype(int), 0, sx - 1)
    oy = np.clip(((arrs["y"] + ly) // wy).astype(int), 0, sy - 1)
    owner = ox * sy + oy

    live_idx = np.nonzero(alive)[0]
    order = np.argsort(owner[live_idx], kind="stable")
    src = live_idx[order]
    own_sorted = owner[src]
    counts = np.bincount(own_sorted, minlength=n_tiles)
    if np.any(counts > n_loc):
        t = int(np.argmax(counts > n_loc))
        raise RuntimeError(
            f"tile {t} over capacity during rebalance "
            f"(raise max_floes or tile count)")
    within = np.arange(len(src)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    dst = own_sorted * n_loc + within

    new = {k: v.copy() for k, v in arrs.items()}
    new["alive"][:] = False
    for k, v in arrs.items():
        new[k][dst] = v[src]
    new["alive"][dst] = True
    return state.replace(**{
        k: jnp.asarray(v, getattr(state, k).dtype) for k, v in new.items()
    })


def load_imbalance(state: FloeState, cfg: SimConfig, sx: int, sy: int
                   ) -> float:
    """max/mean live-floe count over tiles (1.0 = perfectly balanced)."""
    lx, ly = cfg.domain.lx, cfg.domain.ly
    x = np.asarray(state.x)
    y = np.asarray(state.y)
    alive = np.asarray(state.alive)
    ox = np.clip(((x + lx) // (2 * lx / sx)).astype(int), 0, sx - 1)
    oy = np.clip(((y + ly) // (2 * ly / sy)).astype(int), 0, sy - 1)
    counts = np.bincount((ox * sy + oy)[alive], minlength=sx * sy)
    mean = counts.mean()
    return float(counts.max() / mean) if mean > 0 else 1.0

"""Narrow-phase contact forces: the batched equivalent of
``collisions/floe_interactions.m``.

Physics reproduced (file:line cites into /root/reference):

* Hertz-like spring constant ``Force_factor = E h1 h2 / (h1 r2 + h2 r1)``
  with r = sqrt(area) (floe_interactions.m:12); boundary contact uses
  ``E h1 / r1`` (:14).
* Normal force  = force_dir * overlap_area * Force_factor (:167), with the
  direction derived analytically from the overlap-boundary chord (see
  geometry/clip.py) instead of the reference's displace-and-reclip search
  (:139-165).
* Contact requires >= 2 boundary crossings (:71) and a contact length
  dl >= 0.1 m (:141), where dl = |chord| replaces the reference's mean
  region-edge length.
* Tangential force from the relative contact-point velocity
  ``force_t = -|v_t|^2 dl G dt * dir_t`` with shear modulus
  G = E/(2(1+nu)), nu=0.3, capped by Coulomb mu |Fn| with mu=0.2
  (:20-21, :169-183).
* Merge flags: overlap fraction > 0.55 of either floe's area marks the pair
  for fusion (:53-60); > 0.75 of a floe outside the domain marks absorption
  by the boundary (:35-40).
* Contact point = overlap-region centroid (:97,108); torque about each
  centroid = cross(p - r_i, F) (floe_interactions_all.m:227-231).

Per-region contacts (floe_interactions.m:92-190 applies one force per
disjoint overlap region): pairs with >= 4 boundary crossings are decomposed
on device (geometry/regions.py) and forces/torque/stress applied per region
— the default.  With ``ContactConfig.per_region = False`` every pair gets
ONE aggregate contact (areas summed, centroid area-weighted, chords summed),
exact for convex/single-region contacts, with the measured multi-region
envelope of tests/test_aggregation_error.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..geometry.clip_batched import difference_stats_bm, overlap_stats_bm
from ..geometry.clip_integral import difference_stats_int, overlap_stats_int
from .broadphase import NeighborTable


def _clip_fns(cfg: SimConfig):
    """(overlap, difference) clip implementations per cfg.numerics.contact_impl.

    "integral" (default): closed-form parity-integral, XLA-fused
                          (geometry/clip_integral.py)
    "pallas":             same math as one fused Pallas TPU kernel
                          (geometry/clip_pallas.py; TPU only, float32)
    "xla":                segment-midpoint formulation (geometry/clip_batched.py)
    """
    impl = cfg.numerics.contact_impl
    if impl == "pallas":
        from ..geometry.clip_pallas import (
            difference_stats_pallas, overlap_stats_pallas,
        )
        return overlap_stats_pallas, difference_stats_pallas
    if impl == "xla":
        return overlap_stats_bm, difference_stats_bm
    return overlap_stats_int, difference_stats_int


class PairContacts(NamedTuple):
    """Per-(floe, neighbor-slot) contact results, shapes [N, K] (+ trailing).

    fx, fy:    contact force on floe i from neighbor k
    px, py:    contact point (world frame of floe i; per-region mode: the
               area-weighted centroid of the contributing regions)
    tq:        torque about floe i's centroid (exact per-region sum in
               per-region mode; cross(p - r_i, F) otherwise)
    sxx/syy/sxy: virial stress sums Σ_regions (p - r_i) ⊗ F (xx, yy and the
               symmetrized xy component) — consumed by floe stress
               (calc_trajectory.m:9-13) so multi-region contacts contribute
               exactly even though only one effective point is reported
    overlap:   overlap area of the pair
    merge_i:   floe i should be absorbed into neighbor (overlap frac > 0.55)
    merge_j:   neighbor should be absorbed into floe i
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    tq: jnp.ndarray
    sxx: jnp.ndarray
    syy: jnp.ndarray
    sxy: jnp.ndarray
    overlap: jnp.ndarray
    merge_i: jnp.ndarray
    merge_j: jnp.ndarray
    region_overflow: jnp.ndarray  # [] >=4-crossing pairs exceeded the pool
    region_need: jnp.ndarray      # [] count of >=4-crossing pair slots
                                  # (pool demand; sizes region_pair_frac)
    pair_pool_overflow: jnp.ndarray  # [] bbox-active pairs exceeded the
                                  # active-pair pool (contacts zeroed this
                                  # step; the driver re-runs the chunk)
    pair_pool_need: jnp.ndarray   # [] count of bbox-active pair slots


class BoundaryContact(NamedTuple):
    """Per-floe contact with the domain boundary, shapes [N].

    Forces have the rectangular-wall component zeroing
    (floe_interactions_all.m:157-166) already applied, per region in
    per-region mode.  tq / sxx / syy / sxy are torque and virial stress sums
    about the floe centroid, exact per-region sums in per-region mode.

    absorb: floe is >75% outside the domain -> kill (floe_interactions.m:37-39)
    out:    centroid left the domain -> kill (floe_interactions_all.m:152-155)
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    tq: jnp.ndarray
    sxx: jnp.ndarray
    syy: jnp.ndarray
    sxy: jnp.ndarray
    overlap: jnp.ndarray
    absorb: jnp.ndarray
    out: jnp.ndarray
    region_overflow: jnp.ndarray  # [] >=4-crossing floes exceeded the pool
    region_need: jnp.ndarray      # [] count of >=4-crossing floe slots


def _pair_forces_flat(
    st,                          # OverlapStats, [P]-batched
    ui, vi, ksi_i, xi, yi,       # [P] floe i kinematics
    uj, vj, ksi_j, xj, yj,       # [P] neighbor kinematics
    ff,                          # [P] Force_factor per pair
    area_i, area_j,              # [P]
    shear_g, mu, dt,
    min_chord, merge_frac,
    dtype,
    amin=0.0,                    # [P] small-region area cull threshold
    merge_ok=True,               # [P] merge-gate (floe_interactions.m:54)
    min_cross: int = 2,
    tang_reference: bool = True,
):
    """Contact forces for a flat batch of polygon-pair overlap statistics."""
    ar = jnp.maximum(st.area, 0.0)

    chx, chy = st.chord_p[..., 0], st.chord_p[..., 1]
    dl = jnp.sqrt(chx * chx + chy * chy)
    inv_dl = 1.0 / jnp.where(dl > 0, dl, 1.0)
    # Overlap-reducing force direction on floe i (see geometry/clip.py).
    fdx = -chy * inv_dl
    fdy = chx * inv_dl

    # Validity: >= min_crossings boundary crossings, measurable chord,
    # positive area (floe_interactions.m:71,141), and the small-region cull
    # Ar < min(N1,N2)*100/1.75 (:79-83) applied to the aggregate area —
    # exact whenever the overlap has <= 1 region (total < Amin implies every
    # region < Amin; see tests/test_golden.py for the multi-region error).
    ok = (st.n_cross >= min_cross) & (dl >= min_chord) & (ar > 0) \
        & (ar >= amin)

    fn_norm = ar * ff                                     # normal magnitude

    # Tangential: relative velocity at the contact point.  The reference
    # uses the *radial* form v = [U V] + ksi*(p - r)
    # (floe_interactions.m:170-171) — not the rigid-body cross product;
    # cfg.contact.tangential_velocity selects which to apply.
    px, py = st.centroid[..., 0], st.centroid[..., 1]
    if tang_reference:
        vtx = (ui + ksi_i * (px - xi)) - (uj + ksi_j * (px - xj))
        vty = (vi + ksi_i * (py - yi)) - (vj + ksi_j * (py - yj))
    else:
        vtx = (ui - ksi_i * (py - yi)) - (uj - ksi_j * (py - yj))
        vty = (vi + ksi_i * (px - xi)) - (vj + ksi_j * (px - xj))
    vt = jnp.sqrt(vtx * vtx + vty * vty)
    inv_vt = 1.0 / jnp.where(vt > 0, vt, 1.0)
    # force_t = -dot(dir_t, v_t) * dl * G * |v_t| * dir_t * dt
    #         = -|v_t|^2 dl G dt dir_t        (floe_interactions.m:178)
    # Coulomb cap (floe_interactions.m:180-183).
    ft_mag = jnp.minimum(vt * vt * dl * shear_g * dt, mu * fn_norm)
    fx = jnp.where(ok, fdx * fn_norm - ft_mag * vtx * inv_vt, 0.0)
    fy = jnp.where(ok, fdy * fn_norm - ft_mag * vty * inv_vt, 0.0)

    # Merge flags (floe_interactions.m:53-60): overlap fraction tested even
    # when the contact force itself is invalid, gated on floe i inside the
    # domain bbox / small neighbor / periodic (:54).
    touching = (ar > 0) & merge_ok
    merge_i = touching & (ar / area_i > merge_frac)
    merge_j = touching & (ar / area_j > merge_frac) & ~merge_i
    overlap = jnp.where(touching & ok, ar, 0.0)

    # Torque about floe i's centroid (the pair-local origin) and virial
    # stress sums (fx/fy are already zeroed where ~ok).
    tq = (px - xi) * fy - (py - yi) * fx
    sxx = (px - xi) * fx
    syy = (py - yi) * fy
    sxy = 0.5 * ((px - xi) * fy + (py - yi) * fx)

    return (
        fx.astype(dtype), fy.astype(dtype),
        px.astype(dtype), py.astype(dtype),
        tq.astype(dtype), sxx.astype(dtype), syy.astype(dtype),
        sxy.astype(dtype),
        overlap.astype(dtype), merge_i, merge_j,
    )


def _pair_forces_regions(
    rs,                          # RegionStats, [P, C]
    ui, vi, ksi_i,               # [P] floe i kinematics (pair-local origin)
    uj, vj, ksi_j, xj, yj,       # [P] neighbor kinematics (pair-local)
    ff,                          # [P] Force_factor per pair
    shear_g, mu, dt,
    min_chord,
    dtype,
    amin,                        # [P] small-region area cull threshold
    tang_reference: bool = True,
    wall=None,                   # (lx, ly, tol, xw, yw): per-region wall
                                 # component zeroing (floe_interactions_all.m
                                 # :157-166); xw/yw [P] = world offset of the
                                 # pair-local origin
    region_dl: str = "chord",    # tangential length scale (ContactConfig)
    flip=None,                   # [P, C] reference reclip direction flips
                                 # (ContactConfig.normal_dir = "reclip")
):
    """Per-region contact forces (floe_interactions.m:92-190): one force per
    disjoint overlap region, the small-region cull applied per region
    (:79-83), all in the pair-local frame (floe i centroid at the origin).

    Returns summed (fx, fy), exact torque/stress sums, the kept-region
    overlap area, and the area-weighted effective contact point.
    """
    ar = rs.area                                          # [P, C]
    chx, chy = rs.chord[..., 0], rs.chord[..., 1]
    ch_norm = jnp.sqrt(chx * chx + chy * chy)
    inv_dl = 1.0 / jnp.where(ch_norm > 0, ch_norm, 1.0)
    fdx = -chy * inv_dl
    fdy = chx * inv_dl
    if flip is not None:
        # Reference finite-probe flips (floe_interactions.m:158-163): the
        # normal direction only — the tangential force is unaffected there.
        fdx = jnp.where(flip, -fdx, fdx)
        fdy = jnp.where(flip, -fdy, fdy)
    if region_dl == "edge_mean":
        # Reference-exact dl = mean length of the region's edges on floe
        # 1's boundary (floe_interactions.m:126-131); the 0.1 m gate below
        # (:141-142) then applies to this dl, as in the reference.
        dl = rs.p_len / jnp.maximum(rs.p_cnt, 1.0)
    else:
        dl = ch_norm

    # Validity per region: root slot, measurable contact length (:141-142),
    # and the per-region cull Ar < min(N1,N2)*100/1.75 (:79-83).
    ok = rs.valid & (dl >= min_chord) & (ar >= amin[:, None]) & (ar > 0)

    fn = ar * ff[:, None]
    px, py = rs.centroid[..., 0], rs.centroid[..., 1]
    if tang_reference:
        vtx = (ui[:, None] + ksi_i[:, None] * px) \
            - (uj[:, None] + ksi_j[:, None] * (px - xj[:, None]))
        vty = (vi[:, None] + ksi_i[:, None] * py) \
            - (vj[:, None] + ksi_j[:, None] * (py - yj[:, None]))
    else:
        vtx = (ui[:, None] - ksi_i[:, None] * py) \
            - (uj[:, None] - ksi_j[:, None] * (py - yj[:, None]))
        vty = (vi[:, None] + ksi_i[:, None] * px) \
            - (vj[:, None] + ksi_j[:, None] * (px - xj[:, None]))
    vt = jnp.sqrt(vtx * vtx + vty * vty)
    inv_vt = 1.0 / jnp.where(vt > 0, vt, 1.0)
    ft = jnp.minimum(vt * vt * dl * shear_g * dt, mu * fn)
    fx_r = jnp.where(ok, fdx * fn - ft * vtx * inv_vt, 0.0)
    fy_r = jnp.where(ok, fdy * fn - ft * vty * inv_vt, 0.0)

    if wall is not None:
        # Rectangular-wall force-component zeroing per region contact point
        # (floe_interactions_all.m:157-166): points on the y-walls push only
        # in y, on the x-walls only in x.
        wlx, wly, wtol, xw, yw = wall
        pxw = px + xw[:, None]
        pyw = py + yw[:, None]
        on_y = jnp.abs(jnp.abs(pyw) - wly) <= wtol
        on_x = jnp.abs(jnp.abs(pxw) - wlx) <= wtol
        fx_r = jnp.where(on_y & ~on_x, 0.0, fx_r)
        fy_r = jnp.where(on_x & ~on_y, 0.0, fy_r)

    fx = jnp.sum(fx_r, axis=1)
    fy = jnp.sum(fy_r, axis=1)
    tq = jnp.sum(px * fy_r - py * fx_r, axis=1)
    sxx = jnp.sum(px * fx_r, axis=1)
    syy = jnp.sum(py * fy_r, axis=1)
    sxy = jnp.sum(0.5 * (px * fy_r + py * fx_r), axis=1)
    ar_ok = jnp.where(ok, ar, 0.0)
    overlap = jnp.sum(ar_ok, axis=1)
    any_ok = overlap > 0
    inv_w = 1.0 / jnp.where(any_ok, overlap, 1.0)
    px_eff = jnp.sum(ar_ok * px, axis=1) * inv_w
    py_eff = jnp.sum(ar_ok * py, axis=1) * inv_w

    return (
        fx.astype(dtype), fy.astype(dtype),
        px_eff.astype(dtype), py_eff.astype(dtype),
        tq.astype(dtype), sxx.astype(dtype), syy.astype(dtype),
        sxy.astype(dtype), overlap.astype(dtype), any_ok,
    )


def _reclip_flip(rs, vi_m: jnp.ndarray, vj_m: jnp.ndarray,
                 cap: int) -> jnp.ndarray:
    """Reference displace-and-reclip direction test, [M, C] flip mask
    (floe_interactions.m:139-165; ContactConfig.normal_dir = "reclip").

    For each region: displace floe 1 by the unit analytic direction (the
    reference's 1 m probe), re-decompose the displaced overlap, and match
    each displaced piece to the region by BBOX OVERLAP with a 1.5 m margin
    (the reference matches by polygon intersection; bboxes give the same
    pairing within a 1 m move and are robust where sliver-vs-sliver
    intersections are not, oracle.py:371-378).  Each matching piece whose
    area grew toggles the flip — net flip = odd toggle count.

    Degradation note: when the DISPLACED decomposition is degenerate
    (> region_cap crossings, inconsistent parity), its pieces are invalid
    (``rs2.valid`` false), no piece matches, and the region silently keeps
    the analytic direction — the same fallback the un-displaced
    decomposition applies via ``rs.consistent`` in _blend_regions_compact.
    The analytic direction is the first-order-exact descent direction, so
    the fallback is benign (measured 3/60 ensemble pairs differ at all,
    validation/GOLDEN.md).

    Cost: one extra ``region_stats`` on an [M*C] batch — opt-in only.
    """
    from ..geometry.regions import region_stats

    m = vi_m.shape[0]
    chx, chy = rs.chord[..., 0], rs.chord[..., 1]
    chn = jnp.sqrt(chx * chx + chy * chy)
    inv = 1.0 / jnp.where(chn > 0, chn, 1.0)
    d2 = jnp.stack([-chy * inv, chx * inv], axis=-1)      # [M, C, 2] unit dir
    vi_s = (vi_m[:, None, :, :] + d2[:, :, None, :]).reshape(
        m * cap, vi_m.shape[1], 2)
    vj_s = jnp.broadcast_to(
        vj_m[:, None], (m, cap) + vj_m.shape[1:]).reshape(
        m * cap, vj_m.shape[1], 2)
    rs2 = region_stats(vi_s, vj_s, cap, with_bbox=True)
    a2 = rs2.area.reshape(m, cap, cap)                    # [M, Corig, Cnew]
    v2 = rs2.valid.reshape(m, cap, cap)
    bb2 = rs2.bbox.reshape(m, cap, cap, 4)
    # Reference matching (oracle.py:371-378): a displaced piece matches when
    # its bbox meets the region's bbox expanded by 1.5 m; EACH matching
    # piece whose area grew toggles the sign — net flip = odd toggle count.
    bb1 = rs.bbox[:, :, None, :]                          # [M, Corig, 1, 4]
    match = (v2
             & (bb2[..., 2] >= bb1[..., 0] - 1.5)
             & (bb2[..., 3] >= bb1[..., 1] - 1.5)
             & (bb2[..., 0] <= bb1[..., 2] + 1.5)
             & (bb2[..., 1] <= bb1[..., 3] + 1.5))
    grew = match & (a2 / jnp.maximum(rs.area[:, :, None], 1e-30) - 1.0 > 0)
    toggles = jnp.sum(grew.astype(jnp.int32), axis=-1)
    return rs.valid & (toggles % 2 == 1)


def _blend_regions_compact(
    results,                     # (fx, fy, px, py, tq, sxx, syy, sxy,
                                 #  overlap) flat [P] aggregate results
    n_cross,                     # [P] aggregate crossing counts
    gather_pair,                 # sel_g [M] -> (vi_m, vj_m, kin 8-tuple,
                                 #  ff_m, amin_m, ov_gate_m|None, wall|None)
    shear_g, mu, dt, cfg, dtype,
    axis_names: tuple = (),
    pair_ok=None,                # [P] broad-phase validity: invalid slots
                                 # must not claim pool slots (a garbage
                                 # index can alias a huge topography
                                 # polygon and fake a multi-crossing pair)
    pool_base: "int | None" = None,  # pair count region_pair_frac refers
                                 # to (defaults to len(n_cross); the
                                 # active-pair pool passes the full n*K so
                                 # the driver's frac semantics are stable)
):
    """Blend per-region contact results into the aggregate ones, running the
    region decomposition only on a fixed pool of multi-crossing pairs.

    Pairs with <= 2 crossings have exactly one overlap region, where the
    aggregate chord contact IS the per-region contact — so only pairs with
    >= 4 crossings are decomposed.  They are compacted into
    ceil(region_pair_frac * P) pool slots.  If the pool overflows, the
    WHOLE step falls back to the aggregate contact: a partial pool would
    break Newton's third law, because compaction order could admit one
    endpoint of an unordered pair while its mirror keeps the aggregate
    force.  ``axis_names``: mesh axes to reduce the overflow decision over,
    so all shards of a spatial decomposition fall back together (a
    cross-tile pair must be treated identically on both owning shards).
    ``gather_pair`` rebuilds the selected pairs' local geometry/kinematics
    FROM THE SOURCE arrays — gathering the narrow phase's [P, V, 2] pair
    buffers instead would force XLA to materialize them and break the fused
    clip kernel (measured 15% step cost).
    """
    from ..geometry.regions import region_stats

    fx, fy, px, py, tq, sxx, syy, sxy, overlap = results
    p_count = n_cross.shape[0]
    # Floor of 128: small populations (validation cases) routinely have tens
    # of >=4-crossing pairs (a 10-floe cluster can demand > 64 of its 90
    # ordered slots); a tiny pool would push them all to the aggregate
    # fallback.  At 10k-floe scale the frac term dominates.
    m = min(p_count,
            max(128, math.ceil((pool_base or p_count)
                               * cfg.contact.region_pair_frac)))

    # Order-preserving compaction of the >= 4-crossing pair slots into m
    # pool slots (cumsum + scatter -- a top_k here would sort all P pairs).
    i32 = jnp.int32
    needs = n_cross >= 4                             # [P]
    if pair_ok is not None:
        needs = needs & pair_ok
    pos = jnp.cumsum(needs.astype(i32)) - 1          # [P] pool slot
    # Unfilled pool slots point out of bounds (p_count): their gathers clamp
    # to a harmless row and their scatters drop — a 0 default would collide
    # with pair slot 0 (duplicate scatter indices clobber its result).
    sel = jnp.full((m,), p_count, i32).at[
        jnp.where(needs & (pos < m), pos, m)
    ].set(jnp.arange(p_count, dtype=i32), mode="drop")
    n_need = jnp.sum(needs.astype(i32))
    need = jnp.arange(m, dtype=i32) < jnp.minimum(n_need, m)  # slot filled
    sel_g = jnp.minimum(sel, p_count - 1)            # clamped gather index

    vi_m, vj_m, kin, ff_m, amin_m, ov_gate_m, wall = gather_pair(sel_g)
    reclip = cfg.contact.normal_dir == "reclip"
    rs = region_stats(vi_m, vj_m, cfg.contact.region_cap, with_bbox=reclip)
    flip = None
    if reclip:
        flip = _reclip_flip(rs, vi_m, vj_m, cfg.contact.region_cap)
    ui, vi_k, ksi_i, uj, vj_k, ksi_j, xj, yj = kin
    (rfx, rfy, rpx, rpy, rtq, rsxx, rsyy, rsxy, rov, r_any) = \
        _pair_forces_regions(
            rs, ui, vi_k, ksi_i, uj, vj_k, ksi_j, xj, yj,
            ff_m, shear_g, mu, dt,
            cfg.contact.min_chord, dtype,
            amin=amin_m,
            tang_reference=cfg.contact.tangential_velocity == "reference",
            wall=wall,
            region_dl=cfg.contact.region_dl,
            flip=flip,
        )
    overflow = n_need > m
    n_need_global = n_need
    for ax in axis_names:
        overflow = jax.lax.psum(overflow.astype(jnp.int32), ax) > 0
        n_need_global = jax.lax.psum(n_need_global, ax)
    # All-or-nothing: on overflow every pair keeps the aggregate contact
    # (symmetric by construction); region_overflow flags the degradation.
    use = (need & rs.consistent & (rs.n_cross >= cfg.contact.min_crossings)
           & ~overflow)

    def scat(dst, src, gate=use):
        return dst.at[sel].set(jnp.where(gate, src, dst[sel_g]),
                               mode="drop")

    ov_gate = use if ov_gate_m is None else use & ov_gate_m
    return (
        scat(fx, rfx), scat(fy, rfy),
        scat(px, rpx, use & r_any), scat(py, rpy, use & r_any),
        scat(tq, rtq), scat(sxx, rsxx), scat(syy, rsyy), scat(sxy, rsxy),
        scat(overlap, rov, ov_gate),
    ), overflow, n_need_global.astype(jnp.int32)


def contact_forces(
    verts_world: jnp.ndarray,     # [N, V, 2]
    x, y, u, v, ksi,              # [N]
    h, area,                      # [N]
    nbr: NeighborTable,
    modulus: float,
    cfg: SimConfig,
    src: tuple | None = None,     # optional candidate-source arrays
    nv: jnp.ndarray | None = None,        # [N] vertex counts (region cull)
    nv_s: jnp.ndarray | None = None,      # source vertex counts
    domain_verts: jnp.ndarray | None = None,  # merge-gate bbox (:54)
    axis_names: tuple = (),       # mesh axes for the shared overflow decision
) -> PairContacts:
    """Contact forces for every (floe, candidate) in the neighbor table.

    Each unordered pair appears twice (once per endpoint); antisymmetry of the
    chord guarantees Newton's third law without a symmetrization pass.

    ``src``: (verts_world_s, x_s, y_s, u_s, v_s, ksi_s, h_s, area_s) when
    the neighbor table indexes a different candidate set (spatial
    decomposition: local + ghost floes).
    """
    dtype = x.dtype
    n, k = nbr.idx.shape
    phys = cfg.physics
    dt = cfg.numerics.dt
    if src is None:
        verts_s, x_s, y_s, u_s, v_s, ksi_s, h_s, area_s = (
            verts_world, x, y, u, v, ksi, h, area)
        if nv_s is None:
            nv_s = nv
    else:
        verts_s, x_s, y_s, u_s, v_s, ksi_s, h_s, area_s = src

    r = jnp.sqrt(area)
    r_src = jnp.sqrt(area_s)
    h_i = jnp.broadcast_to(h[:, None], (n, k))
    h_j = h_s[nbr.idx]
    r_i = jnp.broadcast_to(r[:, None], (n, k))
    r_j = r_src[nbr.idx]
    # Force_factor (floe_interactions.m:12); giant-floe special case (:15-18).
    ff = modulus * h_i * h_j / (h_i * r_j + h_j * r_i)
    giant = (r_i > 1e5) | (r_j > 1e5)
    r_min = jnp.minimum(r_i, r_j)
    h_min = jnp.minimum(h_i, h_j)
    ff = jnp.where(giant, modulus * h_min / r_min, ff)

    shear_g = modulus / (2.0 * (1.0 + phys.nu_poisson))

    # Small-region cull threshold Amin = min(N1,N2)*100/1.75
    # (floe_interactions.m:78-83).  The threshold needs the TRUE vertex
    # counts; when the caller doesn't supply them the cull is disabled
    # (padded caps would over-cull).
    if nv is None or nv_s is None:
        amin = jnp.zeros((n, k), dtype)
    else:
        amin = (jnp.minimum(nv[:, None], nv_s[nbr.idx]).astype(dtype)
                * cfg.contact.small_region_coeff)

    # Merge gate (floe_interactions.m:54): floe i fully inside the domain
    # bbox OR the neighbor smaller than 95% of the domain OR periodic.
    if cfg.processes.periodic or domain_verts is None:
        merge_ok = jnp.ones((n, k), bool)
    else:
        bx = domain_verts[:, 0]
        by = domain_verts[:, 1]
        vx = verts_world[..., 0]
        vy = verts_world[..., 1]
        in_bbox = (
            (jnp.max(vx, 1) < jnp.max(bx)) & (jnp.min(vx, 1) > jnp.min(bx))
            & (jnp.max(vy, 1) < jnp.max(by)) & (jnp.min(vy, 1) > jnp.min(by))
        )
        dom_area = 0.5 * jnp.abs(jnp.sum(
            bx * jnp.roll(by, -1) - jnp.roll(bx, -1) * by))
        merge_ok = in_bbox[:, None] | (area_s[nbr.idx] < 0.95 * dom_area)

    # Flatten the [N, K] pair grid into one lane-aligned batch
    # (cfg.numerics.contact_impl): every intermediate is lane-major over
    # the pairs so elementwise ops use the full VPU lane width.
    p = n * k
    vcap = verts_world.shape[1]
    overlap_fn, _ = _clip_fns(cfg)
    tang_ref = cfg.contact.tangential_velocity == "reference"
    i32 = jnp.int32

    def gather_pair(sel_g):
        """Pair-local geometry + kinematics of the selected pair slots,
        rebuilt FROM THE SOURCE arrays (gathering materialized [P, V, 2]
        buffers instead would force XLA to materialize them and break the
        fused clip kernel — measured 15% step cost)."""
        i_s = sel_g // k
        k_s = sel_g - i_s * k
        j_s = nbr.idx[i_s, k_s]
        sh = nbr.shift[i_s, k_s]
        ci_s = jnp.stack([x[i_s], y[i_s]], axis=-1)[:, None, :]
        vi_m = verts_world[i_s] - ci_s
        vj_m = verts_s[j_s] + sh[:, None, :] - ci_s
        kin = (u[i_s], v[i_s], ksi[i_s],
               u_s[j_s], v_s[j_s], ksi_s[j_s],
               x_s[j_s] + sh[:, 0] - x[i_s],
               y_s[j_s] + sh[:, 1] - y[i_s])
        return (vi_m, vj_m, kin, ff[i_s, k_s], amin[i_s, k_s],
                merge_ok[i_s, k_s], None)

    region_overflow = jnp.zeros((), bool)
    region_need = jnp.zeros((), jnp.int32)
    pair_pool_overflow = jnp.zeros((), bool)
    pair_pool_need = jnp.zeros((), jnp.int32)

    if cfg.contact.pair_pool:
        # ---- active-pair pool: clip only pairs whose world bboxes meet.
        # EXACT: a pair with disjoint bboxes has zero overlap area, zero
        # crossings, zero force, no merge flag — identical to running the
        # full kernel on it.  In a dense pack only ~10-30% of the
        # rmax-circle candidates actually touch, so the clip (and its
        # [pool, V, V] HBM intermediates) shrinks by that factor.
        bx0 = jnp.min(verts_world[..., 0], axis=1)
        bx1 = jnp.max(verts_world[..., 0], axis=1)
        by0 = jnp.min(verts_world[..., 1], axis=1)
        by1 = jnp.max(verts_world[..., 1], axis=1)
        if verts_s is verts_world:
            sx0, sx1, sy0, sy1 = bx0, bx1, by0, by1
        else:
            sx0 = jnp.min(verts_s[..., 0], axis=1)
            sx1 = jnp.max(verts_s[..., 0], axis=1)
            sy0 = jnp.min(verts_s[..., 1], axis=1)
            sy1 = jnp.max(verts_s[..., 1], axis=1)
        jx0 = sx0[nbr.idx] + nbr.shift[..., 0]
        jx1 = sx1[nbr.idx] + nbr.shift[..., 0]
        jy0 = sy0[nbr.idx] + nbr.shift[..., 1]
        jy1 = sy1[nbr.idx] + nbr.shift[..., 1]
        eps = 1e-3   # m; guards f32 rounding of the bbox reductions
        active = (nbr.valid
                  & (bx0[:, None] <= jx1 + eps) & (jx0 <= bx1[:, None] + eps)
                  & (by0[:, None] <= jy1 + eps) & (jy0 <= by1[:, None] + eps))
        flat_act = active.reshape(p)
        m2 = min(p, max(256, math.ceil(p * cfg.contact.pair_pool_frac)))
        pos = jnp.cumsum(flat_act.astype(i32)) - 1
        sel = jnp.full((m2,), p, i32).at[
            jnp.where(flat_act & (pos < m2), pos, m2)
        ].set(jnp.arange(p, dtype=i32), mode="drop")
        n_act = jnp.sum(flat_act.astype(i32))
        slot_ok = jnp.arange(m2, dtype=i32) < jnp.minimum(n_act, m2)
        sel_g = jnp.minimum(sel, p - 1)

        vi_m, vj_m, kin_m, ff_m, amin_m, mok_m, _ = gather_pair(sel_g)
        st = overlap_fn(vi_m, vj_m)
        ui_m, vvi_m, ksii_m, uj_m, vj_k_m, ksij_m, xj_m, yj_m = kin_m
        i_s = sel_g // k
        j_s = nbr.idx[i_s, sel_g - i_s * k]
        zm = jnp.zeros(sel_g.shape, dtype)
        res_m = _pair_forces_flat(
            st, ui_m, vvi_m, ksii_m, zm, zm,
            uj_m, vj_k_m, ksij_m, xj_m, yj_m,
            ff_m, area[i_s], area_s[j_s],
            shear_g, phys.mu_friction, dt,
            cfg.contact.min_chord, cfg.contact.merge_overlap_frac,
            dtype, amin=amin_m, merge_ok=mok_m,
            min_cross=cfg.contact.min_crossings,
            tang_reference=tang_ref,
        )
        pair_pool_overflow = n_act > m2
        pair_pool_need = n_act
        for ax in axis_names:
            pair_pool_overflow = jax.lax.psum(
                pair_pool_overflow.astype(i32), ax) > 0
            pair_pool_need = jax.lax.psum(pair_pool_need, ax)
        # All-or-nothing on overflow (mirrors the region pool): a partial
        # pool could keep one endpoint of an unordered pair and drop its
        # mirror, breaking Newton's third law.  The zeroed step is flagged
        # and the driver re-runs the chunk at the grown size.
        use_m = slot_ok & ~pair_pool_overflow

        res9 = res_m[:9]
        mi_m, mj_m = res_m[9], res_m[10]
        if cfg.contact.per_region:
            def gather_pool(sel2):
                return gather_pair(sel_g[sel2])

            res9, region_overflow, region_need = _blend_regions_compact(
                res9, st.n_cross, gather_pool,
                shear_g, phys.mu_friction, dt, cfg, dtype,
                axis_names=axis_names, pair_ok=use_m, pool_base=p,
            )

        zerof = jnp.zeros((p,), dtype)
        falsep = jnp.zeros((p,), bool)

        def sc(v_m):
            return zerof.at[sel].set(
                jnp.where(use_m, v_m.astype(dtype), 0), mode="drop")

        fx, fy, px, py, tq, sxx, syy, sxy, overlap = (sc(v) for v in res9)
        merge_i = falsep.at[sel].set(use_m & mi_m, mode="drop")
        merge_j = falsep.at[sel].set(use_m & mj_m, mode="drop")
    else:
        # Pair-local frame: clip with both polygons translated by floe i's
        # centroid.  Area/chord/crossings are translation-invariant and the
        # f32 coordinates drop from domain scale (1e5) to contact scale
        # (1e3), recovering ~2 decimal digits of geometry accuracy; the
        # contact point is shifted back below.
        ci = jnp.stack([x, y], axis=-1)[:, None, None, :]   # [N, 1, 1, 2]
        vj = verts_s[nbr.idx] + nbr.shift[:, :, None, :] - ci
        vi = jnp.broadcast_to(verts_world[:, None] - ci, vj.shape)
        st = overlap_fn(vi.reshape(p, vcap, 2), vj.reshape(p, vcap, 2))

        def fl(a):
            return a.reshape(p)

        zero_nk = jnp.zeros((n, k), dtype)
        fx, fy, px, py, tq, sxx, syy, sxy, overlap, merge_i, merge_j = \
            _pair_forces_flat(
                st,
                fl(jnp.broadcast_to(u[:, None], (n, k))),
                fl(jnp.broadcast_to(v[:, None], (n, k))),
                fl(jnp.broadcast_to(ksi[:, None], (n, k))),
                # kinematics in the pair-local frame: centroid = origin
                fl(zero_nk),
                fl(zero_nk),
                fl(u_s[nbr.idx]), fl(v_s[nbr.idx]), fl(ksi_s[nbr.idx]),
                fl(x_s[nbr.idx] + nbr.shift[..., 0] - x[:, None]),
                fl(y_s[nbr.idx] + nbr.shift[..., 1] - y[:, None]),
                fl(ff),
                fl(jnp.broadcast_to(area[:, None], (n, k))),
                fl(area_s[nbr.idx]),
                shear_g, phys.mu_friction, dt,
                cfg.contact.min_chord, cfg.contact.merge_overlap_frac,
                dtype,
                amin=fl(amin),
                merge_ok=fl(merge_ok),
                min_cross=cfg.contact.min_crossings,
                tang_reference=tang_ref,
            )

        if cfg.contact.per_region:
            # Reference-faithful per-region contact
            # (floe_interactions.m:92-190): decompose the multi-crossing
            # pairs' overlaps into disjoint regions on device and apply one
            # force per region.  Pairs whose decomposition is degenerate
            # (collinear edges, > region_cap crossings, odd parity) keep
            # the aggregate result — the two formulations cover each
            # other's weak spots (geometry/regions.py).
            (fx, fy, px, py, tq, sxx, syy, sxy, overlap), region_overflow, \
                region_need = _blend_regions_compact(
                    (fx, fy, px, py, tq, sxx, syy, sxy, overlap),
                    st.n_cross, gather_pair,
                    shear_g, phys.mu_friction, dt, cfg, dtype,
                    axis_names=axis_names,
                    pair_ok=nbr.valid.reshape(p),
                )

    fx, fy, px, py, tq, sxx, syy, sxy, overlap, merge_i, merge_j = (
        a.reshape(n, k)
        for a in (fx, fy, px, py, tq, sxx, syy, sxy, overlap,
                  merge_i, merge_j)
    )
    # contact points back to world coordinates
    px = px + x[:, None]
    py = py + y[:, None]

    valid = nbr.valid
    zero = jnp.zeros((), dtype)
    return PairContacts(
        fx=jnp.where(valid, fx, zero),
        fy=jnp.where(valid, fy, zero),
        px=px,
        py=py,
        tq=jnp.where(valid, tq, zero),
        sxx=jnp.where(valid, sxx, zero),
        syy=jnp.where(valid, syy, zero),
        sxy=jnp.where(valid, sxy, zero),
        overlap=jnp.where(valid, overlap, zero),
        merge_i=valid & merge_i,
        merge_j=valid & merge_j,
        region_overflow=region_overflow,
        region_need=region_need,
        pair_pool_overflow=pair_pool_overflow,
        pair_pool_need=pair_pool_need,
    )


def boundary_contact(
    verts_world: jnp.ndarray,      # [N, V, 2]
    x, y, u, v, ksi,               # [N]
    h, area, alive,                # [N]
    domain_verts: jnp.ndarray,     # [Vb, 2] CCW domain polygon
    modulus: float,
    cfg: SimConfig,
    nv: jnp.ndarray | None = None,  # [N] vertex counts (region cull)
    axis_names: tuple = (),       # mesh axes for the shared overflow decision
) -> BoundaryContact:
    """Floe-vs-domain-boundary contact (the reference's ``floebound`` path).

    The overlap region is the part of the floe OUTSIDE the domain polygon:
    ``polyclip(c1, c2, 'dif')`` (floe_interactions.m:34).  Force components
    normal to a wall the contact point sits on are kept; the tangential wall
    components are zeroed by the caller per the rectangular-wall rule
    (floe_interactions_all.m:157-166).
    """
    dtype = x.dtype
    phys = cfg.physics
    dt = cfg.numerics.dt
    r1 = jnp.sqrt(area)
    ff = modulus * h / r1                          # floe_interactions.m:14
    shear_g = modulus / (2.0 * (1.0 + phys.nu_poisson))

    # Batch-minor difference kernel over all floes vs the (shared) domain,
    # in a floe-local frame (centroid at the origin) for f32 conditioning.
    n = verts_world.shape[0]
    ci = jnp.stack([x, y], axis=-1)[:, None, :]            # [N, 1, 2]
    dom = jnp.broadcast_to(domain_verts[None], (n,) + domain_verts.shape) - ci
    _, difference_fn = _clip_fns(cfg)
    st = difference_fn(verts_world - ci, dom)

    ar = jnp.maximum(st.area, 0.0)
    chx, chy = st.chord_p[..., 0], st.chord_p[..., 1]
    dl = jnp.sqrt(chx * chx + chy * chy)
    inv_dl = 1.0 / jnp.where(dl > 0, dl, 1.0)
    # Small-region cull with N2 = 4 (the rectangular wall polygon);
    # disabled when the caller doesn't supply true vertex counts.
    if nv is None:
        amin = jnp.zeros((n,), x.dtype)
    else:
        amin = jnp.minimum(nv.astype(x.dtype), 4.0) \
            * cfg.contact.small_region_coeff
    ok = (st.n_cross >= cfg.contact.min_crossings) \
        & (dl >= cfg.contact.min_chord) & (ar > 0) & (ar >= amin)
    fn_norm = ar * ff

    # Wall half-widths for the component-zeroing rule, from the (possibly
    # moving) domain polygon (floe_interactions_all.m:157-166).
    wlx = jnp.max(jnp.abs(domain_verts[:, 0]))
    wly = jnp.max(jnp.abs(domain_verts[:, 1]))
    wtol = cfg.contact.wall_zero_tol

    # floe-local contact point: (px, py) = contact point - centroid
    px, py = st.centroid[..., 0], st.centroid[..., 1]
    # Boundary is static: v2 = 0.  Radial reference form (:170-171) or
    # rigid-body, per cfg.contact.tangential_velocity.
    if cfg.contact.tangential_velocity == "reference":
        vtx = u + ksi * px
        vty = v + ksi * py
    else:
        vtx = u - ksi * py
        vty = v + ksi * px
    vt = jnp.sqrt(vtx * vtx + vty * vty)
    inv_vt = 1.0 / jnp.where(vt > 0, vt, 1.0)
    ft = jnp.minimum(vt * vt * dl * shear_g * dt,
                     phys.mu_friction * fn_norm)
    fx = jnp.where(ok, -chy * inv_dl * fn_norm - ft * vtx * inv_vt, 0.0)
    fy = jnp.where(ok, chx * inv_dl * fn_norm - ft * vty * inv_vt, 0.0)
    # wall component zeroing at the aggregate contact point
    on_y = jnp.abs(jnp.abs(py + y) - wly) <= wtol
    on_x = jnp.abs(jnp.abs(px + x) - wlx) <= wtol
    fx = jnp.where(on_y & ~on_x, 0.0, fx)
    fy = jnp.where(on_x & ~on_y, 0.0, fy)
    tq = px * fy - py * fx
    sxx = px * fx
    syy = py * fy
    sxy = 0.5 * (px * fy + py * fx)
    overlap = jnp.where(ok, ar, 0.0)

    b_region_overflow = jnp.zeros((), bool)
    b_region_need = jnp.zeros((), jnp.int32)
    if cfg.contact.per_region:
        # Per-region boundary contact (the reference loops the difference
        # regions exactly like floe-floe ones).  ∂(P \ Q) traverses Q
        # backward: reverse via the shared padding-aware helper (the domain
        # buffer is a 4-gon padded by repeating vertex 0).
        from ..geometry.regions import reverse_polygons

        dom_single = reverse_polygons(
            domain_verts[None], nv=jnp.full((1,), 4, jnp.int32))[0]

        def gather_floe(sel_g):
            ci_s = jnp.stack([x[sel_g], y[sel_g]], axis=-1)[:, None, :]
            vi_m = verts_world[sel_g] - ci_s
            vj_m = dom_single[None] - ci_s
            zm = jnp.zeros(sel_g.shape, dtype)
            kin = (u[sel_g], v[sel_g], ksi[sel_g], zm, zm, zm, zm, zm)
            return (vi_m, vj_m, kin, ff[sel_g], amin[sel_g], None,
                    (wlx, wly, wtol, x[sel_g], y[sel_g]))

        (fx, fy, px, py, tq, sxx, syy, sxy, overlap), b_region_overflow, \
            b_region_need = _blend_regions_compact(
                (fx, fy, px, py, tq, sxx, syy, sxy, overlap),
                st.n_cross, gather_floe,
                shear_g, phys.mu_friction, dt, cfg, dtype,
                axis_names=axis_names,
                pair_ok=alive,
            )

    absorb = ar / area > cfg.contact.boundary_overlap_frac
    fx = fx.astype(dtype)
    fy = fy.astype(dtype)
    tq = tq.astype(dtype)
    # contact point back to world coordinates
    px = (px + x).astype(dtype)
    py = (py + y).astype(dtype)
    overlap = overlap.astype(dtype)

    # Centroid-outside-domain kill (floe_interactions_all.m:152-155).
    from ..geometry.polygon import points_in_polygon

    pts = jnp.stack([x, y], axis=-1)
    inside = points_in_polygon(pts[None], domain_verts)[0]
    out = alive & ~inside

    return BoundaryContact(
        fx=fx, fy=fy, px=px, py=py, tq=tq,
        sxx=sxx.astype(dtype), syy=syy.astype(dtype),
        sxy=sxy.astype(dtype), overlap=overlap,
        absorb=alive & absorb, out=out,
        region_overflow=b_region_overflow,
        region_need=b_region_need,
    )

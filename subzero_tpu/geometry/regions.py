"""Per-region overlap decomposition — fixed-shape Weiler–Atherton on TPU.

The reference applies ONE contact force per disjoint overlap region
(``collisions/floe_interactions.m:92-190``: loop over the polygons returned
by ``polyclip``), with the small-region cull applied per region (:79-83).
The aggregate parity-integral kernel (geometry/clip_integral.py) sums all
regions into one contact — exact for single-region (convex) contacts, a
documented approximation for concave multi-region ones.  This module closes
that delta on device: it decomposes P ∩ Q (or P \\ Q via a reversed Q) into
its disjoint regions and returns per-region area, centroid, and contact
chord, all in fixed ``[B, C]`` buffers (C = crossing capacity).

Method (all fixed-shape, jit/vmap friendly):

1. *Crossing detection*: proper P-edge × Q-edge crossings (the same
   half-open parameter rules as the aggregate kernel), compacted to the
   ``C`` smallest P-boundary parameters via ``top_k``.
2. *Traversal successor*: at an entering crossing (δ = +1: P enters CCW Q)
   the region boundary continues along P to the next crossing in P-order;
   at a leaving crossing (δ = −1) it switches to Q's boundary and continues
   to the next crossing in Q-order.  This is the Weiler–Atherton walk as a
   permutation of the crossing set — regions are its orbits.
3. *Orbit labels* by pointer-doubling min-propagation (log C gathers).
4. *Per-arc Green integrals* in closed form: the shoelace and first-moment
   line integrals are additive along each boundary, so an arc from boundary
   parameter a to b is a difference of per-edge prefix sums plus fractional
   end terms (+ one full-perimeter wrap term for the arc crossing vertex 0).
   The arc *chord* (the per-region force normal of floe_interactions.m:
   107-112, 118-137) is just the crossing-position difference.
5. *Per-region reduction* of arcs by orbit label (one-hot segment sum).

Degenerate configurations (collinear shared edges, odd crossing counts,
non-alternating parities, > C crossings) set ``consistent = False``; the
caller falls back to the aggregate single-contact path for those pairs —
which handles exactly those cases robustly via its ±eps carrier-line
averaging.  The two paths therefore cover each other's weak spots.

Difference decomposition: ∂(P \\ Q) traverses P forward and Q *backward*,
so ``region_stats(p, reverse_polygons(q, nv_q))`` yields the difference
regions with no extra machinery (used for floe-vs-boundary contact).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RegionStats", "region_stats", "reverse_polygons"]

_BIG = 1e30


class RegionStats(NamedTuple):
    """Disjoint-region statistics of a polygon boolean, shapes ``[B, C]``.

    Regions are keyed by their root crossing slot (the orbit's minimum
    label); non-root slots have ``valid = False`` and zero stats.
    """

    area: jnp.ndarray        # [B, C] region area (positive)
    centroid: jnp.ndarray    # [B, C, 2]
    chord: jnp.ndarray       # [B, C, 2] sum of the region's P-arc vectors
    valid: jnp.ndarray       # [B, C] slot is a region root
    consistent: jnp.ndarray  # [B] decomposition trustworthy
    n_cross: jnp.ndarray     # [B] proper crossing count (uncapped)
    p_len: jnp.ndarray       # [B, C] arc length of the region on P's boundary
    p_cnt: jnp.ndarray       # [B, C] count of its (nonzero) P-boundary
                             # segments — p_len/p_cnt is the reference's
                             # tangential length scale dl = mean(b(on))
                             # (floe_interactions.m:131)
    bbox: jnp.ndarray        # [B, C, 4] region bounds (minx, miny, maxx,
                             # maxy), +/-_BIG where invalid — or None unless
                             # region_stats(..., with_bbox=True).  Used by
                             # the displace-and-reclip direction probe to
                             # match regions the reference way (bbox
                             # overlap, floe_interactions.m:155-163 via
                             # oracle.py); costs ~11% of the step when
                             # computed, so it is opt-in.


def reverse_polygons(verts: jnp.ndarray, nv: jnp.ndarray) -> jnp.ndarray:
    """Reverse vertex order of padded polygons (CCW <-> CW).

    ``verts [..., V, 2]`` padded-with-first-vertex, ``nv [...]`` valid
    counts.  The result keeps vertex 0 first so the padding convention is
    preserved: ``new[k] = old[(nv - k) mod nv]`` for ``k < nv``.
    """
    v = verts.shape[-2]
    k = jnp.arange(v)
    nv_ = nv[..., None].astype(jnp.int32)
    idx = jnp.where(k == 0, 0, nv_ - k)
    idx = jnp.where((k < nv_) & (idx >= 0), idx, 0)
    return jnp.take_along_axis(verts, idx[..., None], axis=-2)


def _mseg(ax, ay, bx, by):
    """First-moment line-integral contributions of segment a->b.

    Standard polygon centroid terms: ``Cx A = Σ (x_a + x_b) cross(a, b)/6``
    (and y alike) — additive along a straight boundary, so partial edges
    compose exactly.
    """
    cr = ax * by - ay * bx
    return (ax + bx) * cr / 6.0, (ay + by) * cr / 6.0, cr


def region_stats(p: jnp.ndarray, q: jnp.ndarray, c_cap: int,
                 with_bbox: bool = False) -> RegionStats:
    """Disjoint regions of P ∩ Q for ``[B, Vp, 2] × [B, Vq, 2]`` CCW pairs.

    ``c_cap``: crossing capacity C (pairs with more crossings fall back via
    ``consistent = False``).  For P \\ Q pass ``reverse_polygons(q, nv_q)``.
    """
    b, vp, _ = p.shape
    vq = q.shape[1]
    c = c_cap
    if c > vp * vq:
        raise ValueError(f"c_cap {c} > Vp*Vq {vp * vq}")
    i32 = jnp.int32

    p0 = p
    p1 = jnp.roll(p, -1, axis=1)
    d = p1 - p0                                       # [B, Vp, 2]
    q0 = q
    q1 = jnp.roll(q, -1, axis=1)
    dq = q1 - q0                                      # [B, Vq, 2]

    # ---- crossing detection (same half-open rules as clip_integral) -------
    dxe = d[:, :, None, 0]
    dye = d[:, :, None, 1]
    dqx = dq[:, None, :, 0]
    dqy = dq[:, None, :, 1]
    denom = dxe * dqy - dye * dqx                     # [B, Vp, Vq]
    live = jnp.abs(denom) > 0
    inv = 1.0 / jnp.where(live, denom, 1.0)
    relx = q0[:, None, :, 0] - p0[:, :, None, 0]
    rely = q0[:, None, :, 1] - p0[:, :, None, 1]
    t = (relx * dqy - rely * dqx) * inv               # param along P edge
    s = (relx * dye - rely * dxe) * inv               # param along Q edge
    hit = live & (t >= 0) & (t < 1) & (s >= 0) & (s < 1)
    n_cross = jnp.sum(hit.astype(i32), axis=(1, 2))   # [B]

    iota_p = jax.lax.broadcasted_iota(p.dtype, (b, vp, vq), 1)
    u = iota_p + t                                    # P-boundary parameter
    key = jnp.where(hit, -u, -_BIG).reshape(b, vp * vq)
    vals, flat = jax.lax.top_k(key, c)                # ascending u
    sel = vals > -_BIG / 2                            # [B, C] slot occupied
    i_c = (flat // vq).astype(i32)
    j_c = (flat % vq).astype(i32)

    def g2(arr, idx):                                 # [B, V, 2] by [B, C]
        return jnp.take_along_axis(arr, idx[:, :, None], axis=1)

    def g1(arr3, flat_idx):                           # [B, Vp, Vq] by flat
        return jnp.take_along_axis(arr3.reshape(b, vp * vq), flat_idx, axis=1)

    t_c = g1(t, flat)
    s_c = g1(s, flat)
    delta = -jnp.sign(g1(denom, flat))                # +1 P enters CCW Q
    pe0 = g2(p0, i_c)                                 # [B, C, 2]
    de = g2(d, i_c)
    qe0 = g2(q0, j_c)
    dqe = g2(dq, j_c)
    pos = pe0 + t_c[:, :, None] * de                  # crossing position
    u_c = i_c.astype(p.dtype) + t_c
    w_c = j_c.astype(p.dtype) + s_c                   # Q-boundary parameter

    m = jnp.sum(sel.astype(i32), axis=1)              # [B] selected count
    slot = jnp.arange(c, dtype=i32)

    # ---- successors --------------------------------------------------------
    nxt_p = jnp.where(slot[None] + 1 < m[:, None], slot[None] + 1, 0)
    wkey = jnp.where(sel, w_c, _BIG)
    qperm = jnp.argsort(wkey, axis=1).astype(i32)     # Q-order -> slot
    qrank = jnp.argsort(qperm, axis=1).astype(i32)    # slot -> Q-order
    nxt_rank = jnp.where(qrank + 1 < m[:, None], qrank + 1, 0)
    nxt_q = jnp.take_along_axis(qperm, nxt_rank, axis=1)
    succ = jnp.where(sel, jnp.where(delta > 0, nxt_p, nxt_q), slot[None])

    # ---- consistency -------------------------------------------------------
    def at(a, idx):
        return jnp.take_along_axis(a, idx, axis=1)

    alt_p = jnp.where(sel, at(delta, nxt_p) == -delta, True)
    alt_q = jnp.where(sel, at(delta, nxt_q) == -delta, True)
    consistent = (
        (m >= 2) & (m % 2 == 0) & (n_cross <= c)
        & jnp.all(alt_p, axis=1) & jnp.all(alt_q, axis=1)
    )

    # ---- orbit labels (pointer doubling) -----------------------------------
    lab = jnp.broadcast_to(slot[None], (b, c))
    sc = succ
    for _ in range(max(1, math.ceil(math.log2(c)))):
        lab = jnp.minimum(lab, at(lab, sc))
        sc = at(sc, sc)

    # ---- per-edge prefix sums ----------------------------------------------
    def prefixes(v0, v1):
        mx_e, my_e, sh_e = _mseg(v0[..., 0], v0[..., 1],
                                 v1[..., 0], v1[..., 1])
        z = jnp.zeros((b, 1), p.dtype)
        return (jnp.concatenate([z, jnp.cumsum(sh_e, axis=1)], axis=1),
                jnp.concatenate([z, jnp.cumsum(mx_e, axis=1)], axis=1),
                jnp.concatenate([z, jnp.cumsum(my_e, axis=1)], axis=1))

    shp, mxp, myp = prefixes(p0, p1)                  # [B, Vp+1]
    shq, mxq, myq = prefixes(q0, q1)                  # [B, Vq+1]

    def cum_at(pref_sh, pref_mx, pref_my, e0, idx, pt):
        """Boundary-integral potentials F(u) at a crossing: full edges up to
        the crossing's edge + the fractional piece from the edge start."""
        base_sh = jnp.take_along_axis(pref_sh, idx, axis=1)
        base_mx = jnp.take_along_axis(pref_mx, idx, axis=1)
        base_my = jnp.take_along_axis(pref_my, idx, axis=1)
        fmx, fmy, fsh = _mseg(e0[..., 0], e0[..., 1], pt[..., 0], pt[..., 1])
        return base_sh + fsh, base_mx + fmx, base_my + fmy

    f_sh, f_mx, f_my = cum_at(shp, mxp, myp, pe0, i_c, pos)
    g_sh, g_mx, g_my = cum_at(shq, mxq, myq, qe0, j_c, pos)
    shp_tot = shp[:, -1:]
    mxp_tot = mxp[:, -1:]
    myp_tot = myp[:, -1:]
    shq_tot = shq[:, -1:]
    mxq_tot = mxq[:, -1:]
    myq_tot = myq[:, -1:]

    # ---- arc integrals (outgoing arc of each crossing) ---------------------
    # P-arc (delta = +1): u_c -> u at next-P crossing; wraps past vertex 0
    # only from the largest u to the smallest (slots are u-sorted).
    u2 = at(u_c, nxt_p)
    wrap_p = (u2 <= u_c).astype(p.dtype)
    arc_sh_p = at(f_sh, nxt_p) - f_sh + wrap_p * shp_tot
    arc_mx_p = at(f_mx, nxt_p) - f_mx + wrap_p * mxp_tot
    arc_my_p = at(f_my, nxt_p) - f_my + wrap_p * myp_tot
    chord_p = at(pos, nxt_p[:, :, None]) - pos        # [B, C, 2]

    # P-arc length + nonzero-segment count (for the reference's dl =
    # mean on-boundary edge length, floe_interactions.m:126-131).  Padded
    # (zero-length) edges never carry crossings and are excluded from the
    # counts.
    len_e = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)  # [B, Vp]
    nz_e = (len_e > 0).astype(p.dtype)
    z1 = jnp.zeros((b, 1), p.dtype)
    lp = jnp.concatenate([z1, jnp.cumsum(len_e, axis=1)], axis=1)
    np_ = jnp.concatenate([z1, jnp.cumsum(nz_e, axis=1)], axis=1)
    len_at = (jnp.take_along_axis(lp, i_c, axis=1)
              + t_c * jnp.take_along_axis(len_e, i_c, axis=1))
    arc_len_p = at(len_at, nxt_p) - len_at + wrap_p * lp[:, -1:]
    # segments: partial end of the start edge + full edges between + the
    # partial start of the end edge (present only when its t > 0)
    nz_c = jnp.take_along_axis(nz_e, i_c, axis=1)     # [B, C]
    full_between = (at(jnp.take_along_axis(np_, i_c, axis=1), nxt_p)
                    - jnp.take_along_axis(np_, i_c + 1, axis=1)
                    + wrap_p * np_[:, -1:])
    end_piece = at(nz_c * (t_c > 0).astype(p.dtype), nxt_p)
    arc_cnt_p = nz_c + full_between + end_piece

    # Q-arc (delta = -1): w_c -> w at next-Q crossing.
    w2 = at(w_c, nxt_q)
    wrap_q = (w2 <= w_c).astype(p.dtype)
    arc_sh_q = at(g_sh, nxt_q) - g_sh + wrap_q * shq_tot
    arc_mx_q = at(g_mx, nxt_q) - g_mx + wrap_q * mxq_tot
    arc_my_q = at(g_my, nxt_q) - g_my + wrap_q * myq_tot

    inp = sel & (delta > 0)

    if with_bbox:
        # ---- per-arc bounding boxes (reclip probe only — measured ~11%
        # step cost when computed unconditionally) ------------------------
        # Arc extent = its two crossing endpoints + the original-polygon
        # vertices whose boundary parameter lies strictly inside the arc's
        # (lo, hi) interval (wrapping past parameter 0 when hi <= lo).
        # Padded vertices replicate vertex 0, which a wrapping arc
        # genuinely passes through, and non-wrapping arcs never reach
        # padding parameters — so no vertex-count input is needed.
        end_p = pos + chord_p
        end_q = at(pos, nxt_q[:, :, None])
        endp = jnp.where(inp[:, :, None], end_p, end_q)    # [B, C, 2]
        kp = jnp.arange(vp, dtype=p.dtype)
        lo_p, hi_p = u_c[:, :, None], u2[:, :, None]
        in_arc_p = jnp.where(hi_p <= lo_p, (kp > lo_p) | (kp < hi_p),
                             (kp > lo_p) & (kp < hi_p)) & inp[:, :, None]
        kq = jnp.arange(vq, dtype=p.dtype)
        lo_q, hi_q = w_c[:, :, None], w2[:, :, None]
        in_arc_q = jnp.where(hi_q <= lo_q, (kq > lo_q) | (kq < hi_q),
                             (kq > lo_q) & (kq < hi_q)) \
            & (sel & ~inp)[:, :, None]

        def _vmin(coords, mask):                           # -> [B, C]
            return jnp.min(jnp.where(mask, coords[:, None, :], _BIG), axis=2)

        def _vmax(coords, mask):
            return jnp.max(jnp.where(mask, coords[:, None, :], -_BIG),
                           axis=2)

        e_ok = sel[:, :, None]
        exs = jnp.where(e_ok, jnp.stack([pos[..., 0], endp[..., 0]], -1),
                        _BIG)
        eys = jnp.where(e_ok, jnp.stack([pos[..., 1], endp[..., 1]], -1),
                        _BIG)
        sminx = jnp.minimum(jnp.min(exs, -1), jnp.minimum(
            _vmin(p0[..., 0], in_arc_p), _vmin(q0[..., 0], in_arc_q)))
        sminy = jnp.minimum(jnp.min(eys, -1), jnp.minimum(
            _vmin(p0[..., 1], in_arc_p), _vmin(q0[..., 1], in_arc_q)))
        exs = jnp.where(e_ok, jnp.stack([pos[..., 0], endp[..., 0]], -1),
                        -_BIG)
        eys = jnp.where(e_ok, jnp.stack([pos[..., 1], endp[..., 1]], -1),
                        -_BIG)
        smaxx = jnp.maximum(jnp.max(exs, -1), jnp.maximum(
            _vmax(p0[..., 0], in_arc_p), _vmax(q0[..., 0], in_arc_q)))
        smaxy = jnp.maximum(jnp.max(eys, -1), jnp.maximum(
            _vmax(p0[..., 1], in_arc_p), _vmax(q0[..., 1], in_arc_q)))

    contrib_sh = jnp.where(inp, arc_sh_p, jnp.where(sel, arc_sh_q, 0.0))
    contrib_mx = jnp.where(inp, arc_mx_p, jnp.where(sel, arc_mx_q, 0.0))
    contrib_my = jnp.where(inp, arc_my_p, jnp.where(sel, arc_my_q, 0.0))
    contrib_ch = jnp.where(inp[:, :, None], chord_p, 0.0)
    contrib_len = jnp.where(inp, arc_len_p, 0.0)
    contrib_cnt = jnp.where(inp, arc_cnt_p, 0.0)

    # ---- reduce arcs into regions by orbit label ---------------------------
    onehot = ((lab[:, :, None] == slot[None, None, :]) & sel[:, :, None]
              ).astype(p.dtype)                       # [B, slot, region]
    area_r = 0.5 * jnp.einsum("bsr,bs->br", onehot, contrib_sh)
    mx_r = jnp.einsum("bsr,bs->br", onehot, contrib_mx)
    my_r = jnp.einsum("bsr,bs->br", onehot, contrib_my)
    ch_r = jnp.einsum("bsr,bsk->brk", onehot, contrib_ch)
    len_r = jnp.einsum("bsr,bs->br", onehot, contrib_len)
    cnt_r = jnp.einsum("bsr,bs->br", onehot, contrib_cnt)

    root = (lab == slot[None]) & sel
    valid = root & consistent[:, None] & (area_r > 0)
    safe = jnp.where(area_r > 0, area_r, 1.0)
    centroid = jnp.stack([mx_r / safe, my_r / safe], axis=-1)
    zero2 = jnp.zeros_like(centroid)
    bbox = None
    if with_bbox:
        ob = (lab[:, :, None] == slot[None, None, :]) & sel[:, :, None]
        bminx = jnp.min(jnp.where(ob, sminx[:, :, None], _BIG), axis=1)
        bminy = jnp.min(jnp.where(ob, sminy[:, :, None], _BIG), axis=1)
        bmaxx = jnp.max(jnp.where(ob, smaxx[:, :, None], -_BIG), axis=1)
        bmaxy = jnp.max(jnp.where(ob, smaxy[:, :, None], -_BIG), axis=1)
        bbox = jnp.stack([
            jnp.where(valid, bminx, _BIG), jnp.where(valid, bminy, _BIG),
            jnp.where(valid, bmaxx, -_BIG), jnp.where(valid, bmaxy, -_BIG),
        ], axis=-1)
    return RegionStats(
        area=jnp.where(valid, area_r, 0.0),
        centroid=jnp.where(valid[:, :, None], centroid, zero2),
        chord=jnp.where(valid[:, :, None], ch_r, zero2),
        valid=valid,
        consistent=consistent,
        n_cross=n_cross,
        p_len=jnp.where(valid, len_r, 0.0),
        p_cnt=jnp.where(valid, cnt_r, 0.0),
        bbox=bbox,
    )

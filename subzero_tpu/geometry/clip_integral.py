"""Closed-form parity-integral overlap statistics — the fast narrow-phase core.

Same quantities as clip.py / clip_batched.py (area, centroid moments, contact
chord of a polygon boolean result via Green's theorem over boundary
subsegments), derived analytically instead of by subdividing edges and
classifying segment midpoints.

Key identity: every Green's-theorem contribution of P's edge e — point
``r(t) = p0 + t d``, ``t in [0, 1]`` — weighted by the inside-Q indicator
``ind(t)`` is *linear in the two integrals*

    I0 = ∫ ind(t) dt          I1 = ∫ t ind(t) dt

because along a straight edge the shoelace density is constant:
``cross(r(a), r(b)) = (b - a) cross(p0, d)``.  Writing ``C = cross(p0, d)``:

    area  contribution = C/2 · I0
    mom_x contribution = C/3 · (p0x I0 + dx I1)
    mom_y contribution = C/3 · (p0y I0 + dy I1)
    chord contribution = d · I0

``ind(t)`` itself is the ray-casting parity along the edge's carrier line:
starting outside Q at ``t = -inf`` and flipping at every proper crossing with
Q's boundary, ``ind(t) = Σ_{t_k < t} δ_k`` with ``δ_k = -sign(cross(d, dq_k))``
(+1 entering, -1 leaving a CCW Q).  Hence, with ``τ_k = clamp(t_k, 0, 1)``,

    I0 = Σ_k δ_k (1 - τ_k)            I1 = Σ_k δ_k (1 - τ_k²) / 2

summed over ALL carrier-line × Q-edge crossings with ``s_k ∈ [0, 1)`` — no
point-in-polygon test, no sort, no segment subdivision.  Crossings behind the
edge (t_k < 0) contribute the start-point indicator; crossings past the end
clamp to zero.  Everything is continuous in the inputs (a crossing sliding
past an edge endpoint fades out through the clamp), and the indicator is
consistent along the line *by construction* — the failure mode of classifying
each segment independently never arises.

Degeneracy rule (same semantics as clip.py's midpoint nudge): each edge is
evaluated on two carrier lines offset by ±eps along the edge's outward
normal and the results averaged.  Collinear shared edges — fracture
siblings, wall contact, lattice packs — then get weight 1/2 from each parent
polygon, and the O(eps) perturbation of the crossing parameters cancels to
O(eps²) in the average.  eps = scale · (machine eps)^(2/3): far above
crossing-parameter roundoff, far below any physical area scale.

Layout is batch-minor ([V, B], [Vp, Vq, B]) like clip_batched.py so every
elementwise op fills the full VPU lane width; see clip_pallas.py for the
fused Pallas TPU kernel of the same math.

Replaces the reference's Clipper-MEX region materialization
(``polyclip.m:63-81`` -> ``private/mexclipper.cpp:205-306``) as the contact
hot path; validated against clip.py and the numpy/Monte-Carlo oracles in
tests/test_geometry.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .clip import OverlapStats

__all__ = [
    "overlap_stats_int",
    "difference_stats_int",
    "indicator_integrals_bm",
    "clip_integral_bm",
]


def indicator_integrals_bm(px0, py0, dx, dy, qx0, qy0, dqx, dqy, eps):
    """Per-edge inside-Q indicator integrals (I0, I1), each ``[Vp, B]``.

    P edges as start ``(px0, py0)`` + direction ``(dx, dy)``, all ``[Vp, B]``;
    Q edges likewise ``[Vq, B]``; eps ``[B]`` (or scalar) nudge magnitude.
    Padded zero-length edges (d == 0 or dq == 0) contribute nothing.
    """
    denom = dx[:, None] * dqy[None] - dy[:, None] * dqx[None]   # [Vp, Vq, B]
    live = jnp.abs(denom) > 0
    safe = jnp.where(live, denom, 1.0)
    inv_denom = 1.0 / safe
    delta = -jnp.sign(denom)

    elen2 = dx * dx + dy * dy                                   # [Vp, B]
    inv_len = jnp.where(elen2 > 0, jax.lax.rsqrt(jnp.where(elen2 > 0, elen2, 1.0)), 0.0)
    nx = dy * inv_len
    ny = -dx * inv_len

    i0 = 0.0
    i1 = 0.0
    for sgn in (1.0, -1.0):
        ox = px0 + sgn * eps * nx                               # [Vp, B]
        oy = py0 + sgn * eps * ny
        relx = qx0[None] - ox[:, None]                          # [Vp, Vq, B]
        rely = qy0[None] - oy[:, None]
        t = (relx * dqy[None] - rely * dqx[None]) * inv_denom
        s = (relx * dy[:, None] - rely * dx[:, None]) * inv_denom
        # Half-open [0, 1) on s: a carrier line through a Q vertex flips
        # parity exactly once (on the succeeding Q edge).
        valid = live & (s >= 0) & (s < 1)
        tc = jnp.clip(t, 0.0, 1.0)
        w = jnp.where(valid, delta, 0.0)
        i0 = i0 + jnp.sum(w * (1.0 - tc), axis=1)               # [Vp, B]
        i1 = i1 + jnp.sum(w * (1.0 - tc * tc), axis=1)
    i0 = 0.5 * i0
    i1 = 0.25 * i1
    # Parity guards: exact values satisfy 0 <= I1 <= 1/2, I0 in [0, 1].  A
    # roundoff-corrupted parity chain (carrier line within one ulp of a Q
    # vertex) lands outside; clamping bounds its damage.
    i0 = jnp.clip(i0, 0.0, 1.0)
    i1 = jnp.clip(i1, 0.0, 0.5)
    return i0, i1


def _side_integral_bm(px0, py0, px1, py1, qx0, qy0, qx1, qy1,
                      want_inside: bool, eps):
    """Green's-theorem sums of P's boundary weighted by the (in/out)side-Q
    indicator.  Returns (area, mx, my, chx, chy), each ``[B]``."""
    dx = px1 - px0
    dy = py1 - py0
    dqx = qx1 - qx0
    dqy = qy1 - qy0
    i0, i1 = indicator_integrals_bm(px0, py0, dx, dy, qx0, qy0, dqx, dqy, eps)
    if not want_inside:
        i0 = 1.0 - i0
        i1 = 0.5 - i1
    c = px0 * dy - py0 * dx                                     # cross(p0, d)
    area = 0.5 * jnp.sum(c * i0, axis=0)
    mx = jnp.sum(c * (px0 * i0 + dx * i1), axis=0) / 3.0
    my = jnp.sum(c * (py0 * i0 + dy * i1), axis=0) / 3.0
    chx = jnp.sum(dx * i0, axis=0)
    chy = jnp.sum(dy * i0, axis=0)
    return area, mx, my, chx, chy


def _n_cross_bm(px0, py0, dx, dy, qx0, qy0, dqx, dqy):
    """Proper dP × dQ crossing count (InterX analog), un-nudged, ``[B]``."""
    denom = dx[:, None] * dqy[None] - dy[:, None] * dqx[None]
    live = jnp.abs(denom) > 0
    safe = jnp.where(live, denom, 1.0)
    relx = qx0[None] - px0[:, None]
    rely = qy0[None] - py0[:, None]
    t = (relx * dqy[None] - rely * dqx[None]) / safe
    s = (relx * dy[:, None] - rely * dx[:, None]) / safe
    valid = live & (t >= 0) & (t < 1) & (s >= 0) & (s < 1)
    return jnp.sum(valid.astype(jnp.int32), axis=(0, 1))


def clip_integral_bm(p: jnp.ndarray, q: jnp.ndarray,
                     difference: bool) -> OverlapStats:
    """P ∩ Q (or P \\ Q) statistics for ``[B, Vp, 2] × [B, Vq, 2]`` pairs."""
    dtype = p.dtype
    eps = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(p), axis=(1, 2)),
                    jnp.max(jnp.abs(q), axis=(1, 2))), 1.0
    ) * jnp.asarray(jnp.finfo(dtype).eps, dtype) ** (2.0 / 3.0)   # [B]

    px0 = p[:, :, 0].T
    py0 = p[:, :, 1].T
    px1 = jnp.roll(p, -1, axis=1)[:, :, 0].T
    py1 = jnp.roll(p, -1, axis=1)[:, :, 1].T
    qx0 = q[:, :, 0].T
    qy0 = q[:, :, 1].T
    qx1 = jnp.roll(q, -1, axis=1)[:, :, 0].T
    qy1 = jnp.roll(q, -1, axis=1)[:, :, 1].T

    a_p, mx_p, my_p, chx, chy = _side_integral_bm(
        px0, py0, px1, py1, qx0, qy0, qx1, qy1, not difference, eps)
    a_q, mx_q, my_q, _, _ = _side_integral_bm(
        qx0, qy0, qx1, qy1, px0, py0, px1, py1, True, eps)

    n_cross = _n_cross_bm(px0, py0, px1 - px0, py1 - py0,
                          qx0, qy0, qx1 - qx0, qy1 - qy0)

    if difference:
        area = a_p - a_q
        mx = mx_p - mx_q
        my = my_p - my_q
    else:
        area = a_p + a_q
        mx = mx_p + mx_q
        my = my_p + my_q

    safe_area = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    ok = jnp.abs(area) > 1e-9
    centroid = jnp.stack(
        [jnp.where(ok, mx / safe_area, 0.0),
         jnp.where(ok, my / safe_area, 0.0)], axis=-1)
    chord = jnp.stack([chx, chy], axis=-1)
    return OverlapStats(area=area, centroid=centroid, chord_p=chord,
                        n_cross=n_cross)


@jax.jit
def overlap_stats_int(p: jnp.ndarray, q: jnp.ndarray) -> OverlapStats:
    """Closed-form P ∩ Q statistics for ``[B, V, 2]`` polygon pairs."""
    return clip_integral_bm(p, q, difference=False)


@jax.jit
def difference_stats_int(p: jnp.ndarray, q: jnp.ndarray) -> OverlapStats:
    """Closed-form P \\ Q statistics for ``[B, V, 2]`` polygon pairs."""
    return clip_integral_bm(p, q, difference=True)

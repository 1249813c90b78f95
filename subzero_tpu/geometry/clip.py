"""Boundary-integral polygon-overlap statistics — the TPU contact-geometry core.

The reference resolves every contact by materializing the overlap polygon(s)
with the Clipper C++ MEX (``polyclip.m`` -> ``private/mexclipper.cpp``) and
then measuring area / centroid / edge normals of each region
(``collisions/floe_interactions.m:29-137``).  Explicit polygon construction is
a pointer-chasing, dynamic-shape algorithm — hostile to a TPU.

Instead we compute every quantity the contact model needs *directly as a
boundary integral* over fixed-size edge buffers (Green's theorem over the
boundary of the clip result):

    d(P ∩ Q) = [subsegments of dP inside Q] ∪ [subsegments of dQ inside P]
    d(P \\ Q) = [subsegments of dP outside Q] ∪ [reversed dQ inside P]

For each directed subsegment q0→q1 (orientation inherited from its CCW
parent, negated for the reversed pieces) we accumulate

    area     += 1/2 (q0 × q1)
    moment_x += 1/6 (q0.x + q1.x)(q0 × q1)      (centroid = moment / area)
    moment_y += 1/6 (q0.y + q1.y)(q0 × q1)

and, over the dP side only, the *chord* Σ (q1 - q0).  Because the clip-result
boundary is a closed curve, Σ chords over both sides vanish, so the dP-side
chord is exactly minus the dQ-side chord: per-pair forces built from it
satisfy Newton's third law to machine precision, with no sequential
symmetrization pass (cf. ``floe_interactions_all.m:187-214`` "this has to be
done sequentially").

The contact normal: for a CCW polygon P the clip region's edges lying on dP
carry P's outward normal (right of travel), so the area-weighted sum of
outward edge normals over the dP side is ``(chord_y, -chord_x)``, and the
force on P that reduces the overlap is along ``(-chord_y, chord_x)``.  This
reproduces the direction the reference builds from region-edge normals plus
its displace-and-reclip disambiguation (``floe_interactions.m:107-165``)
analytically — the chord orientation already encodes the correct sign.

Everything is O(V^2) dense tensor math per pair: edge×edge intersection
parameters, per-edge sorted splits into subsegments, midpoint-in-polygon
classification, masked reduction.  No dynamic shapes, no host callbacks.

Deliberate design delta (documented for parity review): disjoint overlap
regions of one pair are aggregated into a single effective contact (total
area, area-weighted centroid, summed chord).  The reference applies one force
per region (``floe_interactions.m:92-190``); the aggregate is exact whenever
the per-region normals agree (always true for convex floes, the generic case)
and an approximation otherwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .polygon import poly_edges, points_in_polygon

__all__ = [
    "OverlapStats",
    "overlap_stats",
    "difference_stats",
    "intersection_area",
]


class OverlapStats(NamedTuple):
    """Statistics of a polygon boolean result for a batch of polygon pairs.

    Attributes (all ``[...]`` batched like the inputs):
      area:     area of the clip result (>= 0 for simple CCW inputs)
      centroid: ``[..., 2]`` area centroid of the result (0 where area ~ 0)
      chord_p:  ``[..., 2]`` Σ directed subsegments of dP in the result.  The
                overlap-reducing force direction on P is
                ``(-chord_y, chord_x)`` (CCW convention); its norm is the
                contact length `dl`.
      n_cross:  number of proper dP×dQ edge crossings (InterX count analog,
                floe_interactions.m:70-71)
    """

    area: jnp.ndarray
    centroid: jnp.ndarray
    chord_p: jnp.ndarray
    n_cross: jnp.ndarray


def _cross_z(ax, ay, bx, by):
    return ax * by - ay * bx


def _side_contrib(p: jnp.ndarray, other: jnp.ndarray, t_params: jnp.ndarray,
                  t_valid: jnp.ndarray, want_inside: bool, eps: jnp.ndarray):
    """Contributions of dP subsegments classified against ``other``.

    p: ``[V, 2]`` CCW padded polygon; other: ``[Vq, 2]``;
    t_params/t_valid: ``[V, Vq]`` intersection parameters on P's edges
    (vs each edge of ``other``) and their validity mask.
    want_inside: keep subsegments whose midpoint is inside ``other``
    (True) or outside (False).

    Degeneracy rule: a subsegment is weighted by the mean of two tests at
    midpoint ± eps·n̂ (n̂ = P's outward edge normal).  Strictly interior /
    exterior subsegments get weight 1 / 0; a subsegment lying ON a collinear
    edge of ``other`` gets 1/2 from each parent polygon — summing to exactly
    one boundary contribution for shared same-direction edges and zero for
    anti-parallel (externally touching) edges.  This replaces the integer
    robustness the reference buys from Clipper's int64 arithmetic
    (polyclip.m:63-67).

    Returns (area_sum, mx_sum, my_sum, chord ``[2]``).
    """
    v, vq = t_params.shape
    p0, p1 = poly_edges(p)
    d = p1 - p0                                          # [V, 2]

    # Additional splits at the projections of ``other``'s vertices onto each
    # P edge.  Collinear overlapping edges produce no proper crossing
    # (parallel => zero denominator), so without these the subsegment
    # boundaries at shared-edge junctions are lost.  Splitting an edge at any
    # point is always safe — it only refines the subdivision.
    d2 = jnp.sum(d * d, axis=-1)                         # [V]
    rel_v = other[None, :, :] - p0[:, None, :]           # [V, Vq, 2]
    t_proj = jnp.sum(rel_v * d[:, None, :], axis=-1) / jnp.where(
        d2 > 0, d2, 1.0
    )[:, None]
    t_proj = jnp.clip(t_proj, 0.0, 1.0)

    # Sorted split points per edge: invalid -> +inf -> clipped to 1 (zero-len).
    t = jnp.where(t_valid, t_params, jnp.inf)
    t = jnp.concatenate([t, t_proj], axis=-1)            # [V, 2 Vq]
    t = jnp.sort(t, axis=-1)
    t = jnp.clip(t, 0.0, 1.0)
    vq = 2 * vq
    zeros = jnp.zeros((v, 1), t.dtype)
    ones = jnp.ones((v, 1), t.dtype)
    t_lo = jnp.concatenate([zeros, t], axis=-1)          # [V, Vq+1]
    t_hi = jnp.concatenate([t, ones], axis=-1)           # [V, Vq+1]

    mid = p0[:, None, :] + d[:, None, :] * (0.5 * (t_lo + t_hi))[..., None]
    # Outward normal of each P edge (CCW: right of travel), zero-safe.
    elen = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    nrm = jnp.stack([d[:, 1], -d[:, 0]], axis=-1) / jnp.where(elen > 0, elen, 1.0)
    probe = jnp.stack(
        [mid + eps * nrm[:, None, :], mid - eps * nrm[:, None, :]], axis=0
    )                                                     # [2, V, Vq+1, 2]
    inside = points_in_polygon(probe.reshape(-1, 2), other)
    inside = inside.reshape(2, v, vq + 1)
    wgt = 0.5 * (inside[0].astype(t.dtype) + inside[1].astype(t.dtype))
    if not want_inside:
        wgt = 1.0 - wgt
    wgt = jnp.where(t_hi > t_lo, wgt, 0.0)

    q0 = p0[:, None, :] + d[:, None, :] * t_lo[..., None]   # [V, Vq+1, 2]
    q1 = p0[:, None, :] + d[:, None, :] * t_hi[..., None]
    w = _cross_z(q0[..., 0], q0[..., 1], q1[..., 0], q1[..., 1]) * wgt
    area = 0.5 * jnp.sum(w)
    mx = jnp.sum(w * (q0[..., 0] + q1[..., 0])) / 6.0
    my = jnp.sum(w * (q0[..., 1] + q1[..., 1])) / 6.0
    seg = (q1 - q0) * wgt[..., None]
    chord = jnp.sum(seg, axis=(0, 1))                    # [2]
    return area, mx, my, chord


def _edge_intersections(p: jnp.ndarray, q: jnp.ndarray):
    """Pairwise edge-intersection parameters of two padded CCW polygons.

    Returns (t ``[Vp, Vq]`` params on P's edges, s ``[Vp, Vq]`` params on Q's
    edges, valid mask, n_cross scalar).
    """
    p0, p1 = poly_edges(p)
    q0, q1 = poly_edges(q)
    dp = p1 - p0                                         # [Vp, 2]
    dq = q1 - q0                                         # [Vq, 2]

    rel = q0[None, :, :] - p0[:, None, :]                # [Vp, Vq, 2]
    denom = _cross_z(dp[:, None, 0], dp[:, None, 1], dq[None, :, 0], dq[None, :, 1])
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    t = _cross_z(rel[..., 0], rel[..., 1], dq[None, :, 0], dq[None, :, 1]) / safe
    s = _cross_z(rel[..., 0], rel[..., 1], dp[:, None, 0], dp[:, None, 1]) / safe
    # Half-open [0,1) on both parameters: a crossing landing exactly on a
    # shared vertex is counted once (on the succeeding edge), never twice.
    valid = (jnp.abs(denom) > 0) & (t >= 0) & (t < 1) & (s >= 0) & (s < 1)
    n_cross = jnp.sum(valid.astype(jnp.int32))
    return t, s, valid, n_cross


def _finalize(area, mx, my, chord_p, n_cross, dtype):
    safe_area = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    centroid = jnp.where(
        jnp.abs(area) > 1e-9,
        jnp.stack([mx, my]) / safe_area,
        jnp.zeros(2, dtype),
    )
    return OverlapStats(area=area, centroid=centroid, chord_p=chord_p,
                        n_cross=n_cross)


def _pair_eps(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Classification nudge: sqrt(machine eps) x coordinate scale.

    Large enough to dominate PIP roundoff at the pair's coordinate
    magnitude, small enough to be physically negligible (the small-region
    area cull in the contact model is orders of magnitude larger)."""
    scale = jnp.maximum(jnp.max(jnp.abs(p)), jnp.max(jnp.abs(q)))
    scale = jnp.maximum(scale, 1.0)
    return scale * jnp.sqrt(jnp.finfo(p.dtype).eps)


def _overlap_one(p: jnp.ndarray, q: jnp.ndarray) -> OverlapStats:
    """Statistics of P ∩ Q for one polygon pair ``p: [Vp, 2], q: [Vq, 2]``."""
    eps = _pair_eps(p, q)
    t, s, valid, n_cross = _edge_intersections(p, q)
    a_p, mx_p, my_p, chord_p = _side_contrib(p, q, t, valid, True, eps)
    a_q, mx_q, my_q, _ = _side_contrib(q, p, s.T, valid.T, True, eps)
    return _finalize(a_p + a_q, mx_p + mx_q, my_p + my_q, chord_p, n_cross,
                     p.dtype)


def _difference_one(p: jnp.ndarray, q: jnp.ndarray) -> OverlapStats:
    """Statistics of P \\ Q for one polygon pair.

    Boundary of P \\ Q = (dP outside Q) + (dQ inside P, reversed), so the
    reversed dQ pieces enter all integrals with a minus sign.  Used for
    floe-vs-domain contact: the reference clips ``polyclip(c1, c2, 'dif')``
    against the domain polygon (``floe_interactions.m:34``).
    """
    eps = _pair_eps(p, q)
    t, s, valid, n_cross = _edge_intersections(p, q)
    a_p, mx_p, my_p, chord_p = _side_contrib(p, q, t, valid, False, eps)
    a_q, mx_q, my_q, _ = _side_contrib(q, p, s.T, valid.T, True, eps)
    return _finalize(a_p - a_q, mx_p - mx_q, my_p - my_q, chord_p, n_cross,
                     p.dtype)


# Batched over leading axes of both polygons.
overlap_stats = jax.jit(jax.vmap(_overlap_one))
overlap_stats.__doc__ = (
    "Batched P ∩ Q statistics: verts_p[B, Vp, 2], verts_q[B, Vq, 2] -> "
    "OverlapStats with leading batch axis.  Polygons must be CCW, padded "
    "with their first vertex, and expressed in a common (pair-local) frame."
)

difference_stats = jax.jit(jax.vmap(_difference_one))
difference_stats.__doc__ = (
    "Batched P \\ Q statistics (same conventions as overlap_stats)."
)


def intersection_area(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Area of P ∩ Q for padded polygons (thin wrapper)."""
    if p.ndim == 2:
        return _overlap_one(p, q).area
    return overlap_stats(p, q).area

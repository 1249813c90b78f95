"""Lane-aligned batched overlap statistics.

The vmap-of-scalar-pair formulation in clip.py materializes [B, V, V']
tensors whose minor dimensions are the vertex counts (16-32) — a fraction of
the TPU's 128-lane registers, with layout shuffles between every op.  Here
the SAME math is written with the pair batch as the MINOR axis: every
intermediate is [V, V', B] (or [V*V', B]), so each elementwise op runs the
full lane width over pairs and the compiler never transposes.

Numerically identical to clip.py's _overlap_one / _difference_one (same
splits, same half-weight nudged classification); validated against them in
tests/test_geometry.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .clip import OverlapStats

__all__ = ["overlap_stats_bm", "difference_stats_bm"]


def _pip_batch(px, py, qx0, qy0, qx1, qy1):
    """Point-in-polygon, batch-minor.

    px, py: [..., B] probe points; q*: [Vq, B] polygon edges (padded edges
    are zero length and never straddle).  Returns bool [..., B].
    """
    # [..., Vq, B]
    pxe = px[..., None, :]
    pye = py[..., None, :]
    cond = (qy0 > pye) != (qy1 > pye)
    denom = jnp.where(qy1 == qy0, 1.0, qy1 - qy0)
    xint = qx0 + (pye - qy0) / denom * (qx1 - qx0)
    cross = cond & (pxe < xint)
    return jnp.sum(cross.astype(jnp.int32), axis=-2) % 2 == 1


def _side_contrib_bm(px0, py0, px1, py1,      # [Vp, B] P's edges
                     qx0, qy0, qx1, qy1,      # [Vq, B] Q's edges
                     t_params, t_valid,       # [Vp, Vq, B]
                     want_inside: bool, eps):  # eps: [B]
    vp = px0.shape[0]
    vq = qx0.shape[0]
    dx = px1 - px0                            # [Vp, B]
    dy = py1 - py0

    # splits at projections of Q's vertices onto P's edges
    d2 = dx * dx + dy * dy
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    relx = qx0[None, :, :] - px0[:, None, :]  # [Vp, Vq, B]
    rely = qy0[None, :, :] - py0[:, None, :]
    t_proj = (relx * dx[:, None] + rely * dy[:, None]) / safe_d2[:, None]
    t_proj = jnp.clip(t_proj, 0.0, 1.0)

    t = jnp.where(t_valid, t_params, jnp.inf)
    t = jnp.concatenate([t, t_proj], axis=1)  # [Vp, 2Vq, B]
    t = jnp.sort(t, axis=1)
    t = jnp.clip(t, 0.0, 1.0)
    nseg = 2 * vq + 1
    zeros = jnp.zeros_like(t[:, :1])
    ones = jnp.ones_like(t[:, :1])
    t_lo = jnp.concatenate([zeros, t], axis=1)   # [Vp, nseg, B]
    t_hi = jnp.concatenate([t, ones], axis=1)

    tm = 0.5 * (t_lo + t_hi)
    midx = px0[:, None] + dx[:, None] * tm       # [Vp, nseg, B]
    midy = py0[:, None] + dy[:, None] * tm
    elen = jnp.sqrt(d2)
    inv_elen = jnp.where(elen > 0, 1.0 / jnp.where(elen > 0, elen, 1.0), 0.0)
    nx = dy * inv_elen                           # outward normal for CCW
    ny = -dx * inv_elen
    ex = (eps * nx)[:, None]
    ey = (eps * ny)[:, None]

    in_p = _pip_batch(midx + ex, midy + ey, qx0, qy0, qx1, qy1)
    in_m = _pip_batch(midx - ex, midy - ey, qx0, qy0, qx1, qy1)
    wgt = 0.5 * (in_p.astype(t.dtype) + in_m.astype(t.dtype))
    if not want_inside:
        wgt = 1.0 - wgt
    wgt = jnp.where(t_hi > t_lo, wgt, 0.0)

    qx0s = px0[:, None] + dx[:, None] * t_lo     # [Vp, nseg, B]
    qy0s = py0[:, None] + dy[:, None] * t_lo
    qx1s = px0[:, None] + dx[:, None] * t_hi
    qy1s = py0[:, None] + dy[:, None] * t_hi
    w = (qx0s * qy1s - qx1s * qy0s) * wgt
    area = 0.5 * jnp.sum(w, axis=(0, 1))
    mx = jnp.sum(w * (qx0s + qx1s), axis=(0, 1)) / 6.0
    my = jnp.sum(w * (qy0s + qy1s), axis=(0, 1)) / 6.0
    chx = jnp.sum((qx1s - qx0s) * wgt, axis=(0, 1))
    chy = jnp.sum((qy1s - qy0s) * wgt, axis=(0, 1))
    return area, mx, my, chx, chy


def _clip_bm(p: jnp.ndarray, q: jnp.ndarray, difference: bool) -> OverlapStats:
    """p, q: [B, V, 2] padded CCW polygon pairs -> OverlapStats [B]."""
    dtype = p.dtype
    eps = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(p), axis=(1, 2)),
                    jnp.max(jnp.abs(q), axis=(1, 2))), 1.0
    ) * jnp.sqrt(jnp.finfo(dtype).eps)                     # [B]

    # batch-minor edge arrays [V, B]
    px0 = p[:, :, 0].T
    py0 = p[:, :, 1].T
    px1 = jnp.roll(p, -1, axis=1)[:, :, 0].T
    py1 = jnp.roll(p, -1, axis=1)[:, :, 1].T
    qx0 = q[:, :, 0].T
    qy0 = q[:, :, 1].T
    qx1 = jnp.roll(q, -1, axis=1)[:, :, 0].T
    qy1 = jnp.roll(q, -1, axis=1)[:, :, 1].T

    dpx = px1 - px0
    dpy = py1 - py0
    dqx = qx1 - qx0
    dqy = qy1 - qy0

    # edge-pair intersection params [Vp, Vq, B]
    relx = qx0[None, :, :] - px0[:, None, :]
    rely = qy0[None, :, :] - py0[:, None, :]
    denom = dpx[:, None] * dqy[None] - dpy[:, None] * dqx[None]
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    t = (relx * dqy[None] - rely * dqx[None]) / safe
    s = (relx * dpy[:, None] - rely * dpx[:, None]) / safe
    valid = (jnp.abs(denom) > 0) & (t >= 0) & (t < 1) & (s >= 0) & (s < 1)
    n_cross = jnp.sum(valid.astype(jnp.int32), axis=(0, 1))

    a_p, mx_p, my_p, chx, chy = _side_contrib_bm(
        px0, py0, px1, py1, qx0, qy0, qx1, qy1, t, valid,
        not difference, eps)
    a_q, mx_q, my_q, _, _ = _side_contrib_bm(
        qx0, qy0, qx1, qy1, px0, py0, px1, py1,
        jnp.swapaxes(s, 0, 1), jnp.swapaxes(valid, 0, 1), True, eps)

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
def overlap_stats_bm(p: jnp.ndarray, q: jnp.ndarray) -> OverlapStats:
    """Batch-minor P ∩ Q statistics for [B, V, 2] polygon pairs."""
    return _clip_bm(p, q, difference=False)


@jax.jit
def difference_stats_bm(p: jnp.ndarray, q: jnp.ndarray) -> OverlapStats:
    """Batch-minor P \\ Q statistics for [B, V, 2] polygon pairs."""
    return _clip_bm(p, q, difference=True)

"""Fused Pallas TPU kernel for the parity-integral clip (clip_integral.py).

One grid step processes a lane-aligned block of polygon pairs: inputs are
batch-minor ``[V, B]`` coordinate planes, every intermediate is a 2-D
``[Vp, BLOCK]`` VPU tile (the Q-edge axis is a statically unrolled loop, so
nothing 3-D ever materializes), and the whole narrow-phase geometry — offset
carrier-line crossings, indicator integrals, Green's-theorem reductions,
crossing count — runs in VMEM with a single HBM read per operand and a single
``[8, BLOCK]`` write.  The XLA version (clip_integral.py) materializes the
``[Vp, Vq, B]`` crossing tensors in HBM between fusions; this kernel is the
roofline version of the same math (validated bit-for-bit-tolerance against it
in tests/test_geometry.py, and against the numpy oracles).

Replaces the reference's per-pair Clipper MEX dispatch
(``polyclip.m`` -> ``private/mexclipper.cpp:205-306``): where the reference
crosses the MATLAB/C++ boundary once per floe pair, this crosses the
host/device boundary zero times per pair — the kernel is one node inside the
jitted physics step.

Requires float32 (TPU VPU native); the caller casts.  Works in interpreter
mode on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clip import OverlapStats

__all__ = ["overlap_stats_pallas", "difference_stats_pallas"]

_OUT_ROWS = 8  # area, mx, my, chx, chy, n_cross, pad, pad


def _indicator_integrals(px0, py0, dx, dy, eps, q_rows, vq):
    """(I0, I1) ``[Vp, B]`` — inside-Q indicator integrals along P's edges.

    q_rows: (qx0, qy0, qx1, qy1) refs/arrays ``[Vq, B]``; the Q-edge loop is
    a static unroll of 2-D tile ops.
    """
    qx0, qy0, qx1, qy1 = q_rows
    elen2 = dx * dx + dy * dy
    inv_len = jnp.where(
        elen2 > 0, jax.lax.rsqrt(jnp.where(elen2 > 0, elen2, 1.0)), 0.0
    )
    nx = dy * inv_len
    ny = -dx * inv_len

    i0 = jnp.zeros_like(px0)
    i1 = jnp.zeros_like(px0)
    for sgn in (1.0, -1.0):
        ox = px0 + sgn * eps * nx
        oy = py0 + sgn * eps * ny
        for j in range(vq):
            qx0j = qx0[j : j + 1, :]
            qy0j = qy0[j : j + 1, :]
            dqxj = qx1[j : j + 1, :] - qx0j
            dqyj = qy1[j : j + 1, :] - qy0j
            denom = dx * dqyj - dy * dqxj
            live = jnp.abs(denom) > 0
            inv = 1.0 / jnp.where(live, denom, 1.0)
            relx = qx0j - ox
            rely = qy0j - oy
            t = (relx * dqyj - rely * dqxj) * inv
            s = (relx * dy - rely * dx) * inv
            w = jnp.where(live & (s >= 0) & (s < 1), -jnp.sign(denom), 0.0)
            tc = jnp.clip(t, 0.0, 1.0)
            i0 = i0 + w * (1.0 - tc)
            i1 = i1 + w * (1.0 - tc * tc)
    i0 = jnp.clip(0.5 * i0, 0.0, 1.0)
    i1 = jnp.clip(0.25 * i1, 0.0, 0.5)
    return i0, i1


def _side_sums(p_rows, q_rows, want_inside, eps, vq):
    """Green's-theorem sums over P's boundary: (area, mx, my, chx, chy),
    each ``[1, B]``."""
    px0, py0, px1, py1 = p_rows
    dx = px1 - px0
    dy = py1 - py0
    i0, i1 = _indicator_integrals(px0, py0, dx, dy, eps, q_rows, vq)
    if not want_inside:
        i0 = 1.0 - i0
        i1 = 0.5 - i1
    c = px0 * dy - py0 * dx
    area = 0.5 * jnp.sum(c * i0, axis=0, keepdims=True)
    mx = jnp.sum(c * (px0 * i0 + dx * i1), axis=0, keepdims=True) / 3.0
    my = jnp.sum(c * (py0 * i0 + dy * i1), axis=0, keepdims=True) / 3.0
    chx = jnp.sum(dx * i0, axis=0, keepdims=True)
    chy = jnp.sum(dy * i0, axis=0, keepdims=True)
    return area, mx, my, chx, chy


def _n_cross(p_rows, q_rows, vq):
    """Un-nudged proper crossing count, ``[1, B]`` float32."""
    px0, py0, px1, py1 = p_rows
    qx0, qy0, qx1, qy1 = q_rows
    dx = px1 - px0
    dy = py1 - py0
    ncr = jnp.zeros_like(px0[:1, :])
    for j in range(vq):
        qx0j = qx0[j : j + 1, :]
        qy0j = qy0[j : j + 1, :]
        dqxj = qx1[j : j + 1, :] - qx0j
        dqyj = qy1[j : j + 1, :] - qy0j
        denom = dx * dqyj - dy * dqxj
        live = jnp.abs(denom) > 0
        inv = 1.0 / jnp.where(live, denom, 1.0)
        relx = qx0j - px0
        rely = qy0j - py0
        t = (relx * dqyj - rely * dqxj) * inv
        s = (relx * dy - rely * dx) * inv
        valid = live & (t >= 0) & (t < 1) & (s >= 0) & (s < 1)
        ncr = ncr + jnp.sum(
            valid.astype(px0.dtype), axis=0, keepdims=True
        )
    return ncr


def _clip_kernel(px0r, py0r, px1r, py1r, qx0r, qy0r, qx1r, qy1r, epsr, outr,
                 *, difference: bool, vp: int, vq: int):
    p_rows = (px0r[:], py0r[:], px1r[:], py1r[:])
    q_rows = (qx0r[:], qy0r[:], qx1r[:], qy1r[:])
    eps = epsr[:]                                    # [1, B]

    a_p, mx_p, my_p, chx, chy = _side_sums(
        p_rows, q_rows, not difference, eps, vq)
    a_q, mx_q, my_q, _, _ = _side_sums(q_rows, p_rows, True, eps, vp)
    ncr = _n_cross(p_rows, q_rows, vq)

    sgn = -1.0 if difference else 1.0
    area = a_p + sgn * a_q
    mx = mx_p + sgn * mx_q
    my = my_p + sgn * my_q
    zero = jnp.zeros_like(area)
    outr[:] = jnp.concatenate(
        [area, mx, my, chx, chy, ncr, zero, zero], axis=0)


def _planes(p: jnp.ndarray):
    """[B, V, 2] -> batch-minor coordinate planes ([V, B] x4), f32."""
    p = p.astype(jnp.float32)
    p1 = jnp.roll(p, -1, axis=1)
    return (p[:, :, 0].T, p[:, :, 1].T, p1[:, :, 0].T, p1[:, :, 1].T)


@functools.partial(
    jax.jit, static_argnames=("difference", "block", "interpret")
)
def _clip_pallas(p: jnp.ndarray, q: jnp.ndarray, difference: bool,
                 block: int = 256, interpret: bool = False) -> OverlapStats:
    """p: [B, Vp, 2], q: [B, Vq, 2] -> OverlapStats [B] (float32)."""
    b, vp = p.shape[0], p.shape[1]
    vq = q.shape[1]
    eps = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(p), axis=(1, 2)),
                    jnp.max(jnp.abs(q), axis=(1, 2))), 1.0
    ).astype(jnp.float32) * jnp.float32(jnp.finfo(jnp.float32).eps) ** (
        2.0 / 3.0
    )

    b_pad = -(-b // block) * block
    if b_pad != b:
        p = jnp.pad(p, ((0, b_pad - b), (0, 0), (0, 0)))
        q = jnp.pad(q, ((0, b_pad - b), (0, 0), (0, 0)))
        eps = jnp.pad(eps, (0, b_pad - b), constant_values=1.0)

    planes = _planes(p) + _planes(q) + (eps[None, :],)

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_clip_kernel, difference=difference, vp=vp, vq=vq),
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, b_pad), jnp.float32),
        grid=(b_pad // block,),
        in_specs=[spec(vp)] * 4 + [spec(vq)] * 4 + [spec(1)],
        out_specs=spec(_OUT_ROWS),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b_pad * (vp * vq * 90 + vq * vp * 90),
            bytes_accessed=(4 * b_pad * (vp + vq) * 2 + b_pad * _OUT_ROWS) * 4,
            transcendentals=0,
        ),
    )(*planes)

    out = out[:, :b]
    area = out[0]
    safe_area = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    ok = jnp.abs(area) > 1e-9
    centroid = jnp.stack(
        [jnp.where(ok, out[1] / safe_area, 0.0),
         jnp.where(ok, out[2] / safe_area, 0.0)], axis=-1)
    chord = jnp.stack([out[3], out[4]], axis=-1)
    return OverlapStats(area=area, centroid=centroid, chord_p=chord,
                        n_cross=out[5].astype(jnp.int32))


def overlap_stats_pallas(p, q, block: int = 256,
                         interpret: bool = False) -> OverlapStats:
    """Pallas-fused P ∩ Q statistics for ``[B, V, 2]`` pairs (float32)."""
    return _clip_pallas(p, q, difference=False, block=block,
                        interpret=interpret)


def difference_stats_pallas(p, q, block: int = 256,
                            interpret: bool = False) -> OverlapStats:
    """Pallas-fused P \\ Q statistics for ``[B, V, 2]`` pairs (float32)."""
    return _clip_pallas(p, q, difference=True, block=block,
                        interpret=interpret)

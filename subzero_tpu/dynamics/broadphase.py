"""Broad-phase contact detection: bounding-circle candidate pairs.

The reference does an O(N^2) double loop over floes with the test
``dist(centroids) < rmax_i + rmax_j`` (``floe_interactions_all.m:101-119``)
and stores per-floe ``potentialInteractions`` lists.  Here the same test runs
as one dense masked [N, N] tensor op followed by a top-K extraction into a
fixed-degree neighbor table [N, K] — static shapes for XLA, overflow
detected and reported.

Periodicity is handled by the minimum-image convention instead of ghost-floe
copies (``floe_interactions_all.m:18-66``): each candidate pair carries the
periodic image shift that brings floe j closest to floe i.  Forces/torques
computed against the shifted image are exactly the forces the reference
accumulates onto the ghost's parent (``floe_interactions_all.m:242-246``).
This requires rmax < L/2, which holds for all reference configurations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NeighborTable(NamedTuple):
    """Fixed-degree candidate table.

    idx      [N, K] neighbor slot index (self-index where invalid)
    valid    [N, K] candidate mask
    shift    [N, K, 2] periodic image shift to apply to neighbor j's position
    overflow []     true if any floe had more than K candidates
    """

    idx: jnp.ndarray
    valid: jnp.ndarray
    shift: jnp.ndarray
    overflow: jnp.ndarray


def neighbor_candidates(
    x: jnp.ndarray,
    y: jnp.ndarray,
    rmax: jnp.ndarray,
    alive: jnp.ndarray,
    k_max: int,
    periodic: bool,
    lx: float,
    ly: float,
    src: tuple | None = None,
) -> NeighborTable:
    """Bounding-circle broad phase -> top-K neighbor table.

    Mirrors the criterion at floe_interactions_all.m:103.  Candidates are
    symmetric: j in nbrs(i) iff i in nbrs(j), so the narrow phase computes
    each pair twice (once per endpoint) and no scatter/symmetrization pass is
    needed.

    ``src``: optional (x_s, y_s, r_s, alive_s, n_self) candidate-source
    arrays for the spatial-decomposition path, where the query set occupies
    the first ``n_self`` source slots (self-pairs are excluded there).
    Returned indices then refer to the source arrays.
    """
    n = x.shape[0]
    if src is None:
        x_s, y_s, r_s, alive_s, n_self = x, y, rmax, alive, n
    else:
        x_s, y_s, r_s, alive_s, n_self = src
    m = x_s.shape[0]
    dx = x[:, None] - x_s[None, :]
    dy = y[:, None] - y_s[None, :]
    if periodic:
        # Minimum image on the [-lx,lx] x [-ly,ly] torus (period 2L).
        sx = -2.0 * lx * jnp.round(dx / (2.0 * lx))
        sy = -2.0 * ly * jnp.round(dy / (2.0 * ly))
        dx = dx + sx
        dy = dy + sy
    else:
        sx = jnp.zeros_like(dx)
        sy = jnp.zeros_like(dy)

    r2 = dx * dx + dy * dy
    rsum = rmax[:, None] + r_s[None, :]
    ok = (r2 < rsum * rsum) & alive[:, None] & alive_s[None, :]
    self_pair = (
        jnp.arange(n)[:, None] == jnp.arange(m)[None, :]
    ) & (jnp.arange(m)[None, :] < n_self)
    ok = ok & ~self_pair

    # Top-K by a key that puts valid candidates first (closest first).
    key = jnp.where(ok, -r2, -jnp.inf)
    _, idx = jax.lax.top_k(key, k_max)                   # [N, K]
    valid = jnp.take_along_axis(ok, idx, axis=1)
    n_cand = jnp.sum(ok, axis=1)
    overflow = jnp.any(n_cand > k_max)

    shift = jnp.stack(
        [
            jnp.take_along_axis(sx, idx, axis=1),
            jnp.take_along_axis(sy, idx, axis=1),
        ],
        axis=-1,
    )
    # sx was added to (x_i - x_j), so the nearest image of j sits at
    # x_j - sx: the shift to ADD to j's position is -sx.
    shift = -shift
    idx = jnp.where(valid, idx, jnp.arange(n)[:, None])
    return NeighborTable(idx=idx, valid=valid, shift=shift, overflow=overflow)

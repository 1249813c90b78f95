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


def _top_k_argmax(key: jnp.ndarray, k_max: int):
    """Top-K extraction by K masked argmax passes.

    ``jax.lax.top_k`` lowers to a full per-row sort on TPU — on a [N, N]
    candidate matrix that sort dominated the whole physics step (measured
    12.8 ms of a 13.3 ms step at N=4096 on v5e).  K argmax passes are pure
    VPU reductions: ~0.06 ms for the same extraction.  Rows come out in the
    same descending-key order top_k produced.

    Returns (idx [N, K] int32, valid [N, K] key > -inf).
    """
    neg = jnp.array(-jnp.inf, key.dtype)
    col = jnp.arange(key.shape[1], dtype=jnp.int32)[None, :]
    idxs, vals = [], []
    for _ in range(k_max):
        j = jnp.argmax(key, axis=1).astype(jnp.int32)
        vals.append(jnp.max(key, axis=1) > neg)
        idxs.append(j)
        key = jnp.where(col == j[:, None], neg, key)
    return jnp.stack(idxs, axis=1), jnp.stack(vals, axis=1)


class NeighborTable(NamedTuple):
    """Fixed-degree candidate table.

    idx      [N, K] neighbor slot index (self-index where invalid)
    valid    [N, K] candidate mask
    shift    [N, K, 2] periodic image shift to apply to neighbor j's position
    overflow []     true if any floe had more than K candidates
    demand   []     max candidates of any row BEFORE the top-K clamp — the
                    true K requirement, consumed by the driver's two-way
                    pool auto-sizing (Simulation._grow_pools)
    """

    idx: jnp.ndarray
    valid: jnp.ndarray
    shift: jnp.ndarray
    overflow: jnp.ndarray
    demand: jnp.ndarray


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
    n_skip_rows: int = 0,
) -> NeighborTable:
    """Bounding-circle broad phase -> top-K neighbor table.

    ``n_skip_rows``: rows [0, n_skip_rows) (immovable boundary/topography
    floes, state.py slot convention) get NO candidate rows: their contact
    forces are never integrated, and their rows otherwise dominate the K
    requirement — a topography floe's bounding circle covers half the
    domain, so its row alone ratcheted max_neighbors to ~13x the floe-side
    demand in the Nares campaign.  Floe-vs-boundary pairs still appear in
    the (moving) floe's own row.

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
        dx = dx - 2.0 * lx * jnp.round(dx / (2.0 * lx))
        dy = dy - 2.0 * ly * jnp.round(dy / (2.0 * ly))

    r2 = dx * dx + dy * dy
    rsum = rmax[:, None] + r_s[None, :]
    ok = (r2 < rsum * rsum) & alive[:, None] & alive_s[None, :]
    self_pair = (
        jnp.arange(n)[:, None] == jnp.arange(m)[None, :]
    ) & (jnp.arange(m)[None, :] < n_self)
    ok = ok & ~self_pair
    if n_skip_rows:
        ok = ok & (jnp.arange(n) >= n_skip_rows)[:, None]

    # Top-K by a key that puts valid candidates first (closest first).
    key = jnp.where(ok, -r2, -jnp.inf)
    idx, valid = _top_k_argmax(key, k_max)               # [N, K]
    row_counts = jnp.sum(ok.astype(jnp.int32), axis=1)
    demand = jnp.max(row_counts)
    overflow = demand > k_max
    # invalid slots: point at self (a degenerate identical-polygon pair has
    # collinear edges only — zero crossings, so it can never inflate the
    # per-region pool demand), not at whatever argmax left behind
    idx = jnp.where(valid, idx,
                    jnp.minimum(jnp.arange(n), m - 1)[:, None])

    # Periodic image shift of each selected neighbor, recomputed on the
    # gathered [N, K] pairs (never materialize a [N, N] shift matrix): the
    # nearest image of j sits at x_j + shift.
    if periodic:
        shx = 2.0 * lx * jnp.round((x[:, None] - x_s[idx]) / (2.0 * lx))
        shy = 2.0 * ly * jnp.round((y[:, None] - y_s[idx]) / (2.0 * ly))
    else:
        shx = jnp.zeros(idx.shape, x.dtype)
        shy = jnp.zeros(idx.shape, x.dtype)
    shift = jnp.stack([shx, shy], axis=-1)
    idx = jnp.where(valid, idx, jnp.arange(n, dtype=jnp.int32)[:, None])
    return NeighborTable(idx=idx, valid=valid, shift=shift,
                         overflow=overflow, demand=demand)


def neighbor_candidates_cells(
    x: jnp.ndarray,
    y: jnp.ndarray,
    rmax: jnp.ndarray,
    alive: jnp.ndarray,
    k_max: int,
    periodic: bool,
    lx: float,
    ly: float,
    cell_size: float,
    cell_cap: int,
    n_skip_rows: int = 0,
) -> NeighborTable:
    """Cell-list broad phase: O(N * 9 * cell_cap) instead of O(N^2).

    Same output contract as ``neighbor_candidates`` (SURVEY.md section 7,
    design delta #5).  ``cell_size`` must be >= 2 * max(rmax) so all
    bounding-circle candidates lie in the 3x3 cell neighborhood;
    ``cell_cap`` bounds floes per cell (overflow reported).
    """
    n = x.shape[0]
    # integer cell grid covering [-lx, lx] x [-ly, ly]
    ncx = max(int(2 * lx / cell_size), 1)
    ncy = max(int(2 * ly / cell_size), 1)
    csx = 2 * lx / ncx
    csy = 2 * ly / ncy
    ix = jnp.clip(((x + lx) / csx).astype(jnp.int32), 0, ncx - 1)
    iy = jnp.clip(((y + ly) / csy).astype(jnp.int32), 0, ncy - 1)
    cid = iy * ncx + ix
    # dead floes go to a sentinel cell
    cid = jnp.where(alive, cid, ncx * ncy)

    order = jnp.argsort(cid)
    cid_sorted = cid[order]

    # per-cell occupancy overflow check
    counts = jnp.zeros((ncx * ncy + 1,), jnp.int32).at[cid].add(1)
    overflow_cells = jnp.any(counts[:-1] > cell_cap)

    # 3x3 neighborhood (wrapped when periodic, clamped otherwise)
    offs = jnp.array([(dx_, dy_) for dy_ in (-1, 0, 1) for dx_ in (-1, 0, 1)],
                     dtype=jnp.int32)                       # [9, 2]
    nx_ = ix[:, None] + offs[None, :, 0]                    # [N, 9]
    ny_ = iy[:, None] + offs[None, :, 1]
    if periodic:
        nx_ = jnp.mod(nx_, ncx)
        ny_ = jnp.mod(ny_, ncy)
        cell_ok = jnp.ones_like(nx_, dtype=bool)
    else:
        cell_ok = (nx_ >= 0) & (nx_ < ncx) & (ny_ >= 0) & (ny_ < ncy)
        nx_ = jnp.clip(nx_, 0, ncx - 1)
        ny_ = jnp.clip(ny_, 0, ncy - 1)
    ncell = ny_ * ncx + nx_                                 # [N, 9]

    start = jnp.searchsorted(cid_sorted, ncell.reshape(-1))  # [N*9]
    slots = start[:, None] + jnp.arange(cell_cap)[None, :]   # [N*9, cap]
    slots = jnp.clip(slots, 0, n - 1)
    slot_cid = cid_sorted[slots]
    cand = order[slots].reshape(n, 9 * cell_cap)
    cand_ok = (slot_cid == ncell.reshape(-1)[:, None]).reshape(
        n, 9 * cell_cap) & cell_ok[:, :, None].repeat(cell_cap, 2).reshape(
        n, 9 * cell_cap)

    # circle test on the gathered candidates
    dx = x[:, None] - x[cand]
    dy = y[:, None] - y[cand]
    if periodic:
        sx = -2.0 * lx * jnp.round(dx / (2.0 * lx))
        sy = -2.0 * ly * jnp.round(dy / (2.0 * ly))
        dx = dx + sx
        dy = dy + sy
    else:
        sx = jnp.zeros_like(dx)
        sy = jnp.zeros_like(dy)
    r2 = dx * dx + dy * dy
    rsum = rmax[:, None] + rmax[cand]
    ok = (cand_ok & (r2 < rsum * rsum) & alive[:, None] & alive[cand]
          & (cand != jnp.arange(n)[:, None]))
    if n_skip_rows:
        ok = ok & (jnp.arange(n) >= n_skip_rows)[:, None]

    key = jnp.where(ok, -r2, -jnp.inf)
    kidx, valid = _top_k_argmax(key, k_max)                 # [N, K]
    demand = jnp.max(jnp.sum(ok.astype(jnp.int32), axis=1))
    overflow = overflow_cells | (demand > k_max)
    idx = jnp.take_along_axis(cand, kidx, axis=1)
    shift = jnp.stack([
        -jnp.take_along_axis(sx, kidx, axis=1),
        -jnp.take_along_axis(sy, kidx, axis=1),
    ], axis=-1)
    idx = jnp.where(valid, idx, jnp.arange(n)[:, None])
    return NeighborTable(idx=idx, valid=valid, shift=shift,
                         overflow=overflow, demand=demand)

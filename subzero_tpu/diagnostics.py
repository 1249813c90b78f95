"""Eulerian coarse-graining and scalar diagnostics.

Batched equivalent of ``calc_eulerian_data.m``: mass-weighted averages of
floe fields over an Ny x Nx cell grid using exact polygon-cell intersection
areas, plus the collision counter (``calc_collisionNum.m``) and total-mass
series (``Subzero.m:294-295``).

Design deltas (documented for parity review):
* Cell overlap areas come from the boundary-integral kernel
  (geometry/clip.py) over all (floe, candidate-cell) pairs at once instead
  of polyshape intersect in a double loop (calc_eulerian_data.m:138-187).
* Boundary floes are excluded from the averages; the reference additionally
  subtracts their union from each cell box before intersecting
  (calc_eulerian_data.m:144-149) — a second-order correction applied here by
  subtracting the boundary floes' own cell-overlap areas from the cell area.
* Periodic ghost contributions are folded in by evaluating each floe at its
  minimum-image positions relative to the cell center.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig
from .geometry.clip import _overlap_one
from .state import FloeState


class EulerianData(NamedTuple):
    """Coarse fields, all [Ny, Nx] (calc_eulerian_data.m:83-100)."""

    u: jnp.ndarray
    v: jnp.ndarray
    du: jnp.ndarray
    dv: jnp.ndarray
    h: jnp.ndarray
    c: jnp.ndarray          # concentration (area fraction)
    mtot: jnp.ndarray
    area: jnp.ndarray
    over: jnp.ndarray       # mean per-floe overlap area
    stress: jnp.ndarray     # [Ny, Nx, 3] (xx, yy, xy)
    strain: jnp.ndarray     # [Ny, Nx, 3]
    stress_max_eig: jnp.ndarray


def cell_grid(cfg: SimConfig, nx: int, ny: int):
    """Cell rectangles [ny*nx, 4, 2] (CCW) + centers + cell area.

    Row 0 is the NORTH row (the reference flips y, calc_eulerian_data.m:74).
    """
    lx, ly = cfg.domain.lx, cfg.domain.ly
    xe = np.linspace(-lx, lx, nx + 1)
    ye = np.linspace(ly, -ly, ny + 1)  # flipped: row 0 = north
    cells = np.zeros((ny * nx, 4, 2))
    centers = np.zeros((ny * nx, 2))
    for j in range(ny):
        for i in range(nx):
            x0, x1 = xe[i], xe[i + 1]
            y1, y0 = ye[j], ye[j + 1]   # y0 < y1
            cells[j * nx + i] = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
            centers[j * nx + i] = [(x0 + x1) / 2, (y0 + y1) / 2]
    cell_area = (2 * lx / nx) * (2 * ly / ny)
    return jnp.asarray(cells), jnp.asarray(centers), cell_area


def _cell_block_areas(state: FloeState, verts, pos, cells, centers,
                      cfg: SimConfig):
    """Exact intersection area of every floe with a BLOCK of cells,
    [N, Cb].

    Broad-phased by bounding circles (calc_eulerian_data.m:127-133); under
    periodicity each floe is evaluated at its minimum image w.r.t. the cell
    center.
    """
    dxy = centers[None, :, :] - pos[:, None, :]    # [N, Cb, 2]
    if cfg.processes.periodic:
        ll = jnp.asarray([cfg.domain.lx, cfg.domain.ly], pos.dtype)
        shift = 2.0 * ll * jnp.round(dxy / (2.0 * ll))
    else:
        shift = jnp.zeros_like(dxy)
    eff_pos = pos[:, None, :] + shift              # [N, Cb, 2]

    r_cell = jnp.sqrt(jnp.sum((cells[:, 2] - cells[:, 0]) ** 2, axis=-1)) / 2
    d2 = jnp.sum((eff_pos - centers[None]) ** 2, axis=-1)
    near = d2 < (state.rmax[:, None] + r_cell[None, :]) ** 2
    near = near & state.alive[:, None]

    world = verts[:, None, :, :] + eff_pos[:, :, None, :]   # [N, Cb, V, 2]

    def one(floe_world, cell):
        return jnp.maximum(_overlap_one(floe_world, cell).area, 0.0)

    areas = jax.vmap(jax.vmap(one, in_axes=(0, 0)),
                     in_axes=(0, None))(world, cells)
    return jnp.where(near, areas, 0.0)


def _cell_block_size(n: int, v: int, c: int) -> int:
    """Cells per block so the [N, Cb, V, 2] clip buffer stays ~64 MB f32:
    at 10k floes x 40x40 cells the unblocked buffer is multi-GB
    (round-2 VERDICT weak #8)."""
    cb = max(1, (1 << 23) // max(n * v, 1))
    return min(c, cb)


def _eulerian_sums_scatter(state: FloeState, cfg: SimConfig, nx: int,
                           ny: int, wx: int, wy: int, fields, m_over_a,
                           is_b):
    """Per-cell sums via floe->cell scatter: each floe clips only against
    the wx x wy window of cells its bounding circle can touch, instead of
    the dense [N, C] product — O(N * w^2) clips, the production path at
    10k floes x 40x40+ grids.  Requires a concrete (host-chosen) window.

    Returns [C, F+4]: weighted field sums, atot, a_bound, n_contrib,
    overlap_sum — identical to the dense/blocked reduction.
    """
    lx, ly = cfg.domain.lx, cfg.domain.ly
    dxc = 2 * lx / nx
    dyc = 2 * ly / ny
    n = state.n
    dtype = state.x.dtype
    verts = state.verts_rot()                       # [N, V, 2] local
    pos = jnp.stack([state.x, state.y], axis=-1)

    # home cell (row 0 = north)
    ic = jnp.floor((state.x + lx) / dxc).astype(jnp.int32)
    jc = jnp.floor((ly - state.y) / dyc).astype(jnp.int32)
    di = jnp.arange(wx, dtype=jnp.int32) - wx // 2
    dj = jnp.arange(wy, dtype=jnp.int32) - wy // 2
    ix = ic[:, None, None] + di[None, None, :]       # [N, 1, wx]
    iy = jc[:, None, None] + dj[None, :, None]       # [N, wy, 1]
    ix = jnp.broadcast_to(ix, (n, wy, wx)).reshape(n, wy * wx)
    iy = jnp.broadcast_to(iy, (n, wy, wx)).reshape(n, wy * wx)

    if cfg.processes.periodic:
        valid = jnp.broadcast_to(state.alive[:, None], ix.shape)
    else:
        valid = (state.alive[:, None] & (ix >= 0) & (ix < nx)
                 & (iy >= 0) & (iy < ny))

    # cell rectangle at the UNWRAPPED index, in the floe-local frame (this
    # makes the periodic minimum image automatic: the floe sees the tiling)
    x0 = -lx + ix.astype(dtype) * dxc - state.x[:, None]
    y1 = ly - iy.astype(dtype) * dyc - state.y[:, None]
    y0 = y1 - dyc
    zeros = jnp.zeros_like(x0)
    rect = jnp.stack([
        jnp.stack([x0, y0], -1), jnp.stack([x0 + dxc, y0], -1),
        jnp.stack([x0 + dxc, y1], -1), jnp.stack([x0, y1], -1),
    ], axis=-2)                                      # [N, K, 4, 2]

    def one(floe_local, cell):
        return jnp.maximum(_overlap_one(floe_local, cell).area, 0.0)

    areas = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(verts, rect)
    areas = jnp.where(valid, areas, 0.0)             # [N, K]

    a_floe = jnp.where(is_b[:, None], 0.0, areas)
    a_bound = jnp.where(is_b[:, None], areas, 0.0)
    w = a_floe * m_over_a[:, None]
    contrib = (a_floe > 0).astype(dtype)
    over = contrib * state.overlap_area[:, None]

    flat = ((iy % ny) * nx + (ix % nx)).reshape(-1)   # [N*K]
    n_f = fields.shape[1]
    # [N, K, F+4] contributions -> scatter-add into [C, F+4]
    contribs = jnp.concatenate([
        w[:, :, None] * fields[:, None, :],
        a_floe[:, :, None], a_bound[:, :, None],
        contrib[:, :, None], over[:, :, None],
    ], axis=2).reshape(-1, n_f + 4)
    out = jnp.zeros((ny * nx, n_f + 4), dtype).at[flat].add(contribs)
    return out


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _eulerian_scatter_jit(state, cfg, nx, ny, wx, wy, fields, m_over_a,
                          is_b):
    return _eulerian_sums_scatter(state, cfg, nx, ny, wx, wy, fields,
                                  m_over_a, is_b)


def coverage_fraction(state: FloeState, cfg: SimConfig, nx: int, ny: int
                      ) -> np.ndarray:
    """Ice coverage (ALL floes incl. topography) / cell area, [ny, nx] with
    row 0 = north — the packing concentration of create_new_ice.m:109-125,
    computed with the device scatter kernel instead of per-(cell, floe)
    native boolean calls (round-3 host-lifecycle scaling).
    """
    n = state.n
    dtype = state.x.dtype
    fields = jnp.ones((n, 1), dtype)
    m_over_a = jnp.zeros((n,), dtype)
    is_b = jnp.zeros((n,), bool)      # count topography as coverage
    alive_np = np.asarray(state.alive)
    rmax_np = np.asarray(state.rmax)[alive_np]
    r_big = float(rmax_np.max()) if rmax_np.size else 0.0
    hx = int(np.ceil(r_big / (2 * cfg.domain.lx / nx))) + 1
    hy = int(np.ceil(r_big / (2 * cfg.domain.ly / ny))) + 1
    wx = min(2 * hx + 1, nx if cfg.processes.periodic else 2 * nx)
    wy = min(2 * hy + 1, ny if cfg.processes.periodic else 2 * ny)
    out = _eulerian_scatter_jit(state, cfg, nx, ny, wx, wy, fields,
                                m_over_a, is_b)
    cell_area = (2 * cfg.domain.lx / nx) * (2 * cfg.domain.ly / ny)
    atot = np.asarray(out[:, 1]).reshape(ny, nx)
    return atot / cell_area


def _boundary_union_cell_areas(state: FloeState, cfg: SimConfig, cells,
                               n_b: int) -> jnp.ndarray:
    """Exact area of (union of boundary floes) ∩ cell, [C], host-side
    (calc_eulerian_data.m:144-149)."""
    from .native import poly_area, poly_boolean, union_all

    nv = np.asarray(state.nv)[:n_b]
    verts = np.asarray(state.verts_world())[:n_b]
    alive = np.asarray(state.alive)[:n_b]
    polys = [verts[i, : nv[i]].astype(np.float64)
             for i in range(n_b) if alive[i] and nv[i] >= 3]
    cells_np = np.asarray(cells)
    out = np.zeros(cells_np.shape[0])
    if polys:
        uni = union_all(polys)
        for c in range(cells_np.shape[0]):
            for contour in uni:
                inter = poly_boolean(contour, cells_np[c], "int")
                out[c] += sum(poly_area(r) for r in inter)
    return jnp.asarray(out, state.x.dtype)


def eulerian_data(state: FloeState, cfg: SimConfig, nx: int = 10,
                  ny: int = 10) -> EulerianData:
    """Mass-weighted coarse averages (calc_eulerian_data.m:136-187).

    Scales to 10k+ floes x 40x40+ cells: cells are processed in fixed-size
    blocks (``lax.map``), and all per-cell sums reduce inside the block as
    ONE [Cb, N] x [N, F] matmul — the [N, C] floe-cell matrix is never
    materialized and the reduction rides the MXU.
    """
    cells, centers, cell_area = cell_grid(cfg, nx, ny)
    c = cells.shape[0]
    n = state.n
    n_b = cfg.n_boundary
    is_b = jnp.arange(n) < n_b
    verts = state.verts_rot()                      # [N, V, 2] about centroid
    pos = jnp.stack([state.x, state.y], axis=-1)   # [N, 2]
    dtype = pos.dtype

    # per-floe field matrix [N, F]: 1 (-> mtot), u, v, du, dv, h,
    # stress(3), strain(3)
    fields = jnp.stack([
        jnp.ones((n,), dtype), state.u, state.v, state.du_p, state.dv_p,
        state.h, state.stress[:, 0], state.stress[:, 1], state.stress[:, 2],
        state.strain[:, 0], state.strain[:, 1], state.strain[:, 2],
    ], axis=1)
    n_f = fields.shape[1]
    m_over_a = jnp.where(is_b, 0.0, state.mass / jnp.maximum(state.area,
                                                             1e-30))
    overlap = state.overlap_area

    concrete = not isinstance(state.x, jax.core.Tracer)
    if concrete:
        # Host-cadence call: size the scatter window from the live rmax and
        # clip each floe only against its own cells — O(N w^2) not O(N C).
        alive_np = np.asarray(state.alive)
        rmax_np = np.asarray(state.rmax)[alive_np]
        r_big = float(rmax_np.max()) if rmax_np.size else 0.0
        hx = int(np.ceil(r_big / (2 * cfg.domain.lx / nx))) + 1
        hy = int(np.ceil(r_big / (2 * cfg.domain.ly / ny))) + 1
        wx = min(2 * hx + 1, nx if cfg.processes.periodic else 2 * nx)
        wy = min(2 * hy + 1, ny if cfg.processes.periodic else 2 * ny)
        out = _eulerian_scatter_jit(
            state, cfg, nx, ny, wx, wy, fields, m_over_a, is_b)
    else:
        # Traced fallback: dense floe x cell clip in fixed-size cell blocks
        # (the [N, C, V, 2] buffer is never materialized whole).
        cb = _cell_block_size(n, verts.shape[1], c)
        n_blocks = -(-c // cb)
        pad = n_blocks * cb - c
        cells_b = jnp.concatenate(
            [cells, jnp.zeros((pad,) + cells.shape[1:], dtype)]
        ).reshape(n_blocks, cb, 4, 2)
        centers_b = jnp.concatenate(
            [centers, jnp.full((pad, 2), 1e30, dtype)]
        ).reshape(n_blocks, cb, 2)

        def block(args):
            cls, ctr = args
            areas = _cell_block_areas(state, verts, pos, cls, ctr,
                                      cfg)                 # [N, Cb]
            a_floe = jnp.where(is_b[:, None], 0.0, areas)
            a_bound = jnp.where(is_b[:, None], areas, 0.0)
            w = a_floe * m_over_a[:, None]                 # [N, Cb]
            sums = w.T @ fields                            # [Cb, F]  (MXU)
            atot = jnp.sum(a_floe, axis=0)
            ab = jnp.sum(a_bound, axis=0)
            contrib = a_floe > 0
            n_contrib = jnp.sum(contrib.astype(dtype), axis=0)
            over_sum = jnp.sum(jnp.where(contrib, overlap[:, None], 0.0),
                               axis=0)
            return jnp.concatenate(
                [sums, atot[:, None], ab[:, None], n_contrib[:, None],
                 over_sum[:, None]], axis=1)               # [Cb, F+4]

        out = jax.lax.map(block, (cells_b, centers_b))     # [nb, Cb, F+4]
        out = out.reshape(n_blocks * cb, n_f + 4)[:c]
    sums = out[:, :n_f]
    atot = out[:, n_f]
    a_bound_tot = out[:, n_f + 1]
    n_contrib = jnp.maximum(out[:, n_f + 2], 1.0)
    over = out[:, n_f + 3] / n_contrib

    mtot = sums[:, 0]
    denom = jnp.where(mtot > 0, mtot, 1.0)

    # Cell area minus the boundary-floe UNION (calc_eulerian_data.m:144-149
    # subtracts the union polygon).  Boundary floes are static, so the exact
    # union∩cell areas are computed host-side with the native engine; when
    # called under a trace (no concrete values) the per-floe sum is used as
    # the fallback (first-order: double-subtracts boundary overlaps).
    if n_b > 0:
        try:
            b_union = _boundary_union_cell_areas(state, cfg, cells, n_b)
            eff_cell_area = jnp.maximum(cell_area - b_union, 1e-12)
        except jax.errors.TracerArrayConversionError:
            eff_cell_area = jnp.maximum(cell_area - a_bound_tot, 1e-12)
    else:
        eff_cell_area = jnp.asarray(cell_area, dtype)

    def avg(k):
        return sums[:, k] / denom

    sxx, syy, sxy = avg(6), avg(7), avg(8)
    # max eigenvalue of the symmetric 2x2 (calc_eulerian_data.m:180-183)
    tr2 = 0.5 * (sxx + syy)
    disc = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    smax = tr2 + disc
    smax = jnp.where(jnp.abs(smax) > 1e8, 0.0, smax)

    def grid(x):
        return x.reshape(ny, nx)

    return EulerianData(
        u=grid(avg(1)),
        v=grid(avg(2)),
        du=grid(avg(3)),
        dv=grid(avg(4)),
        h=grid(avg(5)),
        c=grid(atot / eff_cell_area),
        mtot=grid(mtot),
        area=grid(atot),
        over=grid(over),
        stress=jnp.stack([grid(sxx), grid(syy), grid(sxy)], axis=-1),
        strain=jnp.stack([grid(avg(9)), grid(avg(10)), grid(avg(11))],
                         axis=-1),
        stress_max_eig=grid(smax),
    )


def total_mass(state: FloeState) -> jnp.ndarray:
    """Total live floe mass (the Mtot series, Subzero.m:294-295)."""
    return jnp.sum(jnp.where(state.alive, state.mass, 0.0))


def dissolved_mass_grid(state: FloeState, killed: jnp.ndarray,
                        cfg: SimConfig, nx: int = 10, ny: int = 10):
    """Bin the mass of killed floes into the coarse grid
    (calc_dissolved_mass.m:10-24: entire floe mass assigned to the cell
    containing its centroid)."""
    lx, ly = cfg.domain.lx, cfg.domain.ly
    ix = jnp.clip(((state.x + lx) / (2 * lx / nx)).astype(jnp.int32), 0, nx - 1)
    # row 0 = north (flipped y)
    iy = jnp.clip(((ly - state.y) / (2 * ly / ny)).astype(jnp.int32), 0, ny - 1)
    flat = iy * nx + ix
    contrib = jnp.where(killed, state.mass, 0.0)
    grid = jnp.zeros((ny * nx,), state.mass.dtype).at[flat].add(contrib)
    return grid.reshape(ny, nx)

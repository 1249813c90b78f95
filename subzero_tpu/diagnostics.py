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


def _floe_cell_areas(state: FloeState, cells, centers, cfg: SimConfig):
    """Exact intersection area of every floe with every cell, [N, C].

    Broad-phased by bounding circles (calc_eulerian_data.m:127-133); under
    periodicity each floe is evaluated at its minimum image w.r.t. the cell
    center.
    """
    n = state.n
    c = cells.shape[0]
    verts = state.verts_rot()                      # [N, V, 2] about centroid
    pos = jnp.stack([state.x, state.y], axis=-1)   # [N, 2]

    dxy = centers[None, :, :] - pos[:, None, :]    # [N, C, 2]
    if cfg.processes.periodic:
        ll = jnp.asarray([cfg.domain.lx, cfg.domain.ly], pos.dtype)
        shift = 2.0 * ll * jnp.round(dxy / (2.0 * ll))
    else:
        shift = jnp.zeros_like(dxy)
    eff_pos = pos[:, None, :] + shift              # [N, C, 2]

    r_cell = jnp.sqrt(jnp.sum((cells[:, 2] - cells[:, 0]) ** 2, axis=-1)) / 2
    d2 = jnp.sum((eff_pos - centers[None]) ** 2, axis=-1)
    near = d2 < (state.rmax[:, None] + r_cell[None, :]) ** 2
    near = near & state.alive[:, None]

    world = verts[:, None, :, :] + eff_pos[:, :, None, :]   # [N, C, V, 2]

    def one(floe_world, cell):
        return jnp.maximum(_overlap_one(floe_world, cell).area, 0.0)

    areas = jax.vmap(jax.vmap(one, in_axes=(0, 0)),
                     in_axes=(0, None))(world, cells)
    return jnp.where(near, areas, 0.0)


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
    """Mass-weighted coarse averages (calc_eulerian_data.m:136-187)."""
    cells, centers, cell_area = cell_grid(cfg, nx, ny)
    areas = _floe_cell_areas(state, cells, centers, cfg)   # [N, C]

    n_b = cfg.n_boundary
    is_b = jnp.arange(state.n) < n_b
    a_floe = jnp.where(is_b[:, None], 0.0, areas)
    a_bound = jnp.where(is_b[:, None], areas, 0.0)

    # weight = mass * Aover / A (mass of floe portion in the cell)
    w = a_floe * (state.mass / state.area)[:, None]         # [N, C]
    mtot = jnp.sum(w, axis=0)                               # [C]
    atot = jnp.sum(a_floe, axis=0)
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
            eff_cell_area = jnp.maximum(
                cell_area - jnp.sum(a_bound, axis=0), 1e-12)
    else:
        eff_cell_area = jnp.asarray(cell_area, areas.dtype)

    def avg(field):
        return jnp.sum(w * field[:, None], axis=0) / denom

    contrib = a_floe > 0
    n_contrib = jnp.maximum(jnp.sum(contrib, axis=0), 1)
    over = jnp.sum(jnp.where(contrib, state.overlap_area[:, None], 0.0),
                   axis=0) / n_contrib

    sxx = avg(state.stress[:, 0])
    syy = avg(state.stress[:, 1])
    sxy = avg(state.stress[:, 2])
    # max eigenvalue of the symmetric 2x2 (calc_eulerian_data.m:180-183)
    tr2 = 0.5 * (sxx + syy)
    disc = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    smax = tr2 + disc
    smax = jnp.where(jnp.abs(smax) > 1e8, 0.0, smax)

    def grid(x):
        return x.reshape(ny, nx)

    return EulerianData(
        u=grid(avg(state.u)),
        v=grid(avg(state.v)),
        du=grid(avg(state.du_p)),
        dv=grid(avg(state.dv_p)),
        h=grid(avg(state.h)),
        c=grid(atot / eff_cell_area),
        mtot=grid(mtot),
        area=grid(atot),
        over=grid(over),
        stress=jnp.stack([grid(sxx), grid(syy), grid(sxy)], axis=-1),
        strain=jnp.stack(
            [grid(avg(state.strain[:, 0])), grid(avg(state.strain[:, 1])),
             grid(avg(state.strain[:, 2]))], axis=-1),
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

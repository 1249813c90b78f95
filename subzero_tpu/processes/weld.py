"""Welding — equivalent of ``Physical_Processes/weld.m``.

In freezing conditions, overlapping floes weld (fuse) with probability
``Fweld * A_overlap / area > rand`` (weld.m:104-116), evaluated within
spatial bins at pyramid scales (3x3 every 25 steps with max-area Amax/3,
2x2 every 500 with Amax/2, 1x1 every 5000 — Subzero.m:317-330).  The welded
union also absorbs any neighbor covered >40% by it (weld.m:134-152).  Unions
must stay below 1/5 of the total ice area and above 2e4 m^2 (weld.m:118).
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..native import poly_boolean, poly_area
from .host import HostView, StateEdit
from .fuse import fuse_floes


def weld_pass(
    view: HostView,
    cfg: SimConfig,
    rng: np.random.Generator,
    nx: int,
    ny: int,
    max_weld_area: float,
) -> StateEdit:
    edit = StateEdit()
    n_b = cfg.n_boundary
    lx, ly = cfg.domain.lx, cfg.domain.ly
    a_total = float(np.sum(view.area[view.alive]))

    live = [i for i in range(n_b, view.n)
            if view.alive[i] and view.polys[i] is not None]
    if not live:
        return edit

    # spatial bins (weld.m:30-48)
    bx = np.clip(((view.x[live] + lx) / (2 * lx / nx)).astype(int), 0, nx - 1)
    by = np.clip(((view.y[live] + ly) / (2 * ly / ny)).astype(int), 0, ny - 1)
    bins: dict[tuple[int, int], list[int]] = {}
    for k, i in enumerate(live):
        bins.setdefault((bx[k], by[k]), []).append(i)

    fused: set[int] = set()
    for members in bins.values():
        for ai, i in enumerate(members):
            if i in fused or not view.alive[i]:
                continue
            if view.area[i] >= max_weld_area:
                continue
            # candidates: later members within bounding circles (weld.m:96-99)
            cands = []
            for j in members[ai + 1:]:
                if j in fused or not view.alive[j]:
                    continue
                if view.area[j] >= max_weld_area:
                    continue
                d2 = (view.x[i] - view.x[j]) ** 2 + (view.y[i] - view.y[j]) ** 2
                r = view.rmax[i] + view.rmax[j]
                if 1.0 < d2 ** 0.5 < r:
                    cands.append(j)
            if not cands:
                continue
            # overlap areas + weld probability (weld.m:102-116)
            best_j = None
            best_p = None
            for j in cands:
                inter = poly_boolean(view.poly(i), view.poly(j), "int")
                a_ov = sum(max(poly_area(c), 0.0) for c in inter)
                if a_ov <= 0:
                    continue
                weldp = cfg.processes.weld_coeff * a_ov / view.area[i]
                if weldp > rng.random():
                    if best_p is None or weldp > best_p:
                        best_p = weldp
                        best_j = j
            if best_j is None:
                continue
            j = best_j
            uni = poly_boolean(view.poly(i), view.poly(j), "uni")
            a_uni = sum(max(poly_area(c), 0.0) for c in uni)
            if not (cfg.processes.fuse_min_area < a_uni < a_total / 5):
                continue

            # chain absorption: neighbors covered >40% by the union
            # (weld.m:134-152)
            absorb = []
            for k in members:
                if k in (i, j) or k in fused or not view.alive[k]:
                    continue
                d2 = (view.x[i] - view.x[k]) ** 2 + (view.y[i] - view.y[k]) ** 2
                if d2 ** 0.5 > view.rmax[i] + view.rmax[j] + view.rmax[k]:
                    continue
                inter = poly_boolean(uni, view.poly(k), "int")
                a_ov = sum(max(poly_area(c), 0.0) for c in inter)
                if a_ov / view.area[k] > 0.4:
                    absorb.append(k)

            sub = fuse_floes(view, i, [j] + absorb, cfg)
            edit.merge(sub)
            fused |= {i, j, *absorb}
    return edit


def weld_schedule(step_idx: int, cfg: SimConfig, amax: float):
    """Which weld scale fires at this step (Subzero.m:317-330)?

    Returns (nx, ny, max_weld_area) or None.  amax = max floe area at t=0.
    """
    p = cfg.processes
    if step_idx % p.n_weld_coarse == 0:
        return 1, 1, amax
    if step_idx % p.n_weld_mid == 0:
        return 2, 2, amax / 2
    if step_idx % p.n_weld == 0:
        return 3, 3, amax / 3
    return None

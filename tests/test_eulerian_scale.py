"""Eulerian coarse-graining at production scale (round-3, VERDICT weak #8).

The reference intersects every floe with every cell via polyshape in a
double loop (calc_eulerian_data.m:138-187); the round-2 port materialized
the whole [N, C, V, 2] clip buffer (multi-GB at 10k floes x 40x40 cells).
Round 3 adds (a) a blocked dense path for traced calls and (b) a
floe->cell scatter path for concrete (output-cadence) calls that clips
each floe only against its own window of cells.  These tests pin their
equality and that 10k x 40x40 runs in seconds without OOM.
"""

import time

import jax
import numpy as np
import pytest

from subzero_tpu.config import (
    CapacityConfig, DomainConfig, NumericsConfig, ProcessConfig, SimConfig,
)
from subzero_tpu.diagnostics import eulerian_data
from subzero_tpu.init import initial_state
from subzero_tpu.state import state_from_polygons


@pytest.mark.parametrize("periodic", [False, True])
def test_scatter_matches_dense(periodic):
    cfg = SimConfig(capacity=CapacityConfig(max_floes=64),
                    numerics=NumericsConfig(dtype="float64"),
                    processes=ProcessConfig(periodic=periodic))
    state, _ = initial_state(cfg, 1.0, 12, 0.25, seed=0)
    e_s = eulerian_data(state, cfg, 14, 11)                 # scatter
    e_d = jax.jit(lambda s: eulerian_data(s, cfg, 14, 11))(state)  # blocked
    for k in ("u", "v", "h", "c", "mtot", "area", "over"):
        a = np.asarray(getattr(e_s, k))
        b = np.asarray(getattr(e_d, k))
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        assert err < 1e-12, (k, err)


@pytest.mark.slow
def test_eulerian_10k_40x40():
    """10,240 floes x 40x40 cells completes in seconds (scatter path) and
    conserves total mass/area."""
    n = 10240
    side = int(np.ceil(np.sqrt(n)))
    pitch = 4000.0
    lx = side * pitch / 2
    cfg = SimConfig(
        capacity=CapacityConfig(max_floes=n, max_verts=16, max_neighbors=8,
                                n_mc_points=8, stress_window=4),
        numerics=NumericsConfig(dtype="float32"),
        domain=DomainConfig(lx=lx, ly=lx),
        processes=ProcessConfig(periodic=True),
    )
    rng = np.random.default_rng(0)
    sq = 0.5 * np.array([[-1., -1.], [1., -1.], [1., 1.], [-1., 1.]])
    polys = []
    for k in range(n):
        i, j = divmod(k, side)
        c = np.array([-lx + (j + 0.5) * pitch, -lx + (i + 0.5) * pitch])
        polys.append(sq * pitch * 0.97 + c)
    state = state_from_polygons(polys, 0.5, cfg)
    t0 = time.time()
    e = eulerian_data(state, cfg, 40, 40)
    area_sum = float(np.asarray(e.area).sum())
    wall = time.time() - t0
    total_area = float(np.asarray(state.area)[:n].sum())
    assert abs(area_sum - total_area) / total_area < 1e-3
    # concentration ~0.94 everywhere in a uniform pack
    c_grid = np.asarray(e.c)
    assert 0.9 < c_grid.mean() < 1.0
    assert wall < 120, f"eulerian at 10k/40x40 took {wall:.0f}s"

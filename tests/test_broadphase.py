"""Cell-list broad phase vs all-pairs equivalence + step-level agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu import SimConfig
from subzero_tpu.config import (
    CapacityConfig, DomainConfig, NumericsConfig, PhysicsConfig,
    ProcessConfig,
)
from subzero_tpu.dynamics import make_step_fn
from subzero_tpu.dynamics.broadphase import (
    neighbor_candidates, neighbor_candidates_cells,
)
from subzero_tpu.forcing import uniform_forcing
from subzero_tpu.state import state_from_polygons

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def random_field(n=100, seed=0, lx=5e4):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-lx * 0.9, lx * 0.9, n)
    y = rng.uniform(-lx * 0.9, lx * 0.9, n)
    rmax = rng.uniform(800.0, 1500.0, n)
    alive = rng.random(n) > 0.1
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(rmax),
            jnp.asarray(alive))


def pairs_of(nbr):
    idx = np.asarray(nbr.idx)
    valid = np.asarray(nbr.valid)
    out = set()
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if valid[i, k]:
                out.add((i, int(idx[i, k])))
    return out


@pytest.mark.parametrize("periodic", [False, True])
def test_cells_match_n2(periodic):
    x, y, rmax, alive = random_field()
    lx = 5e4
    args = (x, y, rmax, alive, 8, periodic, lx, lx)
    a = neighbor_candidates(*args)
    b = neighbor_candidates_cells(*args, cell_size=2 * 1500.0, cell_cap=16)
    assert not bool(a.overflow) and not bool(b.overflow)
    assert pairs_of(a) == pairs_of(b)


def test_step_with_cells_matches_n2():
    cfg_base = SimConfig(
        physics=PhysicsConfig(cd_ocean=0.0, cd_atm=0.0, f_coriolis=0.0),
        capacity=CapacityConfig(max_floes=16, max_verts=16, max_neighbors=4,
                                n_mc_points=64, stress_window=10),
        domain=DomainConfig(lx=5e4, ly=5e4),
        numerics=NumericsConfig(dt=10.0),
        modulus=6e6, min_floe_size=1e4,
    )
    polys = [2000 * SQ + [c, 0.0] for c in (-4100, -50, 4000, 12000)]
    vel = np.array([[0.1, 0], [0, 0], [-0.1, 0], [-0.1, 0]])
    st = state_from_polygons(polys, 0.5, cfg_base, velocities=vel)
    forcing = uniform_forcing(lx=4e5)

    cfg_cells = cfg_base.replace(numerics=NumericsConfig(
        dt=10.0, broadphase="cells", cell_size=2 * 3000.0))

    s1 = st
    s2 = st
    step1 = make_step_fn(cfg_base, forcing, cfg_base.modulus)
    step2 = make_step_fn(cfg_cells, forcing, cfg_base.modulus)
    for i in range(50):
        s1, _ = step1(s1, jnp.asarray(i))
        s2, _ = step2(s2, jnp.asarray(i))
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s1.x), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               rtol=1e-6, atol=1e-12)

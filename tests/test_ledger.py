"""Mass-ledger invariants + chunk merge-flag semantics (round-3 fixes).

1. The total ledger floes + dissolved + exported must be conserved to f64
   roundoff over a long thermo-off run with corner grinding, simplification
   and contact merges firing (Subzero.m conserves by binning every kill to
   the dissolved field, calc_dissolved_mass.m:10-24; corner-grind remnants
   below 1e4 m^2 are born dead -> dissolved, frac_corner.m:113-115).
2. Merge flags raised at ANY step of a device chunk must reach the
   lifecycle pass (the reference fuses >55% overlaps every step,
   floe_interactions_all.m:470-501), each resolved against its own step's
   neighbor table.
3. Per-region pool overflow must degrade SYMMETRICALLY: the whole step
   falls back to aggregate contacts so Newton's third law survives (a
   partial pool could give one endpoint of a pair the per-region force and
   its mirror the aggregate one).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.config import (
    CapacityConfig, ContactConfig, NumericsConfig, SimConfig,
)
from subzero_tpu.dynamics.broadphase import neighbor_candidates
from subzero_tpu.dynamics.contact import contact_forces
from subzero_tpu.forcing import gyre_ocean
from subzero_tpu.init import initial_state
from subzero_tpu.sim import Simulation, chunk_merge_pairs
from subzero_tpu.state import state_from_polygons


@pytest.mark.slow
def test_mass_ledger_invariant():
    """1000 thermo-off steps with corners + simplify + merges: the ledger
    closes to f64 roundoff (measured 2e-16; gate 1e-9)."""
    cfg = SimConfig(capacity=CapacityConfig(max_floes=64),
                    numerics=NumericsConfig(dtype="float64"))
    state, modulus = initial_state(cfg, 1.0, 12, 0.25, seed=0)
    sim = Simulation(cfg=cfg, state=state, forcing=gyre_ocean(),
                     modulus=modulus)
    m0 = sim.total_mass()
    worst = 0.0
    for _ in range(10):
        sim.run(100)
        tot = (sim.total_mass() + float(np.sum(sim.dissolved))
               + sim.lifecycle.exported_mass)
        worst = max(worst, abs(tot - m0) / m0)
    assert worst < 1e-9, f"ledger drift {worst:.3e}"
    # the dissolve paths actually fired (corner-grind remnants)
    assert float(np.sum(sim.dissolved)) > 0.0


def test_chunk_merge_pairs_transient():
    """A merge flagged mid-chunk (cleared by the last step) is kept, and is
    resolved against the neighbor table of ITS OWN step."""
    from subzero_tpu.dynamics.step import StepAux

    chunk, n, k = 5, 4, 2
    merge_i = np.zeros((chunk, n, k), bool)
    nbr = np.zeros((chunk, n, k), np.int32)
    # step 1: floe 2 flagged against its slot-0 neighbor, which is floe 3
    merge_i[1, 2, 0] = True
    nbr[1, 2, 0] = 3
    # the LAST step's table maps (2, 0) to a different floe: a last-step
    # readout would mispair
    nbr[4, 2, 0] = 1
    aux = StepAux(
        n_collisions=jnp.zeros((chunk,), jnp.int32),
        merge_i=jnp.asarray(merge_i),
        merge_j=jnp.zeros((chunk, n, k), bool),
        absorb_boundary=jnp.zeros((chunk, n), bool),
        killed=jnp.zeros((chunk, n), bool),
        exported=jnp.zeros((chunk, n), bool),
        nbr_overflow=jnp.zeros((chunk,), bool),
        nbr_demand=jnp.zeros((chunk,), jnp.int32),
        overlap_area=jnp.zeros((chunk, n)),
        collision_force=jnp.zeros((chunk, n, 2)),
        collision_torque=jnp.zeros((chunk, n)),
        nbr_idx=jnp.asarray(nbr),
        pair_valid=jnp.zeros((chunk, n, k), bool),
        pair_px=jnp.zeros((chunk, n, k)),
        pair_py=jnp.zeros((chunk, n, k)),
        pair_fx=jnp.zeros((chunk, n, k)),
        pair_fy=jnp.zeros((chunk, n, k)),
        pair_overlap=jnp.zeros((chunk, n, k)),
        boundary_contact=jnp.zeros((chunk, n), bool),
        region_overflow=jnp.zeros((chunk,), bool),
        region_pool_need=jnp.zeros((chunk,), jnp.int32),
        pair_pool_overflow=jnp.zeros((chunk,), bool),
        pair_pool_need=jnp.zeros((chunk,), jnp.int32),
    )
    assert chunk_merge_pairs(aux, chunk) == [(2, 3)]
    # flags outside the executed prefix are ignored
    assert chunk_merge_pairs(aux, 1) is None


def _star(rng, r_mean, n_arms, c=(0.0, 0.0), rough=0.45):
    n = 2 * n_arms
    th = np.linspace(0, 2 * np.pi, n + 1)[:-1] + rng.uniform(0, np.pi / n)
    r = r_mean * (1 + rough * np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
                  + rng.uniform(-0.1, 0.1, n))
    return np.stack([c[0] + r * np.cos(th), c[1] + r * np.sin(th)], axis=1)


def test_pool_overflow_falls_back_symmetrically():
    """When the per-region pool overflows, EVERY pair keeps the aggregate
    contact: forces identical to per_region=False and momentum-conserving."""
    rng = np.random.default_rng(7)
    # dense grid of interlocking stars: every pair has >= 4 crossings
    # (9x9 = 81 floes -> pool demand well past the 128-slot pool floor)
    polys = []
    pitch = 9.5e3
    for gy in range(9):
        for gx in range(9):
            polys.append(_star(rng, 6e3, int(rng.integers(5, 9)),
                               c=(gx * pitch, gy * pitch)))
    vel = rng.uniform(-0.2, 0.2, (len(polys), 2))

    def forces(per_region):
        cfg = SimConfig(
            capacity=CapacityConfig(max_floes=88, max_neighbors=8),
            numerics=NumericsConfig(dtype="float64"),
            contact=ContactConfig(per_region=per_region,
                                  region_pair_frac=1e-6),
        )
        st = state_from_polygons(polys, 0.5, cfg, velocities=vel)
        nbr = neighbor_candidates(st.x, st.y, st.rmax, st.alive,
                                  cfg.capacity.max_neighbors, False, 1e6, 1e6)
        pc = contact_forces(st.verts_world(), st.x, st.y, st.u, st.v,
                            st.ksi, st.h, st.area, nbr, 9e7, cfg, nv=st.nv)
        return pc

    pc_r = forces(True)
    pc_a = forces(False)
    assert bool(pc_r.region_overflow), "pool must overflow in this setup"
    np.testing.assert_allclose(np.asarray(pc_r.fx), np.asarray(pc_a.fx))
    np.testing.assert_allclose(np.asarray(pc_r.fy), np.asarray(pc_a.fy))
    # Newton's third law across the population
    assert abs(float(jnp.sum(pc_r.fx))) < 1e-6 * float(
        jnp.sum(jnp.abs(pc_r.fx)) + 1e-30)
    assert abs(float(jnp.sum(pc_r.fy))) < 1e-6 * float(
        jnp.sum(jnp.abs(pc_r.fy)) + 1e-30)

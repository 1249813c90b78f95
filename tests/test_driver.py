"""Driver cadence parity tests (VERDICT round-1 item 8): automatic
n_dt_out output with AVERAGE, the weld freezing gate, and a mid-run
checkpoint/resume round trip."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from subzero_tpu.config import SimConfig
from subzero_tpu.processes.weld import weld_schedule
from subzero_tpu.sim import Simulation, out_of_box_sim


def _quiet_sim(n_floes=8, seed=0):
    sim = out_of_box_sim(seed=seed, n_floes=n_floes)
    # collisions only: corner grinding uses host RNG, which a resumed run
    # cannot replay
    sim.cfg = sim.cfg.replace(processes=dataclasses.replace(
        sim.cfg.processes, corners=False))
    sim.__post_init__()
    return sim


def test_auto_output_and_average(tmp_path):
    """Every n_dt_out steps: snapshot + Eulerian fields + mass series
    (Subzero.m:220-298); AVERAGE emits the accumulated time mean
    (Subzero.m:230-247)."""
    sim = _quiet_sim()
    sim.output_dir = tmp_path
    sim.cfg = sim.cfg.replace(processes=dataclasses.replace(
        sim.cfg.processes, n_dt_out=10, average=True))
    sim.run(20)

    snaps = sorted(p.name for p in tmp_path.iterdir() if p.is_dir())
    assert snaps == ["snap0000010", "snap0000020"]
    series = np.load(tmp_path / "mass_series.npy")
    assert series.shape == (2, 4)   # step, floe mass, dissolved, exported
    assert np.all(series[:, 1] > 0)              # total mass recorded
    eul = np.load(tmp_path / "snap0000010" / "eulerian.npz")
    assert {"u", "v", "h", "c", "stress"} <= set(eul.files)
    assert 0.0 < eul["c"].max() < 1.1


def test_weld_freezing_gate():
    """weld_schedule returns None when dhdt <= 0 (Subzero.m:318
    ``WELDING && mod(i_step,25)==0 && dhdt > 0``)."""
    cfg = SimConfig()
    frozen = cfg.replace(processes=dataclasses.replace(
        cfg.processes, dhdt=1.0))
    melting = cfg.replace(processes=dataclasses.replace(
        cfg.processes, dhdt=0.0))
    assert weld_schedule(25, frozen, 1e8) == (3, 3, 1e8 / 3)
    assert weld_schedule(500, frozen, 1e8) == (2, 2, 1e8 / 3)
    assert weld_schedule(5000, frozen, 1e8) == (1, 1, 1e8 / 2)
    assert weld_schedule(26, frozen, 1e8) is None
    for s in (25, 500, 5000):
        assert weld_schedule(s, melting, 1e8) is None


def test_checkpoint_resume_roundtrip(tmp_path):
    """Save mid-run, reload, continue: prognostic fields must match the
    uninterrupted run exactly (collision-only config, no host RNG)."""
    sim_a = _quiet_sim(seed=2)
    cfg = sim_a.cfg
    forcing = sim_a.forcing
    sim_a.run(10)
    sim_a.save(tmp_path / "ckpt")
    sim_a.run(10)

    sim_b = Simulation.load(tmp_path / "ckpt", cfg, forcing)
    assert sim_b.step_idx == 10
    sim_b.run(10)

    for field in ("x", "y", "u", "v", "ksi", "alpha", "h", "mass"):
        a = np.asarray(getattr(sim_a.state, field))
        b = np.asarray(getattr(sim_b.state, field))
        np.testing.assert_allclose(a, b, rtol=0, atol=0,
                                   err_msg=f"field {field} diverged")
    np.testing.assert_allclose(sim_a.dissolved, sim_b.dissolved)


def test_eulerian_boundary_union():
    """Overlapping boundary floes are subtracted from the cell area as a
    UNION, not per-floe (calc_eulerian_data.m:144-149; VERDICT round-1
    weak #7)."""
    from subzero_tpu.config import CapacityConfig, NumericsConfig
    from subzero_tpu.diagnostics import (
        _boundary_union_cell_areas, cell_grid,
    )
    from subzero_tpu.state import state_from_polygons

    cfg = SimConfig(numerics=NumericsConfig(dtype="float64"),
                    capacity=CapacityConfig(max_floes=8, max_verts=16),
                    n_boundary=2)
    b1 = np.array([[-9e4, -9e4], [-5e4, -9e4], [-5e4, -5e4], [-9e4, -5e4]],
                  float)
    b2 = b1 + [2e4, 0]              # overlaps b1 by 2e4 x 4e4
    fl = np.array([[0, 0], [2e4, 0], [2e4, 2e4], [0, 2e4]], float)
    st = state_from_polygons([b1, b2, fl], 1.0, cfg)
    cells, _, _ = cell_grid(cfg, 2, 2)
    bu = np.asarray(_boundary_union_cell_areas(st, cfg, cells, 2))
    # union = 2*(4e4)^2 - 2e4*4e4 = 2.4e9 (per-floe sum would be 3.2e9)
    assert abs(bu.reshape(2, 2)[1, 0] - 2.4e9) < 1e3


def test_advect_dissolved_driver():
    """Driver-level Advect_Dissolved_Ice wiring (Subzero.m:359;
    ProcessConfig.advect_dissolved): dissolved mass seeded into the grid
    moves with the ocean current and is approximately conserved under
    zero-flux boundaries (round-3 VERDICT weak #9)."""
    from subzero_tpu.forcing import uniform_forcing

    sim = _quiet_sim()
    sim.forcing = uniform_forcing(lx=4e5, uo=0.5)
    sim.cfg = sim.cfg.replace(processes=dataclasses.replace(
        sim.cfg.processes, advect_dissolved=True))
    sim.dissolved = np.zeros((10, 10))
    sim.dissolved[5, 2] = 1000.0
    m0 = float(sim.dissolved.sum())
    sim.run(200)
    vd = np.asarray(sim.dissolved)
    com_x = float((vd * np.arange(10)[None, :]).sum() / vd.sum())
    assert com_x > 2.05  # drifted east with uo > 0
    assert float(vd.sum()) == pytest.approx(m0, rel=0.05)
    assert float(vd.min()) >= 0.0
    # the AB2 tendency persists for the next run() leg
    assert getattr(sim, "_vd_tend", None) is not None


def test_simulation_2d_mesh():
    """End-to-end Simulation over a ("sx", "sy") 2-D tile mesh (round-3
    VERDICT item 9): the driver builds the 2-D spatial step, runs chunks,
    and rebalances at lifecycle boundaries."""
    import jax
    from jax.sharding import Mesh

    from subzero_tpu.config import (
        CapacityConfig, DomainConfig, NumericsConfig, ProcessConfig,
    )
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.state import state_from_polygons

    n_floes = 64
    side = 8
    pitch = 4000.0
    lx = side * pitch / 2
    cfg = SimConfig(
        capacity=CapacityConfig(max_floes=128, max_verts=16,
                                max_neighbors=8, n_mc_points=64,
                                stress_window=16, max_ghosts=32),
        numerics=NumericsConfig(dtype="float32"),
        domain=DomainConfig(lx=lx, ly=lx),
        processes=ProcessConfig(periodic=True, corners=False),
    )
    rng = np.random.default_rng(0)
    sq = 0.5 * np.array([[-1., -1.], [1., -1.], [1., 1.], [-1., 1.]])
    polys = []
    for k in range(n_floes):
        i, j = divmod(k, side)
        center = np.array([-lx + (j + 0.5) * pitch, -lx + (i + 0.5) * pitch])
        polys.append(sq * pitch * 0.9 + center)
    vel = rng.uniform(-2.0, 2.0, size=(n_floes, 2))
    st = state_from_polygons(polys, 0.5, cfg, velocities=vel)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("sx", "sy"))
    from subzero_tpu.sim import Simulation

    sim = Simulation(cfg=cfg, state=st,
                     forcing=uniform_forcing(lx=4 * lx, dx=lx / 8, uo=0.1),
                     modulus=1.6e8, mesh=mesh)
    sim.run(20)
    alive = np.asarray(sim.state.alive)
    assert int(alive.sum()) == n_floes
    assert np.all(np.isfinite(np.asarray(sim.state.x)[alive]))


def test_auto_pool_growth():
    """Capacity-pool auto-sizing (ContactConfig.region_pool_auto): overflow
    telemetry grows the per-region pool to the measured demand and the
    broad-phase candidate count; the caller then re-runs the chunk."""
    import math

    sim = _quiet_sim()
    frac0 = sim.cfg.contact.region_pair_frac
    s = np.zeros(12)
    s[2], s[3] = 3, 500            # overflow steps, pool demand
    assert sim._grow_pools(s)
    assert sim.cfg.contact.region_pair_frac > frac0
    p = sim.state.n * sim.cfg.capacity.max_neighbors
    pool = max(128, math.ceil(p * sim.cfg.contact.region_pair_frac))
    assert pool >= 500             # sized to demand, not just doubled
    s = np.zeros(12)
    s[8] = 1                       # broad-phase candidate overflow
    s[9] = sim.cfg.capacity.max_neighbors + 5   # measured demand
    k0 = sim.cfg.capacity.max_neighbors
    assert sim._grow_pools(s)
    assert sim.cfg.capacity.max_neighbors > k0
    assert not sim._grow_pools(np.zeros(12))
    # the grown sim still runs
    sim.run(10)
    assert int(np.asarray(sim.state.alive).sum()) > 0


def test_pool_two_way_autosizing():
    """Pools shrink back when windowed demand sits far below the ratcheted
    capacity (round-5: the resumed Nares campaign carried max_neighbors 152
    / region frac 0.67 for measured demands of ~30 / ~2k, paying >5x the
    narrow-phase work per step), and re-grow on overflow."""
    import dataclasses as dc

    sim = _quiet_sim()
    sim.cfg = sim.cfg.replace(capacity=dc.replace(
        sim.cfg.capacity, max_neighbors=64))
    sim.__post_init__()
    k0 = sim.cfg.capacity.max_neighbors
    slots0 = sim.state.n * k0 * sim.cfg.contact.region_pair_frac
    s = np.zeros(13)
    s[3], s[9] = 40, 6              # region demand 40, nbr demand 6
    s[12] = 8                       # max live nv (vertex rung demand)
    for _ in range(sim._SHRINK_WINDOW):
        sim._maybe_shrink_pools(s)
    assert sim.cfg.capacity.max_neighbors < k0
    assert sim.cfg.capacity.max_neighbors >= 8
    # region pool floor is 128 slots; demand 40 must keep >= 128
    import math

    slots = max(128, math.ceil(sim.state.n * sim.cfg.capacity.max_neighbors
                               * sim.cfg.contact.region_pair_frac))
    assert 128 <= slots <= max(128, slots0)
    # the shrunk sim still runs
    sim.run(10)
    assert int(np.asarray(sim.state.alive).sum()) > 0


def test_average_is_exact_every_step_mean(tmp_path):
    """The AVERAGE accumulation rides inside the device scan and must be
    the exact every-step mean of the post-step Eulerian fields
    (Subzero.m:304-314) — not a chunk-stride sample (round-3 VERDICT weak
    #8/#10).  A single fast floe crossing cell boundaries makes the
    per-cell mass history change every step, so a stride sample would be
    visibly wrong; no contacts keeps the trajectory deterministic."""
    from subzero_tpu.config import CapacityConfig, NumericsConfig
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.state import state_from_polygons

    def build():
        cfg = SimConfig(
            capacity=CapacityConfig(max_floes=8, max_verts=16,
                                    n_mc_points=64, stress_window=16),
            numerics=NumericsConfig(dtype="float32"),
        )
        sq = 2000.0 * np.array([[-1., -1.], [1., -1.], [1., 1.], [-1., 1.]])
        st = state_from_polygons([sq + [-3e4, 0.0]], 1.0, cfg,
                                 velocities=np.array([[50.0, 0.0]]))
        return Simulation(cfg=cfg, state=st,
                          forcing=uniform_forcing(lx=4e5), modulus=1e8)

    sim_a = build()
    sim_a.output_dir = tmp_path
    sim_a.cfg = sim_a.cfg.replace(processes=dataclasses.replace(
        sim_a.cfg.processes, n_dt_out=10, average=True, corners=False))
    sim_a.run(10)
    eul_a = np.load(tmp_path / "snap0000010" / "eulerian.npz")

    sim_b = build()
    sim_b.cfg = sim_b.cfg.replace(processes=dataclasses.replace(
        sim_b.cfg.processes, corners=False))
    acc = None
    last = None
    for _ in range(10):
        sim_b.run(1)
        last = {k: np.asarray(v)
                for k, v in sim_b.eulerian()._asdict().items()}
        acc = (dict(last) if acc is None
               else {k: acc[k] + last[k] for k in acc})
    for k in ("mtot", "c", "u"):
        np.testing.assert_allclose(
            eul_a[k], acc[k] / 10.0, rtol=1e-4, atol=1e-7 * acc[k].max(),
            err_msg=f"AVERAGE field {k} is not the exact every-step mean")
    # sanity: the mean is NOT the final-step snapshot (the floe moved)
    assert not np.allclose(eul_a["mtot"], last["mtot"], rtol=1e-3)

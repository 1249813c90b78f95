"""Validation-case smoke tests (small versions of README.md's three cases)
+ plotting."""

import numpy as np
import pytest

from subzero_tpu.validation import (
    floe_size_distribution,
    ice_thickness_distribution,
    nares_sim,
    uniaxial_sim,
    winter_sim,
)


def mass_of(sim):
    a = np.asarray(sim.state.alive)
    return float(np.sum(np.asarray(sim.state.mass)[a])) + float(
        sim.dissolved.sum())


class TestUniaxial:
    def test_walls_close_and_stress_builds(self):
        sim = uniaxial_sim(n_floes=25, seed=1)
        assert sim.cfg.physics.ocean_coupling is False
        m0 = mass_of(sim)
        sim.run(40)
        # wall moved: at step 30 the wall stepped in by 15 m
        _, ly = sim.wall_fn(sim.step_idx)
        assert ly < 1e5
        assert mass_of(sim) == pytest.approx(m0, rel=2e-2)
        # compression generates stress on some floe
        s = np.asarray(sim.state.stress)[np.asarray(sim.state.alive)]
        assert np.any(s != 0)

    def test_no_ocean_drift(self):
        """With coupling off and no contacts, floes must not move."""
        sim = uniaxial_sim(n_floes=4, seed=0)
        u0 = np.asarray(sim.state.u).copy()
        assert np.all(u0 == 0)


class TestNares:
    def test_southward_export(self):
        sim = nares_sim(n_floes=20, seed=2)
        nb = sim.cfg.n_boundary
        assert nb >= 2  # coastline topography present
        y0 = np.asarray(sim.state.y).copy()
        sim.run(40)
        alive = np.asarray(sim.state.alive)
        y1 = np.asarray(sim.state.y)
        movable = alive.copy()
        movable[:nb] = False
        # wind pushes the pack south
        assert np.mean(y1[movable] - y0[movable]) < 0
        # topography floes have not moved
        np.testing.assert_allclose(y1[:nb], y0[:nb])


class TestWinter:
    def test_freezing_grows_ice(self):
        sim = winter_sim(n_floes=15, seed=3)
        assert sim.heat_flux < 0
        h0 = np.asarray(sim.state.h)[np.asarray(sim.state.alive)].mean()
        sim.run(30)
        h1 = np.asarray(sim.state.h)[np.asarray(sim.state.alive)].mean()
        assert h1 > h0  # thermodynamic growth

    def test_distributions(self):
        sim = winter_sim(n_floes=15, seed=3)
        fsd, fe = floe_size_distribution(sim.state)
        itd, ie = ice_thickness_distribution(sim.state)
        assert fsd.sum() == int(np.sum(np.asarray(sim.state.alive)))
        assert itd.sum() == int(np.sum(np.asarray(sim.state.alive)))


class TestPlotting:
    def test_plot_basic_and_eulerian(self, tmp_path):
        from subzero_tpu.plotting import plot_basic, plot_eulerian

        sim = winter_sim(n_floes=10, seed=4)
        p1 = plot_basic(sim.state, sim.cfg, sim.forcing,
                        path=str(tmp_path / "floes.png"), color_by="h")
        p2 = plot_eulerian(sim.eulerian(), sim.cfg,
                           path=str(tmp_path / "eul.png"))
        import os

        assert os.path.getsize(p1) > 10_000
        assert os.path.getsize(p2) > 10_000

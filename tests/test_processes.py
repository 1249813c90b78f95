"""Lifecycle-process tests: conservation properties through topology
surgery (fusion, fracture, ridging, welding, corner grinding, packing)."""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu import SimConfig
from subzero_tpu.config import (
    CapacityConfig, DomainConfig, NumericsConfig, ProcessConfig,
)
from subzero_tpu.processes import (
    apply_edits, extract_view, fracture_pass, fuse_floes, ridge_raft_pass,
    weld_pass,
)
from subzero_tpu.processes.host import StateEdit
from subzero_tpu.processes.fracture import mohr_cone_vertices, principal_stresses
from subzero_tpu.state import state_from_polygons

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def cfg_small(**kw):
    c = SimConfig(
        capacity=CapacityConfig(max_floes=32, max_verts=24, max_neighbors=4,
                                n_mc_points=200, stress_window=20),
        numerics=NumericsConfig(dt=10.0),
        domain=DomainConfig(lx=1e5, ly=1e5),
        min_floe_size=1e5,
    )
    return c.replace(**kw)


def total_mass(state):
    a = np.asarray(state.alive)
    return float(np.sum(np.asarray(state.mass)[a]))


def total_momentum(state):
    a = np.asarray(state.alive)
    m = np.asarray(state.mass)[a]
    return (
        float(np.sum(m * np.asarray(state.u)[a])),
        float(np.sum(m * np.asarray(state.v)[a])),
    )


class TestFuse:
    def test_mass_momentum_conserved(self):
        cfg = cfg_small()
        polys = [2000 * SQ, 2000 * SQ + [3000.0, 0.0]]  # overlapping
        st = state_from_polygons(polys, [0.5, 0.8], cfg,
                                 velocities=np.array([[0.2, 0], [-0.1, 0.1]]))
        m0 = total_mass(st)
        p0 = total_momentum(st)
        view = extract_view(st, cfg)
        edit = fuse_floes(view, 0, [1], cfg)
        st2 = apply_edits(st, edit, cfg)
        assert total_mass(st2) == pytest.approx(m0, rel=1e-6)
        p1 = total_momentum(st2)
        np.testing.assert_allclose(p1, p0, rtol=1e-6)
        # two floes became one
        assert int(np.sum(np.asarray(st2.alive))) == 1
        # union area = 16e6 + 16e6 - overlap (1000 x 4000)
        a = float(np.asarray(st2.area)[np.asarray(st2.alive)][0])
        assert a == pytest.approx(16e6 + 16e6 - 4e6, rel=1e-6)

    def test_stress_blend(self):
        cfg = cfg_small()
        polys = [2000 * SQ, 2000 * SQ + [3000.0, 0.0]]
        st = state_from_polygons(polys, 0.5, cfg)
        hist = np.asarray(st.stress_hist).copy()
        hist[0, :, 0] = 10.0
        hist[1, :, 0] = 30.0
        st = st.replace(stress_hist=jnp.asarray(hist),
                        stress=jnp.asarray(hist.mean(axis=1)))
        view = extract_view(st, cfg)
        edit = fuse_floes(view, 0, [1], cfg)
        st2 = apply_edits(st, edit, cfg)
        slot = int(np.nonzero(np.asarray(st2.alive))[0][0])
        # equal masses -> blended stress = 20
        assert float(np.asarray(st2.stress)[slot, 0]) == pytest.approx(20.0)


class TestFracture:
    def test_mohr_cone_contains_origin(self):
        cfg = cfg_small()
        mohr = mohr_cone_vertices(cfg)
        # compressive stresses keep floes intact; the cone contains 0 stress
        from subzero_tpu.processes.fracture import _point_in_poly
        assert _point_in_poly((0.0, -1.0), mohr)

    def test_stressed_floe_fractures(self):
        cfg = cfg_small()
        st = state_from_polygons([4000 * SQ], 0.5, cfg,
                                 velocities=np.array([[0.1, 0.0]]))
        # put a huge tensile stress on it (outside the cone)
        stress = np.zeros((st.n, 3))
        stress[0] = [5e5, 5e5, 0.0]
        st = st.replace(stress=jnp.asarray(stress))
        m0 = total_mass(st)
        view = extract_view(st, cfg)
        edit = fracture_pass(view, cfg, np.random.default_rng(0))
        assert 0 in edit.kills
        assert len(edit.new_floes) >= 2
        st2 = apply_edits(st, edit, cfg)
        n_alive = int(np.sum(np.asarray(st2.alive)))
        assert n_alive >= 2
        assert total_mass(st2) == pytest.approx(m0, rel=1e-6)
        # children inherit parent velocity
        u = np.asarray(st2.u)[np.asarray(st2.alive)]
        np.testing.assert_allclose(u, 0.1, rtol=1e-6)
        # stress history zeroed
        s = np.asarray(st2.stress)[np.asarray(st2.alive)]
        np.testing.assert_allclose(s, 0.0, atol=1e-12)

    def test_mass_closed_under_stale_area(self):
        """Fracture shares must normalize by the ACTUAL polygon area: when
        the stored state `area` lags the world-frame polygon (f32 drift,
        round-3 uniaxial +0.13% residual), children + dissolved remainder
        must still equal the parent mass exactly."""
        cfg = cfg_small()
        st = state_from_polygons([4000 * SQ], 0.5, cfg)
        stress = np.zeros((st.n, 3))
        stress[0] = [5e5, 5e5, 0.0]
        # stored area 2e-4 SMALLER than the actual polygon (the leak case:
        # pieces sum > stored -> negative remainder used to be dropped)
        area = np.asarray(st.area).copy()
        area[0] *= 1.0 - 2e-4
        st = st.replace(stress=jnp.asarray(stress), area=jnp.asarray(area))
        view = extract_view(st, cfg)
        m0 = float(view.mass[0])
        edit = fracture_pass(view, cfg, np.random.default_rng(0))
        assert 0 in edit.kills and len(edit.new_floes) >= 2
        m_children = sum(f.mass for f in edit.new_floes)
        m_lost = sum(m for _, _, m in edit.dissolve_mass)
        assert m_lost >= -1e-9 * m0
        assert m_children + m_lost == pytest.approx(m0, rel=1e-12)

    def test_unstressed_floe_intact(self):
        cfg = cfg_small()
        st = state_from_polygons([4000 * SQ], 0.5, cfg)
        view = extract_view(st, cfg)
        edit = fracture_pass(view, cfg, np.random.default_rng(0))
        assert edit.empty


class TestRidge:
    def test_mass_transfer(self):
        cfg = cfg_small()
        # two thick overlapping floes (h >= hc = 0.2)
        polys = [4000 * SQ, 4000 * SQ + [7000.0, 0.0]]
        st = state_from_polygons(polys, [2.0, 0.5], cfg)
        m0 = total_mass(st)
        view = extract_view(st, cfg)
        dom = np.asarray(
            [[-1e5, -1e5], [1e5, -1e5], [1e5, 1e5], [-1e5, 1e5]])
        rng = np.random.default_rng(1)
        # keep_prob path: run several times; ridging is probabilistic (5%
        # keep-out) so a couple of tries are plenty
        edit = ridge_raft_pass(view, cfg, rng, "ridge", dom)
        if edit.empty:
            edit = ridge_raft_pass(view, cfg, rng, "ridge", dom)
        assert not edit.empty
        # one floe thickened, the other lost the overlap footprint
        assert len(edit.updates) == 1
        winner = next(iter(edit.updates))
        assert edit.updates[winner]["h"] > view.h[winner]
        st2 = apply_edits(st, edit, cfg)
        assert total_mass(st2) == pytest.approx(m0, rel=1e-6)
        # overlap removed: loser shape no longer overlaps winner
        view2 = extract_view(st2, cfg)
        from subzero_tpu.native import poly_boolean, poly_area
        live = [i for i in range(view2.n) if view2.alive[i]]
        inter = poly_boolean(view2.poly(live[0]), view2.poly(live[1]), "int")
        a = sum(max(poly_area(c), 0.0) for c in inter)
        assert a < 1e4  # essentially no overlap left

    def test_thin_floes_skip_ridge(self):
        cfg = cfg_small()
        polys = [4000 * SQ, 4000 * SQ + [7000.0, 0.0]]
        st = state_from_polygons(polys, [7.0, 7.0], cfg)  # too thick
        view = extract_view(st, cfg)
        dom = np.asarray([[-1e5, -1e5], [1e5, -1e5], [1e5, 1e5], [-1e5, 1e5]])
        edit = ridge_raft_pass(view, cfg, np.random.default_rng(0), "ridge",
                               dom)
        assert edit.empty


class TestWeld:
    def test_weld_fuses_overlapping(self):
        cfg = cfg_small()
        polys = [4000 * SQ, 4000 * SQ + [7000.0, 0.0]]
        # background floes so the union < total_ice/5 gate passes (weld.m:118)
        polys += [4000 * SQ + [x, 60000.0] for x in
                  (-80000, -60000, -40000, -20000, 0, 20000, 40000, 60000)]
        st = state_from_polygons(polys, 0.5, cfg)
        m0 = total_mass(st)
        view = extract_view(st, cfg)
        edit = weld_pass(view, cfg, np.random.default_rng(0), 1, 1,
                         max_weld_area=1e9)
        assert not edit.empty
        assert edit.kills == {0, 1}
        st2 = apply_edits(st, edit, cfg)
        assert int(np.sum(np.asarray(st2.alive))) == len(polys) - 1
        assert total_mass(st2) == pytest.approx(m0, rel=1e-6)


class TestCapacity:
    def test_overflow_raises(self):
        cfg = cfg_small(capacity=CapacityConfig(
            max_floes=2, max_verts=24, max_neighbors=2,
            n_mc_points=50, stress_window=5))
        st = state_from_polygons([4000 * SQ, 4000 * SQ + [9000, 0]], 0.5, cfg)
        edit = StateEdit()
        from subzero_tpu.processes.host import NewFloe
        for k in range(3):
            edit.new_floes.append(NewFloe(poly=2000 * SQ + [k * 5000, 0],
                                          h=0.5))
        with pytest.raises(RuntimeError, match="capacity"):
            apply_edits(st, edit, cfg)

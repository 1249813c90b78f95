"""Dynamical-core property tests.

Modeled on the reference's conservation test intent
(``test/conservation_test.m``: kinetic energy must not grow across collision
scenarios) plus momentum-symmetry and forcing checks the reference lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subzero_tpu import SimConfig
from subzero_tpu.config import (
    CapacityConfig,
    DomainConfig,
    NumericsConfig,
    PhysicsConfig,
    ProcessConfig,
)
from subzero_tpu.dynamics import make_step_fn
from subzero_tpu.forcing import uniform_forcing
from subzero_tpu.state import state_from_polygons

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def small_cfg(**kw) -> SimConfig:
    base = SimConfig(
        capacity=CapacityConfig(
            max_floes=8, max_verts=16, max_neighbors=4,
            n_mc_points=400, stress_window=50,
        ),
        numerics=NumericsConfig(dt=10.0),
        domain=DomainConfig(lx=1e5, ly=1e5),
        modulus=1.5e3 * 2.0 * 4000.0,
    )
    return base.replace(**kw)


def no_drag_physics() -> PhysicsConfig:
    """Physics with ocean/atm coupling and Coriolis off: contact only."""
    return PhysicsConfig(cd_ocean=0.0, cd_atm=0.0, f_coriolis=0.0)


def run(step, state, n, start=0):
    for i in range(start, start + n):
        state, aux = step(state, jnp.asarray(i))
    return state, aux


def momentum(s):
    a = np.asarray(s.alive)
    m = np.asarray(s.mass) * a
    return np.array([np.sum(m * np.asarray(s.u)), np.sum(m * np.asarray(s.v))])


def kinetic(s):
    a = np.asarray(s.alive)
    m = np.asarray(s.mass)
    i_ = np.asarray(s.inertia)
    u, v, k = np.asarray(s.u), np.asarray(s.v), np.asarray(s.ksi)
    return float(np.sum(a * (0.5 * m * (u * u + v * v) + 0.5 * i_ * k * k)))


class TestHeadOnCollision:
    @pytest.fixture(scope="class")
    def result(self):
        cfg = small_cfg(physics=no_drag_physics())
        polys = [4000.0 * SQ - [4100.0, 0], 4000.0 * SQ + [4100.0, 0]]
        st = state_from_polygons(
            polys, 0.5, cfg, velocities=np.array([[0.2, 0], [-0.2, 0]])
        )
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        states = [st]
        s = st
        for i in range(300):
            s, aux = step(s, jnp.asarray(i))
            states.append(s)
        return states

    def test_momentum_conserved(self, result):
        """Pure contact (no drag): total momentum conserved (Newton's 3rd
        law holds without the reference's sequential symmetrization)."""
        p0 = momentum(result[0])
        for s in result[::50]:
            np.testing.assert_allclose(momentum(s), p0, atol=1e-5)

    def test_energy_dissipates(self, result):
        """K(end)/K(1) < 1 (conservation_test.m:21-54 criterion)."""
        assert kinetic(result[-1]) < kinetic(result[0])

    def test_floes_bounce(self, result):
        u_end = np.asarray(result[-1].u)
        assert u_end[0] < 0 and u_end[1] > 0

    def test_no_interpenetration_blowup(self, result):
        for s in result[::50]:
            assert np.all(np.isfinite(np.asarray(s.x)[:2]))
            assert abs(np.asarray(s.u)[0]) < 1.0


class TestOffsetCollision:
    def test_offset_collision_induces_spin(self):
        """Offset blocks -> rotation (conservation_test.m scenario 2)."""
        cfg = small_cfg(physics=no_drag_physics())
        polys = [
            4000.0 * SQ - [4100.0, 2000.0],
            4000.0 * SQ + [4100.0, 2000.0],
        ]
        st = state_from_polygons(
            polys, 0.5, cfg, velocities=np.array([[0.2, 0], [-0.2, 0]])
        )
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, _ = run(step, st, 200)
        ksi = np.asarray(s.ksi)[:2]
        assert np.any(ksi != 0.0)
        # torque antisymmetry: opposite spins for mirror-image contact
        assert np.sign(ksi[0]) == np.sign(ksi[1])  # both rotate same way


class TestOceanDrift:
    def test_drift_toward_ocean_velocity(self):
        cfg = small_cfg()
        st = state_from_polygons([2000.0 * SQ], 0.5, cfg)
        forcing = uniform_forcing(lx=4e5, uo=0.3)
        step = make_step_fn(cfg, forcing, cfg.modulus)
        s, _ = run(step, st, 400)
        u = float(np.asarray(s.u)[0])
        assert 0.1 < u <= 0.35
        # and it moved
        assert float(np.asarray(s.x)[0]) > 100.0

    def test_still_ocean_static_floe(self):
        cfg = small_cfg(physics=no_drag_physics())
        st = state_from_polygons([2000.0 * SQ], 0.5, cfg)
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, _ = run(step, st, 50)
        assert float(np.asarray(s.x)[0]) == pytest.approx(0.0, abs=1e-9)
        assert float(np.asarray(s.u)[0]) == pytest.approx(0.0, abs=1e-12)

    def test_wind_pushes_floe(self):
        cfg = small_cfg()
        st = state_from_polygons([2000.0 * SQ], 0.5, cfg)
        forcing = uniform_forcing(lx=4e5, va=-10.0)  # southward 10 m/s wind
        step = make_step_fn(cfg, forcing, cfg.modulus)
        s, _ = run(step, st, 200)
        assert float(np.asarray(s.v)[0]) < -1e-4


class TestWallContact:
    def test_wall_bounce(self):
        """Floe driven into the east wall is pushed back."""
        cfg = small_cfg(physics=no_drag_physics())
        polys = [2000.0 * SQ + [cfg.domain.lx - 2100.0, 0.0]]
        st = state_from_polygons(polys, 0.5, cfg, velocities=np.array([[0.3, 0]]))
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, _ = run(step, st, 300)
        assert bool(np.asarray(s.alive)[0])
        assert float(np.asarray(s.u)[0]) < 0  # bounced
        assert float(np.asarray(s.x)[0]) < cfg.domain.lx

    def test_escaped_floe_killed(self):
        """Floe mostly outside the domain is absorbed (overlap>0.75 rule)."""
        cfg = small_cfg()
        polys = [2000.0 * SQ + [cfg.domain.lx + 1500.0, 0.0]]
        st = state_from_polygons(polys, 0.5, cfg)
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, aux = run(step, st, 1)
        assert not bool(np.asarray(s.alive)[0])


class TestPeriodic:
    def test_wrap(self):
        cfg = small_cfg(processes=ProcessConfig(periodic=True),
                        physics=no_drag_physics())
        lx = cfg.domain.lx
        polys = [2000.0 * SQ + [lx - 100.0, 0.0]]
        st = state_from_polygons(polys, 0.5, cfg,
                                 velocities=np.array([[5.0, 0]]))
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, _ = run(step, st, 10)
        x = float(np.asarray(s.x)[0])
        assert -lx < x < 0  # wrapped to the west side

    def test_contact_across_seam(self):
        """Two floes touching only through the periodic boundary interact."""
        cfg = small_cfg(processes=ProcessConfig(periodic=True),
                        physics=no_drag_physics())
        lx = cfg.domain.lx
        polys = [
            4000.0 * SQ + [-(lx - 4100.0), 0.0],   # near west edge
            4000.0 * SQ + [+(lx - 4100.0), 0.0],   # near east edge
        ]
        st = state_from_polygons(
            polys, 0.5, cfg,
            velocities=np.array([[-0.2, 0], [0.2, 0]]),  # moving apart -> seam
        )
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, aux = run(step, st, 300)
        u = np.asarray(s.u)
        # They collided through the seam and bounced back inward.
        assert u[0] > 0 and u[1] < 0


class TestStressStrain:
    def test_contact_generates_stress(self):
        cfg = small_cfg(physics=no_drag_physics())
        polys = [4000.0 * SQ - [3950.0, 0], 4000.0 * SQ + [3950.0, 0]]
        st = state_from_polygons(
            polys, 0.5, cfg, velocities=np.array([[0.1, 0], [-0.1, 0]])
        )
        step = make_step_fn(cfg, uniform_forcing(lx=4e5), cfg.modulus)
        s, _ = run(step, st, 30)
        stress = np.asarray(s.stress)
        assert np.any(stress[:2] != 0.0)
        # compression: sigma_xx negative on both floes
        assert stress[0, 0] < 0 and stress[1, 0] < 0


def test_kill_below_ymin_exports():
    """The Nares export rule (README.md Validation 2 item 6b,
    ProcessConfig.kill_below_ymin): a floe whose lowest vertex drops below
    the southern wall dies and its mass is flagged EXPORTED (not
    dissolved) in the step aux."""
    import dataclasses

    import jax.numpy as jnp

    from subzero_tpu.config import CapacityConfig, SimConfig
    from subzero_tpu.dynamics.step import domain_polygon, physics_step
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.state import state_from_polygons

    cfg = SimConfig(capacity=CapacityConfig(max_floes=8, max_verts=16,
                                            n_mc_points=64,
                                            stress_window=16))
    cfg = cfg.replace(processes=dataclasses.replace(
        cfg.processes, kill_below_ymin=True, corners=False))
    sq = 2000.0 * np.array([[-1., -1.], [1., -1.], [1., 1.], [-1., 1.]])
    # floe A straddles the southern wall (lowest vertex below -ly),
    # floe B safely inside
    polys = [sq + [0.0, -cfg.domain.ly + 1000.0], sq]
    st = state_from_polygons(polys, 1.0, cfg)
    st2, aux = physics_step(
        st, uniform_forcing(lx=4e5), jnp.asarray(0), domain_polygon(cfg),
        1e8, 0.0, cfg)
    killed = np.asarray(aux.killed)
    exported = np.asarray(aux.exported)
    assert killed[0] and exported[0]
    assert not killed[1] and not exported[1]
    assert not bool(np.asarray(st2.alive)[0])


def test_pair_pool_matches_default_path():
    """The active-pair pool (ContactConfig.pair_pool) is an exact
    transformation: dropping bbox-disjoint candidate pairs cannot change
    any contact, so forces/torques/merges must match the streaming path
    bit-for-bit on the same state."""
    import dataclasses

    import jax.numpy as jnp

    from subzero_tpu.config import CapacityConfig, SimConfig
    from subzero_tpu.dynamics.step import domain_polygon, physics_step
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.init import voronoi_floe_field
    from subzero_tpu.state import state_from_polygons

    cfg = SimConfig(capacity=CapacityConfig(
        max_floes=48, max_verts=16, n_mc_points=64, stress_window=16))
    polys, heights = voronoi_floe_field(cfg, 1.0, 40, height_mean=1.0,
                                        height_delta=0.0, seed=3)
    st = state_from_polygons(polys, heights, cfg)
    forcing = uniform_forcing(lx=4e5)
    outs = {}
    for pp in (False, True):
        c = cfg.replace(contact=dataclasses.replace(
            cfg.contact, pair_pool=pp, pair_pool_frac=1.0))
        s2, aux = physics_step(st, forcing, jnp.asarray(0),
                               domain_polygon(c), 1e8, 0.0, c)
        outs[pp] = (s2, aux)
    for name in ("x", "y", "u", "v", "ksi", "alive"):
        a = np.asarray(getattr(outs[False][0], name))
        b = np.asarray(getattr(outs[True][0], name))
        assert np.array_equal(a, b), f"state.{name} diverged"
    assert int(outs[False][1].n_collisions) == int(outs[True][1].n_collisions)
    assert np.array_equal(np.asarray(outs[False][1].merge_i),
                          np.asarray(outs[True][1].merge_i))

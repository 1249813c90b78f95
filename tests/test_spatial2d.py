"""2-D tile decomposition (parallel/spatial2d.py): equivalence with the
single-device step, corner-ghost contacts, two-phase migration, load
imbalance metric (VERDICT round-1 item 10)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from subzero_tpu.config import (
    CapacityConfig, DomainConfig, NumericsConfig, PhysicsConfig,
    ProcessConfig, SimConfig,
)
from subzero_tpu.dynamics import make_step_fn
from subzero_tpu.forcing import uniform_forcing
from subzero_tpu.parallel import (
    load_imbalance, make_spatial_step_2d, rebalance_tiles, shard_state_2d,
)
from subzero_tpu.state import state_from_polygons

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def mesh2d(sx=4, sy=2):
    return Mesh(np.array(jax.devices()[:sx * sy]).reshape(sx, sy),
                ("sx", "sy"))


def _setup(periodic, n_side=6, cap=64):
    lx = 1e5
    cfg = SimConfig(
        physics=PhysicsConfig(ocean_coupling=False),
        processes=ProcessConfig(periodic=periodic, corners=False),
        numerics=NumericsConfig(dtype="float64"),
        domain=DomainConfig(lx=lx, ly=lx),
        capacity=CapacityConfig(max_floes=cap, max_verts=8,
                                max_neighbors=8, max_ghosts=16,
                                n_mc_points=32, stress_window=8),
        min_floe_size=1.0,
    )
    rng = np.random.default_rng(3)
    pitch = 2 * lx / n_side
    polys = []
    for k in range(n_side * n_side):
        i, j = divmod(k, n_side)
        c = np.array([-lx + (j + 0.5) * pitch, -lx + (i + 0.5) * pitch])
        polys.append(SQ * pitch * 0.49 + c
                     + rng.uniform(-0.02, 0.02, (4, 2)) * pitch)
    vel = rng.uniform(-0.3, 0.3, (len(polys), 2))
    st = state_from_polygons(polys, 0.5, cfg, velocities=vel)
    forcing = uniform_forcing(lx=4e5, dx=1e4)
    return cfg, st, forcing


def test_matches_single_device_2d():
    """10 steps of the 4x2-tile step == the single-device step."""
    for periodic in (False, True):
        cfg, st, forcing = _setup(periodic)
        mesh = mesh2d()
        st2 = shard_state_2d(rebalance_tiles(st, cfg, 4, 2), mesh)
        step2d = make_spatial_step_2d(cfg, forcing, 9e7, 0.0, mesh)
        step1 = make_step_fn(cfg, forcing, 9e7)

        s1, s2 = st, st2
        for k in range(10):
            s1, _ = step1(s1, jnp.asarray(k))
            s2, aux2 = step2d(s2, jnp.asarray(k))
            assert not bool(aux2.nbr_overflow)

        # compare by sorted (x, y, u, v) multisets (slot order differs)
        def live_sorted(s, f):
            v = np.asarray(getattr(s, f))[np.asarray(s.alive)]
            return np.sort(v)

        for f in ("x", "y", "u", "v", "ksi", "h"):
            a = live_sorted(s1, f)
            b = live_sorted(s2, f)
            assert a.shape == b.shape, (periodic, f)
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9,
                                       err_msg=f"{f} periodic={periodic}")


def test_corner_ghost_contact():
    """Two floes touching diagonally across a tile CORNER interact (the
    x-then-y ghost pass must deliver corner ghosts)."""
    lx = 1e5
    cfg = SimConfig(
        physics=PhysicsConfig(ocean_coupling=False),
        processes=ProcessConfig(corners=False),
        numerics=NumericsConfig(dtype="float64"),
        domain=DomainConfig(lx=lx, ly=lx),
        capacity=CapacityConfig(max_floes=32, max_verts=8, max_neighbors=4,
                                max_ghosts=8, n_mc_points=16,
                                stress_window=4),
        min_floe_size=1.0,
    )
    # tile corner of the 2x2 sub-grid at (0, 0): floes overlap across it
    a = SQ * 4e3 + np.array([-3.9e3, -3.9e3])   # tile (-,-)
    b = SQ * 4e3 + np.array([+3.9e3, +3.9e3])   # tile (+,+) — overlaps a
    st = state_from_polygons([a, b], 0.5, cfg,
                             velocities=np.array([[0.1, 0.1],
                                                  [-0.1, -0.1]]))
    mesh = mesh2d(2, 2)
    st = shard_state_2d(rebalance_tiles(st, cfg, 2, 2), mesh)
    step = make_spatial_step_2d(cfg, uniform_forcing(lx=4e5, dx=1e4),
                                9e7, 0.0, mesh)
    st, aux = step(st, jnp.asarray(0))
    assert int(aux.n_collisions) >= 1, "corner-diagonal contact missed"
    cf = np.asarray(aux.collision_force)
    assert np.abs(cf).max() > 0


def test_two_phase_migration_diagonal():
    """A floe crossing a tile corner diagonally lands in the correct tile
    after one step (x-phase then y-phase)."""
    lx = 1e5
    cfg = SimConfig(
        physics=PhysicsConfig(ocean_coupling=False),
        processes=ProcessConfig(corners=False, collision=False),
        numerics=NumericsConfig(dtype="float64", dt=10.0),
        domain=DomainConfig(lx=lx, ly=lx),
        capacity=CapacityConfig(max_floes=32, max_verts=8, max_neighbors=4,
                                max_ghosts=8, n_mc_points=16,
                                stress_window=4),
        min_floe_size=1.0,
    )
    # floe just inside tile (0,0) moving toward (+x,+y) across the corner
    p = SQ * 2e3 + np.array([-80.0, -80.0])
    st = state_from_polygons([p], 0.5, cfg,
                             velocities=np.array([[20.0, 20.0]]))
    mesh = mesh2d(2, 2)
    st = shard_state_2d(rebalance_tiles(st, cfg, 2, 2), mesh)
    step = make_spatial_step_2d(cfg, uniform_forcing(lx=4e5, dx=1e4),
                                9e7, 0.0, mesh)
    for k in range(3):
        st, aux = step(st, jnp.asarray(k))
        assert not bool(aux.nbr_overflow)
    alive = np.asarray(st.alive)
    assert alive.sum() == 1
    slot = int(np.nonzero(alive)[0][0])
    x = float(np.asarray(st.x)[slot])
    y = float(np.asarray(st.y)[slot])
    assert x > 0 and y > 0
    # owner tile (1,1) owns slot block (1*2+1)*n_loc = 3*8
    n_loc = 32 // 4
    assert slot // n_loc == 3, f"slot {slot} not in tile (1,1) block"


def test_load_imbalance_metric():
    cfg, st, _ = _setup(False)
    # uniform lattice: near-perfect balance on 4x2 tiles
    assert load_imbalance(st, cfg, 4, 2) < 1.5
    # everything clustered in one corner: max imbalance = n_tiles
    st_c = st.replace(x=jnp.abs(st.x) * 0 - 9e4, y=st.y * 0 - 9e4)
    assert load_imbalance(st_c, cfg, 4, 2) == 8.0


def test_overlap_matches_serialized_exchange_2d():
    """NumericsConfig.overlap_halo on the 2-D tile mesh (interior pass +
    packed band pass vs the x/y/corner ghosts, merged into the standard
    pair tables) must reproduce the serialized-exchange physics exactly,
    including corner-ghost contacts."""
    import dataclasses as dc

    outs = {}
    for ov in (False, True):
        cfg, st, forcing = _setup(True, n_side=8, cap=128)
        cfg = cfg.replace(numerics=dc.replace(
            cfg.numerics, overlap_halo=ov))
        mesh = mesh2d()
        s2 = shard_state_2d(rebalance_tiles(st, cfg, 4, 2), mesh)
        step = make_spatial_step_2d(cfg, forcing, 9e7, 0.0, mesh)
        for k in range(6):
            s2, aux = step(s2, jnp.asarray(k))
            assert not bool(aux.nbr_overflow)
        rows = np.stack([
            np.asarray(getattr(s2, f))[np.asarray(s2.alive)]
            for f in ("x", "y", "u", "v", "ksi")
        ])
        outs[ov] = (rows[:, np.lexsort(rows)], int(aux.n_collisions))
    np.testing.assert_allclose(outs[False][0], outs[True][0],
                               rtol=1e-9, atol=1e-9)
    assert outs[False][1] == outs[True][1]

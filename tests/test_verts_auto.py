"""Two-way vertex-rung auto-sizing (CapacityConfig.verts_auto).

The state's vertex axis runs at the population's actual need (clip cost is
O(V^2) per candidate pair) while birth truncation stays governed by the
max_verts fidelity cap: growth fires exactly when a birth needs more
vertices than the current rung, shrink when the windowed max live vertex
count drops.  Physics must be invariant to the rung — padding slots hold
vertex 0 (degenerate edges, exact zeros in every boundary integral).
"""

from __future__ import annotations

import dataclasses as dc

import numpy as np

from subzero_tpu.config import CapacityConfig, NumericsConfig, SimConfig
from subzero_tpu.sim import Simulation, _ladder_v, out_of_box_sim


def test_ladder():
    assert _ladder_v(3, 64) == 8
    assert _ladder_v(8, 64) == 8
    assert _ladder_v(9, 64) == 16
    assert _ladder_v(18, 64) == 24
    assert _ladder_v(33, 64) == 48
    assert _ladder_v(50, 64) == 64
    assert _ladder_v(80, 64) == 64     # clipped to the fidelity cap
    assert _ladder_v(70, 128) == 80


def test_fit_shrinks_and_physics_matches_static():
    """Initial fit drops the rung to the population's need; trajectories
    match the static max_verts=64 build.  Padding columns hold vertex 0
    (degenerate edges, zero contributions), but the narrower reduction
    tree may regroup the real terms — so the comparison is tolerance-based
    over a short horizon, like the pool-resize semantics."""

    def run(auto: bool):
        sim = out_of_box_sim(seed=0, n_floes=8)
        if not auto:
            sim.cfg = sim.cfg.replace(capacity=dc.replace(
                sim.cfg.capacity, verts_auto=False))
        sim.run(20)
        return sim

    a = run(True)
    b = run(False)
    assert a.state.v_cap < b.state.v_cap          # the fit actually fired
    assert a.cfg.capacity.verts_now == a.state.v_cap
    assert np.allclose(np.asarray(a.state.x), np.asarray(b.state.x),
                       atol=0.5)                  # metres, 1e5-m domain
    assert np.allclose(np.asarray(a.state.y), np.asarray(b.state.y),
                       atol=0.5)
    assert np.allclose(np.asarray(a.state.u), np.asarray(b.state.u),
                       atol=5e-3)
    assert np.array_equal(np.asarray(a.state.nv), np.asarray(b.state.nv))
    assert np.isclose(a.total_mass(), b.total_mass(), rtol=1e-6)


def test_grow_verts_preserves_state_and_run_continues():
    sim = out_of_box_sim(seed=0, n_floes=6)
    sim.run(5)                                    # fit -> small rung
    v0 = sim.state.v_cap
    nv0 = np.asarray(sim.state.nv).copy()
    vb0 = np.asarray(sim.state.verts_body).copy()
    st = sim._grow_verts(sim.state, v0 + 5)
    assert st.v_cap == _ladder_v(v0 + 5, sim.cfg.capacity.max_verts) > v0
    assert sim.cfg.capacity.verts_now == st.v_cap
    assert np.array_equal(np.asarray(st.verts_body)[:, :v0], vb0)
    # widened columns are vertex-0 pads
    assert np.array_equal(np.asarray(st.verts_body)[:, v0:],
                          np.broadcast_to(vb0[:, :1],
                                          (vb0.shape[0], st.v_cap - v0, 2)))
    assert np.array_equal(np.asarray(st.nv), nv0)
    sim.state = st
    sim.run(5)                                    # re-jits via built-cfg
    assert np.isfinite(sim.total_mass())


def test_rung_shrinks_after_window():
    sim = out_of_box_sim(seed=0, n_floes=6)
    sim._SHRINK_WINDOW = 2                        # instance override
    sim.run(5)
    v_fit = sim.state.v_cap
    sim.state = sim._grow_verts(sim.state, 40)    # artificial spike
    assert sim.state.v_cap == 48
    sim.run(40)                                   # >2 chunks at chunk=10
    assert sim.state.v_cap == v_fit
    assert sim.cfg.capacity.verts_now == v_fit


def test_birth_truncation_bound_is_max_verts_not_rung():
    """With the growth hook wired (the driver), a wide birth grows the
    rung and keeps every vertex up to max_verts; without it (library use)
    the birth is capped at the current rung."""
    from subzero_tpu.processes.host import NewFloe, StateEdit, apply_edits
    from subzero_tpu.state import state_from_polygons

    cfg = SimConfig(
        numerics=NumericsConfig(dtype="float64"),
        capacity=CapacityConfig(max_floes=8, max_verts=16, active_verts=8,
                                n_mc_points=64, stress_window=8),
    )
    sq = 2e3 * np.array([[-1., -1.], [1., -1.], [1., 1.], [-1., 1.]])
    state = state_from_polygons([sq], 1.0, cfg)
    assert state.v_cap == 8
    th = np.linspace(0, 2 * np.pi, 21)[:-1]
    circle = 3e3 * np.stack([np.cos(th), np.sin(th)], axis=1) + [1e4, 0]

    # library path: no hook, capped at the rung
    edit = StateEdit(new_floes=[NewFloe(poly=circle, h=1.0)])
    st2 = apply_edits(state, edit, cfg, seed=0)
    assert int(np.asarray(st2.nv)[1]) == 8

    # driver path: lifecycle grows the rung first, truncation at max_verts
    sim = Simulation(cfg=cfg, state=state,
                     forcing=__import__("subzero_tpu.forcing",
                                        fromlist=["uniform_forcing"]
                                        ).uniform_forcing(lx=4e5),
                     modulus=1e8)
    edit = StateEdit(new_floes=[NewFloe(poly=circle, h=1.0)])
    st = sim.state
    need = min(len(circle), sim.cfg.capacity.max_verts)
    st = sim.lifecycle.grow_verts_fn(st, need)
    assert st.v_cap == 16
    st3 = apply_edits(st, edit, sim.cfg, seed=0)
    assert int(np.asarray(st3.nv)[1]) == 16      # truncated at max_verts


def test_resume_adopts_saved_rung(tmp_path):
    sim = out_of_box_sim(seed=0, n_floes=6)
    sim.run(5)
    v0 = sim.state.v_cap
    assert v0 < 64
    sim.save(tmp_path / "snap")
    cfg = out_of_box_sim(seed=0, n_floes=6).cfg   # fresh default cfg
    sim2 = Simulation.load(tmp_path / "snap", cfg, sim.forcing)
    assert sim2.state.v_cap == v0                 # arrays at the saved rung
    assert sim2.cfg.capacity.max_verts == 64      # fidelity cap intact
    sim2.run(5)
    assert np.isfinite(sim2.total_mass())


def test_shrink_floor_covers_boundary_births():
    """A floe born at the very boundary where the shrink window fills is
    absent from the chunk summaries; the lifecycle's last_birth_nv floor
    must keep the rung at or above its vertex count (a shrink below it
    would silently truncate live geometry, nv > v_cap)."""
    sim = out_of_box_sim(seed=0, n_floes=6)
    sim.run(5)
    sim.state = sim._grow_verts(sim.state, 40)      # rung 48
    sim._SHRINK_WINDOW = 1
    s = np.zeros(13)
    s[12] = 6                                       # summary says nv<=6
    sim.lifecycle.last_birth_nv = 20                # boundary birth: 20
    sim._maybe_shrink_pools(s)
    assert sim.state.v_cap >= 24                    # ladder(20), not 8
    assert sim.lifecycle.last_birth_nv == 0         # consumed
    sim.lifecycle.last_birth_nv = 0
    sim._maybe_shrink_pools(s)                      # no birth this time
    assert sim.state.v_cap == 8

"""Direct tests of new-ice packing (``processes/pack.py`` vs
``Physical_Processes/create_new_ice.m``), covering VERDICT round-1 item 3:
open-water fill, the hole path (enclosed floes fused in, mass/momentum
conserved), and the topography ``cutpolygon`` split."""

from __future__ import annotations

import numpy as np

from subzero_tpu.config import CapacityConfig, NumericsConfig, SimConfig
from subzero_tpu.native import poly_boolean, poly_area
from subzero_tpu.processes.host import apply_edits, extract_view
from subzero_tpu.processes.pack import pack_pass
from subzero_tpu.state import state_from_polygons

RHO = 920.0


def _circle(r, n=12, c=(0.0, 0.0)):
    th = np.linspace(0, 2 * np.pi, n + 1)[:-1]
    return np.stack([c[0] + r * np.cos(th), c[1] + r * np.sin(th)], 1)


def _cfg(**kw):
    return SimConfig(
        numerics=NumericsConfig(dtype="float64"),
        capacity=CapacityConfig(max_floes=64, max_verts=32),
        min_floe_size=1e6,
        **kw,
    )


def _coverage(view_or_polys, lx):
    """Total ice area inside the domain box."""
    box = np.array([[-lx, -lx], [lx, -lx], [lx, lx], [-lx, lx]], float)
    tot = 0.0
    for p in view_or_polys:
        if p is None:
            continue
        tot += sum(max(poly_area(r), 0.0) for r in poly_boolean(p, box, "int"))
    return tot


def test_pack_fills_open_water():
    """Concentration rises toward target; new ice is h0 thick; nothing below
    min_floe_size (create_new_ice.m:125-154)."""
    cfg = _cfg()
    # the floe fills half its cell, meeting the target there; the other
    # three cells are pure open water
    st = state_from_polygons([_circle(4e4, c=(-5e4, -5e4))], 0.5, cfg)
    view = extract_view(st, cfg)
    rng = np.random.default_rng(1)
    h0 = 0.3
    edit = pack_pass(view, cfg, rng, h0=h0, target=0.5, nx=2, ny=2)

    assert edit.new_floes, "open water must be packed"
    assert not edit.kills
    for nf in edit.new_floes:
        a = abs(poly_area(nf.poly))
        assert a > cfg.min_floe_size
        assert nf.h == h0 and nf.mass is None

    st2 = apply_edits(st, edit, cfg)
    view2 = extract_view(st2, cfg)
    c0 = _coverage(view.polys, cfg.domain.lx) / (4 * cfg.domain.lx ** 2)
    c1 = _coverage(view2.polys, cfg.domain.lx) / (4 * cfg.domain.lx ** 2)
    assert c1 > c0
    assert c1 > 0.4                      # near the 0.5 target
    # new floes don't overlap the pre-existing floe
    old = view.poly(0)
    for nf in edit.new_floes:
        ov = sum(max(poly_area(r), 0.0)
                 for r in poly_boolean(nf.poly, old, "int"))
        assert ov < 1e-3 * abs(poly_area(nf.poly))


def test_pack_hole_fuses_enclosed_floe():
    """A floe enclosed by new ice is welded in: killed (not dissolved), its
    mass and momentum folded into the overlapping new floe, the new floe's
    thickness reduced so total mass is conserved (create_new_ice.m:158-233).
    """
    cfg = _cfg()
    small = _circle(5e3)
    st = state_from_polygons([small], 0.5, cfg,
                             velocities=np.array([[0.2, -0.1]]))
    view = extract_view(st, cfg)
    m_small = float(view.mass[0])
    rng = np.random.default_rng(0)       # seed 0 -> one piece encloses it
    h0 = 0.3
    edit = pack_pass(view, cfg, rng, h0=h0, target=1.0, nx=1, ny=1)

    assert edit.kills == {0}
    assert not edit.dissolve_kills       # mass-conserving kill
    fused = [nf for nf in edit.new_floes if nf.stress_blend]
    assert len(fused) == 1
    nf = fused[0]
    assert nf.mass is not None and nf.mass > m_small
    # momentum conservation: new ice is at rest, so u = m_small*u_small/m_tot
    assert np.isclose(nf.u, 0.2 * m_small / nf.mass, rtol=1e-12)
    assert np.isclose(nf.v, -0.1 * m_small / nf.mass, rtol=1e-12)
    (slot, w), = nf.stress_blend
    assert slot == 0 and np.isclose(w, m_small / nf.mass)

    # total mass ledger: after - before == rho*h0*(net new-ice area)
    a_small = abs(poly_area(small))
    a_new = sum(abs(poly_area(f.poly)) for f in edit.new_floes)
    st2 = apply_edits(st, edit, cfg)
    m_before = float(np.sum(np.where(np.asarray(st.alive),
                                     np.asarray(st.mass), 0.0)))
    m_after = float(np.sum(np.where(np.asarray(st2.alive),
                                    np.asarray(st2.mass), 0.0)))
    expected = RHO * h0 * (a_new - a_small)
    assert np.isclose(m_after - m_before, expected, rtol=2e-2)


def test_pack_topography_split():
    """A topography floe enclosed by new ice splits the new floe through the
    topography centroid instead of fusing; the topography footprint is
    subtracted and never killed (create_new_ice.m:192-212)."""
    cfg = _cfg(n_boundary=1)
    topo = _circle(6e3)
    st = state_from_polygons([topo], 1.0, cfg)
    view = extract_view(st, cfg)
    a_topo = abs(poly_area(topo))
    rng = np.random.default_rng(0)
    edit = pack_pass(view, cfg, rng, h0=0.3, target=1.0, nx=1, ny=1)

    assert not edit.kills and not edit.dissolve_kills
    assert edit.new_floes
    for nf in edit.new_floes:
        ov = sum(max(poly_area(r), 0.0)
                 for r in poly_boolean(nf.poly, topo, "int"))
        assert ov < 0.01 * a_topo, "new ice must not cover topography"
        assert not nf.stress_blend


def test_pack_periodic_seam():
    """When PERIODIC, coverage accounting sees floes across the torus seam:
    a floe straddling +x must suppress packing of the matching open water at
    -x (the ghost construction of create_new_ice.m:21-66)."""
    from subzero_tpu.config import ProcessConfig

    lx = 1e5
    straddler = _circle(3e4, c=(lx, 0.0))   # centered ON the seam
    cfg_per = _cfg(processes=ProcessConfig(periodic=True))
    cfg_nop = _cfg()
    st = state_from_polygons([straddler], 0.5, cfg_per)
    rng = np.random.default_rng(5)
    edit_p = pack_pass(extract_view(st, cfg_per), cfg_per, rng, h0=0.3,
                       target=1.0, nx=4, ny=4)
    rng = np.random.default_rng(5)
    edit_n = pack_pass(extract_view(st, cfg_nop), cfg_nop, rng, h0=0.3,
                       target=1.0, nx=4, ny=4)

    # periodic: the ghost at -lx blocks some of the new ice that the
    # non-periodic pass would create there
    def area_near_minus_lx(edit):
        tot = 0.0
        for nf in edit.new_floes:
            ghost = np.asarray(nf.poly) + [2 * lx, 0.0]
            ov = sum(max(poly_area(r), 0.0)
                     for r in poly_boolean(ghost, straddler, "int"))
            tot += ov
        return tot

    assert area_near_minus_lx(edit_p) < 0.05 * area_near_minus_lx(edit_n)

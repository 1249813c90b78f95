"""Parity-integral clip (geometry/clip_integral.py) and its fused Pallas
kernel (geometry/clip_pallas.py, interpreter mode on CPU) against:

* the numpy Sutherland-Hodgman / Monte-Carlo oracles,
* the segment-midpoint reference formulation (clip.py / clip_batched.py),
* the native C++ boolean engine on a world-scale contact workload — the
  regression test for the f32 conditioning bug the pair-local frame fixed
  (midpoint classification at domain-scale coordinates lost ~40% of
  lattice contacts and produced negative areas).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.geometry import pad_polygon, pad_polygons
from subzero_tpu.geometry.clip_batched import (
    difference_stats_bm,
    overlap_stats_bm,
)
from subzero_tpu.geometry.clip_integral import (
    difference_stats_int,
    overlap_stats_int,
)
from subzero_tpu.geometry.clip_pallas import (
    difference_stats_pallas,
    overlap_stats_pallas,
)
from oracles import (
    convex_intersection_area,
    points_in_poly_np,
    mc_area,
    random_convex,
    shoelace,
)

V = 16
SQUARE = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
ELL = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float)


def dev(poly, v=V, dtype=None):
    p, _ = pad_polygon(poly, v)
    p = jnp.asarray(p)
    return p.astype(dtype) if dtype else p


def _random_batch(n=60, seed=2, scale=1.0):
    rng = np.random.default_rng(seed)
    ps, qs = [], []
    for _ in range(n):
        ps.append(scale * random_convex(rng, center=(0, 0)))
        qs.append(scale * random_convex(
            rng, center=(rng.uniform(0, 1.5), rng.uniform(-0.5, 0.5))))
    pa, _ = pad_polygons(ps, V)
    qa, _ = pad_polygons(qs, V)
    return ps, qs, jnp.asarray(pa), jnp.asarray(qa)


class TestIntegralVsOracle:
    def test_convex_overlap(self):
        ps, qs, pa, qa = _random_batch()
        want = [convex_intersection_area(p, q) for p, q in zip(ps, qs)]
        got = np.asarray(overlap_stats_int(pa, qa).area)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_convex_difference(self):
        ps, qs, pa, qa = _random_batch(seed=3)
        want = [abs(shoelace(p)) - convex_intersection_area(p, q)
                for p, q in zip(ps, qs)]
        got = np.asarray(difference_stats_int(pa, qa).area)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_concave_mc(self):
        q = SQUARE * 0.75 + np.array([1.0, 1.0])
        st = overlap_stats_int(dev(ELL)[None], dev(q)[None])

        def in_both(pts):
            return points_in_poly_np(pts, ELL) & points_in_poly_np(pts, q)

        want = mc_area(in_both, -0.5, 2.5)
        assert float(st.area[0]) == pytest.approx(want, rel=0.02)

    def test_degenerate_battery(self):
        # (P, Q, expected intersection area): the collinear/touching/shared
        # cases the +-eps carrier-line averaging must resolve exactly.
        cases = [
            (SQUARE, SQUARE.copy(), 4.0),                    # identical
            (SQUARE, SQUARE + [1.5, 0.0], 1.0),              # collinear rails
            (SQUARE, SQUARE + [2.0, 0.0], 0.0),              # shared edge
            (SQUARE, 0.25 * SQUARE, 0.25),                   # contained
            (SQUARE, SQUARE + [1.0, 1.0], 1.0),              # corner overlap
            (SQUARE, SQUARE + [5.0, 0.0], 0.0),              # disjoint
        ]
        p = jnp.stack([dev(c[0]) for c in cases])
        q = jnp.stack([dev(c[1]) for c in cases])
        got = np.asarray(overlap_stats_int(p, q).area)
        np.testing.assert_allclose(got, [c[2] for c in cases], atol=1e-9)

    def test_matches_midpoint_formulation(self):
        # Pair-local-scale coordinates: both formulations are accurate and
        # must agree to roundoff, including chord and crossing count.
        _, _, pa, qa = _random_batch(seed=4)
        a = overlap_stats_int(pa, qa)
        b = overlap_stats_bm(pa, qa)
        np.testing.assert_allclose(a.area, b.area, atol=1e-9)
        np.testing.assert_allclose(a.chord_p, b.chord_p, atol=1e-9)
        np.testing.assert_array_equal(a.n_cross, b.n_cross)
        d = difference_stats_int(pa, qa)
        e = difference_stats_bm(pa, qa)
        np.testing.assert_allclose(d.area, e.area, atol=1e-9)

    def test_chord_antisymmetry(self):
        _, _, pa, qa = _random_batch(seed=5)
        st_pq = overlap_stats_int(pa, qa)
        st_qp = overlap_stats_int(qa, pa)
        np.testing.assert_allclose(st_pq.chord_p, -st_qp.chord_p, atol=1e-9)
        np.testing.assert_allclose(st_pq.area, st_qp.area, atol=1e-9)


class TestPallasKernel:
    """Interpreter-mode equivalence (the TPU lowering is exercised by
    bench.py / __graft_entry__ on hardware)."""

    def test_overlap_matches_integral(self):
        _, _, pa, qa = _random_batch(n=80, seed=6, scale=1000.0)
        pa32 = pa.astype(jnp.float32)
        qa32 = qa.astype(jnp.float32)
        a = overlap_stats_int(pa32, qa32)
        b = overlap_stats_pallas(pa32, qa32, interpret=True)
        scale = float(jnp.max(jnp.abs(a.area)))
        np.testing.assert_allclose(b.area, a.area, atol=1e-5 * scale)
        np.testing.assert_allclose(b.chord_p, a.chord_p, atol=1e-2)
        np.testing.assert_array_equal(b.n_cross, a.n_cross)

    def test_difference_matches_integral(self):
        _, _, pa, qa = _random_batch(n=80, seed=7, scale=1000.0)
        pa32 = pa.astype(jnp.float32)
        qa32 = qa.astype(jnp.float32)
        a = difference_stats_int(pa32, qa32)
        b = difference_stats_pallas(pa32, qa32, interpret=True)
        scale = float(jnp.max(jnp.abs(a.area)))
        np.testing.assert_allclose(b.area, a.area, atol=1e-5 * scale)

    def test_block_padding(self):
        # batch not a multiple of the block size
        _, _, pa, qa = _random_batch(n=13, seed=8)
        a = overlap_stats_int(pa.astype(jnp.float32), qa.astype(jnp.float32))
        b = overlap_stats_pallas(pa.astype(jnp.float32),
                                 qa.astype(jnp.float32),
                                 block=128, interpret=True)
        np.testing.assert_allclose(b.area, a.area, atol=1e-5)

    def test_mixed_vertex_capacity(self):
        # boundary-contact shape: Vp != Vq
        p, _ = pad_polygon(1000 * SQUARE + [500.0, 0.0], 16)
        q, _ = pad_polygon(1000 * SQUARE, 8)
        a = difference_stats_int(
            jnp.asarray(p, jnp.float32)[None], jnp.asarray(q, jnp.float32)[None])
        b = difference_stats_pallas(
            jnp.asarray(p, jnp.float32)[None], jnp.asarray(q, jnp.float32)[None],
            interpret=True)
        np.testing.assert_allclose(b.area, a.area, rtol=1e-5)


class TestWorldScaleContactVsNative:
    """The production contact path (pair-local frame + integral clip, f32)
    against the exact native C++ boolean engine on a dense lattice pack at
    world coordinates — the configuration that exposed the midpoint
    formulation's conditioning failure."""

    def test_lattice_overlaps_match_native(self):
        import jax

        from subzero_tpu import SimConfig
        from subzero_tpu.config import (
            CapacityConfig, DomainConfig, NumericsConfig, ProcessConfig,
        )
        from subzero_tpu.dynamics.broadphase import neighbor_candidates
        from subzero_tpu.dynamics.contact import contact_forces
        from subzero_tpu.native import poly_area, poly_boolean
        from subzero_tpu.state import state_from_polygons

        n_floes, pitch = 256, 4000.0
        side = int(np.sqrt(n_floes))
        lx = side * pitch / 2
        cfg = SimConfig(
            capacity=CapacityConfig(max_floes=n_floes, max_verts=16,
                                    max_neighbors=8, n_mc_points=32,
                                    stress_window=8),
            numerics=NumericsConfig(dtype="float32"),
            domain=DomainConfig(lx=lx, ly=lx),
            processes=ProcessConfig(periodic=True),
        )
        rng = np.random.default_rng(0)
        sq = 0.5 * np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
        polys = []
        for k in range(n_floes):
            i, j = divmod(k, side)
            c = np.array([-lx + (j + 0.5) * pitch, -lx + (i + 0.5) * pitch])
            polys.append(sq * pitch * 0.97
                         + rng.uniform(-0.03, 0.03, (4, 2)) * pitch + c)
        state = state_from_polygons(polys, 0.5, cfg)
        verts = jax.jit(lambda s: s.verts_world())(state)
        nbr = neighbor_candidates(state.x, state.y, state.rmax, state.alive,
                                  8, True, lx, lx)
        pc = jax.jit(
            lambda s, v, nb: contact_forces(
                v, s.x, s.y, s.u, s.v, s.ksi, s.h, s.area, nb, 1.6e8, cfg)
        )(state, verts, nbr)

        nv = np.asarray(state.nv)
        idx = np.asarray(nbr.idx)
        vj = np.asarray(verts)[idx] + np.asarray(nbr.shift)[:, :, None, :]
        vi = np.asarray(verts)
        got = np.asarray(pc.overlap)
        valid = np.asarray(nbr.valid)
        checked = 0
        for i in range(n_floes):
            for k in range(8):
                if not valid[i, k]:
                    continue
                regs = poly_boolean(vi[i][: nv[i]], vj[i, k][: nv[idx[i, k]]],
                                    "int")
                exact = sum(abs(poly_area(r)) for r in regs)
                # the small-region cull (floe_interactions.m:79-83) zeroes
                # contacts below Amin = min(N1,N2)*100/1.75
                amin = min(nv[i], nv[idx[i, k]]) * cfg.contact.small_region_coeff
                if exact < 1.2 * amin:
                    continue
                assert got[i, k] == pytest.approx(exact, rel=5e-3, abs=50.0), (
                    f"pair ({i},{k}): got {got[i, k]}, exact {exact}"
                )
                checked += 1
        assert checked > 50  # the lattice must actually be in contact

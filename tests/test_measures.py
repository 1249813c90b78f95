"""Tests for InterX/p_poly_dist/cutpolygon equivalents + dissolved advection
+ batch-minor clip equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.geometry import (
    cut_polygon, pad_polygon, pad_polygons, point_poly_dist,
    segment_intersections, overlap_stats, overlap_stats_bm,
    difference_stats, difference_stats_bm,
)

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def dev(p, v=16):
    arr, _ = pad_polygon(p, v)
    return jnp.asarray(arr)


class TestSegmentIntersections:
    def test_two_squares(self):
        q = SQ + [1.0, 1.0]
        pts, valid, n = segment_intersections(dev(SQ), dev(q), 8)
        assert int(n) == 2
        got = sorted(map(tuple, np.asarray(pts)[np.asarray(valid)].tolist()))
        assert got == [(0.0, 1.0), (1.0, 0.0)]


class TestPointPolyDist:
    def test_signs_and_values(self):
        pts = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [1.0, 1.0], [0.0, 0.5]])
        d = np.asarray(point_poly_dist(pts, dev(SQ)))
        assert d[0] == pytest.approx(-1.0)   # center: 1 inside
        assert d[1] == pytest.approx(1.0)    # outside, 1 from x=1 wall
        assert d[2] == pytest.approx(0.0, abs=1e-12)  # on the corner
        assert d[3] == pytest.approx(-0.5)


class TestCutPolygon:
    def test_halves(self):
        top = cut_polygon(SQ, [0, 0], [1, 0], 1)
        bot = cut_polygon(SQ, [0, 0], [1, 0], 2)
        from oracles import shoelace

        assert abs(shoelace(top)) == pytest.approx(2.0)
        assert abs(shoelace(bot)) == pytest.approx(2.0)
        assert top[:, 1].min() >= 0
        assert bot[:, 1].max() <= 0


class TestBatchMinorEquivalence:
    def test_matches_reference_kernel(self):
        rng = np.random.default_rng(5)
        from oracles import random_convex

        ps, qs = [], []
        for _ in range(32):
            ps.append(random_convex(rng))
            qs.append(random_convex(rng, center=(rng.uniform(0, 1.5), 0.1)))
        pa, _ = pad_polygons(ps, 16)
        qa, _ = pad_polygons(qs, 16)
        P, Q = jnp.asarray(pa), jnp.asarray(qa)
        a = overlap_stats(P, Q)
        b = overlap_stats_bm(P, Q)
        np.testing.assert_allclose(b.area, a.area, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(b.chord_p, a.chord_p, atol=1e-12)
        np.testing.assert_array_equal(b.n_cross, a.n_cross)
        da = difference_stats(P, Q)
        db = difference_stats_bm(P, Q)
        np.testing.assert_allclose(db.area, da.area, rtol=1e-12, atol=1e-12)


class TestDissolvedAdvection:
    def test_mass_moves_downstream(self):
        from subzero_tpu import SimConfig
        from subzero_tpu.dissolved import advect_dissolved
        from subzero_tpu.forcing import uniform_forcing

        cfg = SimConfig()
        forcing = uniform_forcing(lx=4e5, uo=0.5)
        vd = jnp.zeros((10, 10)).at[5, 2].set(1000.0)
        tend = jnp.zeros((10, 10))
        m0 = float(vd.sum())
        for _ in range(200):
            vd, tend = advect_dissolved(vd, tend, forcing, cfg, 100.0, 10, 10)
        com_x = float(jnp.sum(vd * jnp.arange(10)[None, :]) / jnp.sum(vd))
        assert com_x > 2.1  # drifted east
        assert float(vd.sum()) == pytest.approx(m0, rel=0.05)
        assert float(vd.min()) >= 0.0

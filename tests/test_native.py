"""Native polygon-boolean engine tests: exact cases + cross-validation
against the device boundary-integral kernel and the convex oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.native import poly_area, poly_boolean, union_all
from subzero_tpu.geometry import overlap_stats, difference_stats, pad_polygons
from oracles import convex_intersection_area, random_convex, shoelace

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
ELL = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float)


def area_of(contours):
    return sum(poly_area(c) for c in contours)


class TestExactCases:
    def test_intersection(self):
        assert area_of(poly_boolean(SQ, SQ + [1.0, 1.0], "int")) == pytest.approx(1.0)

    def test_intersection_collinear(self):
        assert area_of(poly_boolean(SQ, SQ + [1.5, 0.0], "int")) == pytest.approx(1.0)

    def test_union(self):
        assert area_of(poly_boolean(SQ, SQ + [1.0, 1.0], "uni")) == pytest.approx(7.0)

    def test_union_touching_fuses(self):
        r = poly_boolean(SQ, SQ + [2.0, 0.0], "uni")
        assert len(r) == 1
        assert area_of(r) == pytest.approx(8.0)

    def test_difference(self):
        assert area_of(poly_boolean(SQ, SQ + [1.0, 1.0], "dif")) == pytest.approx(3.0)

    def test_difference_hole(self):
        r = poly_boolean(SQ, 0.5 * SQ, "dif")
        assert len(r) == 2  # outer + CW hole
        assert area_of(r) == pytest.approx(3.0)
        areas = sorted(poly_area(c) for c in r)
        assert areas[0] == pytest.approx(-1.0)  # hole is CW
        assert areas[1] == pytest.approx(4.0)

    def test_xor(self):
        assert area_of(poly_boolean(SQ, SQ + [1.0, 1.0], "xor")) == pytest.approx(6.0)

    def test_disjoint(self):
        assert poly_boolean(SQ, SQ + [5.0, 0.0], "int") == []
        r = poly_boolean(SQ, SQ + [5.0, 0.0], "uni")
        assert len(r) == 2 and area_of(r) == pytest.approx(8.0)

    def test_concave(self):
        r = poly_boolean(ELL, 0.75 * SQ + [1.0, 1.0], "int")
        assert area_of(r) == pytest.approx(1.6875)

    def test_multi_region_intersection(self):
        ushape = np.array(
            [[0, 0], [3, 0], [3, 2], [2, 2], [2, 1], [1, 1], [1, 2], [0, 2]],
            dtype=float,
        )
        bar = np.array([[-0.5, 1.2], [2.5, 1.2], [2.5, 1.8], [-0.5, 1.8]])
        r = poly_boolean(ushape, bar, "int")
        assert len(r) == 2
        assert area_of(r) == pytest.approx(0.9)

    def test_union_all(self):
        r = union_all([SQ, SQ + [1.5, 0.0], SQ + [3.0, 0.0]])
        assert len(r) == 1
        assert area_of(r) == pytest.approx(4 + 3 + 3)

    def test_km_scale(self):
        p = 2000.0 * SQ
        q = 2000.0 * SQ + [3000.0, 0.0]
        assert area_of(poly_boolean(p, q, "int")) == pytest.approx(4e6)


class TestCrossValidation:
    def test_vs_convex_oracle_and_device_kernel(self):
        rng = np.random.default_rng(7)
        ps, qs = [], []
        for _ in range(50):
            ps.append(random_convex(rng, center=(0, 0)))
            qs.append(random_convex(
                rng, center=(rng.uniform(0, 1.4), rng.uniform(-0.4, 0.4))))
        pa, _ = pad_polygons(ps, 16)
        qa, _ = pad_polygons(qs, 16)
        dev_int = np.asarray(overlap_stats(jnp.asarray(pa), jnp.asarray(qa)).area)
        dev_dif = np.asarray(difference_stats(jnp.asarray(pa), jnp.asarray(qa)).area)
        for i in range(50):
            oracle = convex_intersection_area(ps[i], qs[i])
            nat_int = area_of(poly_boolean(ps[i], qs[i], "int"))
            nat_dif = area_of(poly_boolean(ps[i], qs[i], "dif"))
            assert nat_int == pytest.approx(oracle, abs=1e-9)
            assert nat_int == pytest.approx(float(dev_int[i]), abs=1e-8)
            assert nat_dif == pytest.approx(float(dev_dif[i]), abs=1e-8)

    def test_inclusion_exclusion_random(self):
        """area(P) + area(Q) == area(P u Q) + area(P n Q), concave included."""
        rng = np.random.default_rng(8)
        for i in range(25):
            p = random_convex(rng, n=10)
            q = ELL * rng.uniform(0.3, 1.0) + rng.uniform(-1, 1, 2)
            a_p = abs(shoelace(p))
            a_q = poly_area(q)
            uni = area_of(poly_boolean(p, q, "uni"))
            inter = area_of(poly_boolean(p, q, "int"))
            assert a_p + a_q == pytest.approx(uni + inter, abs=1e-9), f"case {i}"

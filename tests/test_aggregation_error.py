"""Quantify the contact-model deltas on concave floe pairs vs the serial
oracle (VERDICT round-1 item 2, closed in round 2 by per-region contacts).

The reference applies one force per disjoint overlap region
(floe_interactions.m:92-190).  Two device modes are measured against the
serial oracle on an ensemble of random concave (star-perturbed) pairs:

* aggregate (per_region=False): ONE force per floe pair (areas summed,
  chord summed, centroid area-weighted) — exact for convex pairs, the
  measured envelope below for concave multi-region ones.
* per-region (per_region=True): on-device Weiler-Atherton decomposition
  (geometry/regions.py), one force per region with the per-region cull —
  machine-precision agreement except for two documented reference quirks:
  the displace-and-reclip flip heuristic (floe_interactions.m:139-165),
  whose 1 m probe displacement can change region topology and reverse the
  physically-correct push-out direction, and the tangential length scale
  (reference: mean on-boundary edge length; device: region chord length)
  on regions with more than two crossings.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from subzero_tpu.config import (
    CapacityConfig, ContactConfig, NumericsConfig, PhysicsConfig,
    ProcessConfig, SimConfig,
)
from subzero_tpu.dynamics.broadphase import neighbor_candidates
from subzero_tpu.dynamics.contact import contact_forces
from subzero_tpu.oracle import floe_interactions, floes_from_state
from subzero_tpu.state import state_from_polygons


def _star(rng, r_mean, n_arms, c=(0.0, 0.0), rough=0.45):
    """Random concave star polygon."""
    n = 2 * n_arms
    th = np.linspace(0, 2 * np.pi, n + 1)[:-1] + rng.uniform(0, np.pi / n)
    r = r_mean * (1 + rough * np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
                  + rng.uniform(-0.1, 0.1, n))
    return np.stack([c[0] + r * np.cos(th), c[1] + r * np.sin(th)], axis=1)


def _ensemble_errors(cfg, n_trials=60, seed=42):
    """Relative force error vs the per-region oracle over random star pairs.

    Returns (rel_err array, n multi-region pairs, n checked).
    """
    rng = np.random.default_rng(seed)
    modulus = 9e7
    dt = cfg.numerics.dt

    rel_err = []
    multi_region = 0
    checked = 0
    for _ in range(n_trials):
        p1 = _star(rng, 6e3, rng.integers(5, 9))
        # second floe offset so the stars interlock partially
        off = rng.uniform(0.7, 1.3) * 9e3
        ang = rng.uniform(0, 2 * np.pi)
        p2 = _star(rng, 6e3, rng.integers(5, 9),
                   c=(off * np.cos(ang), off * np.sin(ang)))
        vel = rng.uniform(-0.2, 0.2, (2, 2))
        st = state_from_polygons([p1, p2], 0.5, cfg, velocities=vel)

        # oracle: per-region forces, small-region cull, reference normals
        floes = floes_from_state(st, cfg, n=2)
        dom = np.array([[-1e5, -1e5], [1e5, -1e5], [1e5, 1e5], [-1e5, 1e5]])
        forces, _, ovl, _ = floe_interactions(
            floes[0], floes[1].c_world(), floes[1], dom, False, modulus,
            dt, cfg)
        f_oracle = forces.sum(axis=0) if len(forces) else np.zeros(2)
        if len(forces) == 0:
            continue
        if len(forces) > 1:
            multi_region += 1

        verts = np.asarray(st.verts_world())
        nbr = neighbor_candidates(st.x, st.y, st.rmax, st.alive, 4, False,
                                  1e5, 1e5)
        pc = contact_forces(verts, st.x, st.y, st.u, st.v, st.ksi,
                            st.h, st.area, nbr, modulus, cfg,
                            nv=st.nv)
        f_dev = np.array([float(pc.fx[0].sum()), float(pc.fy[0].sum())])

        mag = np.linalg.norm(f_oracle)
        if mag == 0:
            continue
        rel_err.append(np.linalg.norm(f_dev - f_oracle) / mag)
        checked += 1

    return np.array(rel_err), multi_region, checked


_BASE = SimConfig(
    physics=PhysicsConfig(ocean_coupling=False),
    processes=ProcessConfig(collision=True, corners=False),
    numerics=NumericsConfig(dtype="float64"),
    capacity=CapacityConfig(max_floes=8, max_neighbors=4, max_verts=32),
    # aggregate mode (per_region=True is the SimConfig default)
    contact=ContactConfig(per_region=False),
)


def test_concave_aggregation_error_ensemble():
    rel_err, multi_region, checked = _ensemble_errors(_BASE)
    assert checked >= 25, f"ensemble too small ({checked})"
    assert multi_region >= 3, "ensemble must include multi-region contacts"
    med = float(np.median(rel_err))
    p90 = float(np.quantile(rel_err, 0.9))
    print(f"\naggregation error over {checked} concave pairs "
          f"({multi_region} multi-region): median {med:.3f}, "
          f"90th pct {p90:.3f}, max {rel_err.max():.3f}")
    # measured envelope (documented in validation/GOLDEN.md): single-region
    # concave contacts agree closely; multi-region aggregation stays within
    # order-one of the per-region reference force
    assert med < 0.05
    assert p90 < 0.25


def test_per_region_closes_the_gap():
    cfg = dataclasses.replace(
        _BASE, contact=ContactConfig(per_region=True, region_cap=16))
    rel_err, multi_region, checked = _ensemble_errors(cfg)
    assert checked >= 25
    assert multi_region >= 3
    med = float(np.median(rel_err))
    p90 = float(np.quantile(rel_err, 0.9))
    big = int((rel_err > 0.05).sum())
    print(f"\nper-region error over {checked} concave pairs "
          f"({multi_region} multi-region): median {med:.2e}, "
          f"90th pct {p90:.2e}, >5% outliers {big}")
    # measured (2026-08-20, f64): median 3.9e-14, p90 5.9e-3, 3/60 outliers
    # (the reference flip-heuristic quirk, see module docstring)
    assert med < 1e-9, "consistent decompositions must match to roundoff"
    assert p90 < 0.02
    assert big <= max(3, checked // 15)


def test_reference_edge_mean_length_scale():
    """ContactConfig.region_dl='edge_mean' uses the reference's exact
    tangential length scale dl = mean on-boundary edge length
    (floe_interactions.m:126-131) instead of the chord norm.  Measured
    (2026-08-20, f64, region_cap=16): median 1.5e-15, p90 5.3e-3 (vs
    5.9e-3 chord) — the residual outliers are the displace-and-reclip
    direction quirk, not the length scale."""
    cfg = dataclasses.replace(
        _BASE, contact=ContactConfig(per_region=True, region_cap=16,
                                     region_dl="edge_mean"))
    rel_err, multi_region, checked = _ensemble_errors(cfg)
    assert checked >= 25
    med = float(np.median(rel_err))
    p90 = float(np.quantile(rel_err, 0.9))
    assert med < 1e-9
    assert p90 < 0.02
    assert int((rel_err > 0.05).sum()) <= max(3, checked // 15)


def test_reference_exact_reclip_closes_the_outliers():
    """Both reference-exact knobs on (region_dl='edge_mean' +
    normal_dir='reclip'): the displace-and-reclip probe reproduces the
    reference's finite-displacement direction flips, so the remaining
    ensemble outliers (3/60 with the analytic direction) must shrink."""
    cfg = dataclasses.replace(
        _BASE, contact=ContactConfig(per_region=True, region_cap=16,
                                     region_dl="edge_mean",
                                     normal_dir="reclip"))
    rel_err, multi_region, checked = _ensemble_errors(cfg)
    assert checked >= 25
    med = float(np.median(rel_err))
    p90 = float(np.quantile(rel_err, 0.9))
    big = int((rel_err > 0.05).sum())
    print(f"\nreclip error over {checked} concave pairs: median {med:.2e}, "
          f"90th pct {p90:.2e}, >5% outliers {big}")
    assert med < 1e-9
    # the flip quirk is reproduced; outliers must not exceed the analytic
    # mode's (and should be fewer)
    assert big <= 1
    assert p90 < 5e-3

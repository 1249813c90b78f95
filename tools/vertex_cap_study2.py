"""Vertex-cap fidelity study v2 — matched-seed ensemble + noise floor.

Round-4 VERDICT next #2: the single-run cap-32-vs-64 comparison (FSD L1
0.368 over 2000 winter steps, tools/vertex_cap_study.py) cannot separate
the cap's physical effect from chaotic divergence.  This version runs

  * an ensemble of N_SEEDS matched seeds at max_verts = 32 and 64
    (paired: same seed -> same initial tessellation, truncated per cap),
  * a NOISE FLOOR: the same seed/cap with perturbed lifecycle RNG streams
    (identical initial state and physics; only the corner/fracture/weld
    random draws differ) — pure chaotic divergence,

and compares the paired cross-cap FSD/ITD deltas against (a) the
noise-floor spread and (b) the seed-to-seed spread at fixed cap.  It also
records each run's wall time + phase breakdown so the cap-64 cost is
attributed (device V^2 vs host passes).

Usage: python tools/vertex_cap_study2.py [--steps=N] [--seeds=K]
                                         [--platform=cpu|tpu]
Appends results to validation/VERTEX_CAP.md.
"""

from __future__ import annotations

import dataclasses
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

_PLATFORM = "cpu"
for a in sys.argv[1:]:
    if a.startswith("--platform"):
        _PLATFORM = a.split("=")[1]
if _PLATFORM != "tpu":
    jax.config.update("jax_platforms", _PLATFORM)
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np  # noqa: E402

STEPS = 1000
N_SEEDS = 5
N_NOISE = 3
for a in sys.argv[1:]:
    if a.startswith("--steps"):
        STEPS = int(a.split("=")[1])
    if a.startswith("--seeds"):
        N_SEEDS = int(a.split("=")[1])


def build(max_verts: int, seed: int, lc_seed: "int | None" = None):
    from subzero_tpu.init import voronoi_floe_field
    from subzero_tpu.sim import Simulation
    from subzero_tpu.state import state_from_polygons
    from subzero_tpu.validation import winter_sim

    ref = winter_sim(n_floes=100, seed=seed)
    cfg = ref.cfg.replace(capacity=dataclasses.replace(
        ref.cfg.capacity, max_verts=max_verts))
    polys, heights = voronoi_floe_field(
        cfg, 1.0, 100, height_mean=0.25, height_delta=0.0, seed=seed)
    st = state_from_polygons(polys, heights, cfg, seed=seed)
    sim = Simulation(cfg=cfg, state=st, forcing=ref.forcing,
                     modulus=ref.modulus, heat_flux=ref.heat_flux,
                     seed=seed)
    if lc_seed is not None:
        sim.lifecycle.rng = np.random.default_rng(lc_seed)
    return sim


def run_case(max_verts: int, seed: int, lc_seed=None):
    sim = build(max_verts, seed, lc_seed)
    t0 = time.time()
    sim.run(STEPS)
    wall = time.time() - t0
    alive = np.asarray(sim.state.alive)
    return {
        "areas": np.asarray(sim.state.area)[alive],
        "h": np.asarray(sim.state.h)[alive],
        "n": int(alive.sum()),
        "ledger": (sim.total_mass() + float(np.sum(sim.dissolved))
                   + sim.lifecycle.exported_mass),
        "wall": wall,
        "phases": dict(sim.phase_times),
    }


# shared histogram edges across EVERY run in the study, so L1 distances
# are comparable (per-pair edges would change the metric between pairs)
_FSD_EDGES = np.logspace(4, 9, 21)      # m^2
_ITD_EDGES = np.linspace(0.0, 1.5, 21)  # m


def _l1(a, b, edges, key):
    ha, _ = np.histogram(a[key], bins=edges)
    hb, _ = np.histogram(b[key], bins=edges)
    return float(np.abs(ha - hb).sum()) / max(ha.sum(), hb.sum(), 1)


def fsd_l1(a, b):
    return _l1(a, b, _FSD_EDGES, "areas")


def itd_l1(a, b):
    return _l1(a, b, _ITD_EDGES, "h")


def main():
    res = {32: {}, 64: {}}
    for mv in (32, 64):
        for s in range(N_SEEDS):
            t0 = time.time()
            res[mv][s] = run_case(mv, seed=s)
            print(f"[study2] cap={mv} seed={s}: {res[mv][s]['n']} floes, "
                  f"{res[mv][s]['wall']:.0f}s", flush=True)

    # noise floor: fixed cap 32, seed 0, perturbed lifecycle RNG
    noise = [res[32][0]] + [
        run_case(32, seed=0, lc_seed=1000 + k) for k in range(N_NOISE)]
    print(f"[study2] noise-floor runs done", flush=True)

    paired_fsd = [fsd_l1(res[32][s], res[64][s]) for s in range(N_SEEDS)]
    paired_itd = [itd_l1(res[32][s], res[64][s]) for s in range(N_SEEDS)]
    noise_fsd = [fsd_l1(a, b) for a, b in itertools.combinations(noise, 2)]
    noise_itd = [itd_l1(a, b) for a, b in itertools.combinations(noise, 2)]
    seed_fsd32 = [fsd_l1(res[32][a], res[32][b])
                  for a, b in itertools.combinations(range(N_SEEDS), 2)]
    seed_fsd64 = [fsd_l1(res[64][a], res[64][b])
                  for a, b in itertools.combinations(range(N_SEEDS), 2)]

    def stats(v):
        return f"{np.mean(v):.3f} ± {np.std(v):.3f} (n={len(v)})"

    wall32 = np.mean([res[32][s]["wall"] for s in range(N_SEEDS)])
    wall64 = np.mean([res[64][s]["wall"] for s in range(N_SEEDS)])

    def phase_sum(mv, key):
        return np.mean([res[mv][s]["phases"].get(key, 0.0)
                        for s in range(N_SEEDS)])

    lines = [
        f"\n## Ensemble v2 — {time.strftime('%Y-%m-%d %H:%M')}, "
        f"{STEPS} steps x {N_SEEDS} seeds, winter config, "
        f"platform {jax.devices()[0].platform}\n",
        f"- paired cap-32-vs-64 FSD L1 (same seed): {stats(paired_fsd)}",
        f"- paired cap-32-vs-64 ITD L1 (same seed): {stats(paired_itd)}",
        f"- NOISE FLOOR FSD L1 (cap 32, same seed, perturbed lifecycle "
        f"RNG): {stats(noise_fsd)}",
        f"- NOISE FLOOR ITD L1: {stats(noise_itd)}",
        f"- seed-to-seed FSD L1 at cap 32: {stats(seed_fsd32)}",
        f"- seed-to-seed FSD L1 at cap 64: {stats(seed_fsd64)}",
        f"- floes after {STEPS} steps: cap 32 "
        f"{[res[32][s]['n'] for s in range(N_SEEDS)]}, cap 64 "
        f"{[res[64][s]['n'] for s in range(N_SEEDS)]}",
        f"- ledger [kg]: cap 32 mean "
        f"{np.mean([res[32][s]['ledger'] for s in range(N_SEEDS)]):.4e}, "
        f"cap 64 mean "
        f"{np.mean([res[64][s]['ledger'] for s in range(N_SEEDS)]):.4e}",
        f"- wall: cap 32 {wall32:.0f}s, cap 64 {wall64:.0f}s "
        f"({wall64 / max(wall32, 1e-9):.2f}x); chunk phase "
        f"{phase_sum(32, 'chunk'):.0f}s vs {phase_sum(64, 'chunk'):.0f}s, "
        f"lifecycle {phase_sum(32, 'lifecycle'):.0f}s vs "
        f"{phase_sum(64, 'lifecycle'):.0f}s",
    ]
    out = "\n".join(lines)
    with open(Path(__file__).resolve().parent.parent / "validation" /
              "VERTEX_CAP.md", "a") as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()

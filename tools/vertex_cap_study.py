"""Vertex-cap fidelity study (round-3 VERDICT weak #7).

Every birth is trimmed to ``CapacityConfig.max_verts`` by ``_cap_vertices``,
whereas the reference lets polyshape vertex counts float free between
FloeSimplify passes (Subzero.m:169-217 simplifies only floes that exceed 30
vertices, every nSimp=20 steps).  This tool quantifies what the cap costs:
it runs the winter configuration at max_verts = 32 (production default) and
64 (FloeSimplify governs, cap nearly never binds) for the same steps/seed
and compares

  * floe count + FSD (area histogram over shared bins)
  * ITD (thickness histogram)
  * total collisions accumulated
  * mass ledger (floes + dissolved + exported)

Usage: python tools/vertex_cap_study.py [--steps=N] [--platform=cpu|tpu]
Appends a results table to validation/VERTEX_CAP.md.
"""

from __future__ import annotations

import dataclasses
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

STEPS = 2000
for a in sys.argv[1:]:
    if a.startswith("--steps"):
        STEPS = int(a.split("=")[1])


def run_case(max_verts: int, steps: int):
    sim = _rebuild(max_verts)
    collisions = {"n": 0}

    def on_chunk(s, auxes):
        collisions["n"] += int(np.max(np.asarray(auxes.n_collisions)))

    t0 = time.time()
    sim.run(steps, on_chunk=on_chunk)
    wall = time.time() - t0
    alive = np.asarray(sim.state.alive)
    areas = np.asarray(sim.state.area)[alive]
    h = np.asarray(sim.state.h)[alive]
    nv = np.asarray(sim.state.nv)[alive]
    ledger = (sim.total_mass() + float(np.sum(sim.dissolved))
              + sim.lifecycle.exported_mass)
    return {
        "max_verts": max_verts,
        "steps": steps,
        "wall_s": wall,
        "n_floes": int(alive.sum()),
        "areas": areas,
        "h": h,
        "nv_mean": float(nv.mean()),
        "nv_max": int(nv.max()),
        "collisions": collisions["n"],
        "ledger": ledger,
    }


def _rebuild(max_verts: int):
    """winter_sim with a different vertex cap (same seed/physics)."""
    from subzero_tpu.validation import winter_sim

    sim2 = winter_sim(n_floes=100, seed=0)
    cfg = sim2.cfg.replace(capacity=dataclasses.replace(
        sim2.cfg.capacity, max_verts=max_verts))
    from subzero_tpu.init import voronoi_floe_field
    from subzero_tpu.state import state_from_polygons

    polys, heights = voronoi_floe_field(
        cfg, 1.0, 100, height_mean=0.25, height_delta=0.0, seed=0)
    st = state_from_polygons(polys, heights, cfg, seed=0)
    from subzero_tpu.sim import Simulation

    return Simulation(cfg=cfg, state=st, forcing=sim2.forcing,
                      modulus=sim2.modulus, heat_flux=sim2.heat_flux,
                      seed=0)


def main():
    out = []
    results = {}
    for mv in (32, 64):
        print(f"[study] running max_verts={mv} for {STEPS} steps...",
              flush=True)
        results[mv] = run_case(mv, STEPS)
        r = results[mv]
        print(f"[study] max_verts={mv}: {r['n_floes']} floes, "
              f"ledger {r['ledger']:.6e}, {r['wall_s']:.0f}s", flush=True)

    a, b = results[32], results[64]
    # shared FSD bins
    all_areas = np.concatenate([a["areas"], b["areas"]])
    edges = np.logspace(np.log10(max(all_areas.min(), 1.0)),
                        np.log10(all_areas.max() + 1), 21)
    fsd_a, _ = np.histogram(a["areas"], bins=edges)
    fsd_b, _ = np.histogram(b["areas"], bins=edges)
    fsd_l1 = float(np.abs(fsd_a - fsd_b).sum()) / max(fsd_a.sum(), 1)
    h_edges = np.linspace(0.0, max(a["h"].max(), b["h"].max()) * 1.05, 21)
    itd_a, _ = np.histogram(a["h"], bins=h_edges)
    itd_b, _ = np.histogram(b["h"], bins=h_edges)
    itd_l1 = float(np.abs(itd_a - itd_b).sum()) / max(itd_a.sum(), 1)

    lines = [
        f"\n## Run {time.strftime('%Y-%m-%d %H:%M')} — {STEPS} steps, "
        f"winter config, platform {jax.devices()[0].platform}\n",
        "| metric | max_verts=32 | max_verts=64 |",
        "|---|---|---|",
        f"| live floes | {a['n_floes']} | {b['n_floes']} |",
        f"| mean vertex count | {a['nv_mean']:.1f} | {b['nv_mean']:.1f} |",
        f"| max vertex count | {a['nv_max']} | {b['nv_max']} |",
        f"| collisions (sum of chunk maxima) | {a['collisions']} "
        f"| {b['collisions']} |",
        f"| mass ledger [kg] | {a['ledger']:.6e} | {b['ledger']:.6e} |",
        f"| wall [s] | {a['wall_s']:.0f} | {b['wall_s']:.0f} |",
        "",
        f"FSD L1 difference (fraction of floes binned differently): "
        f"{fsd_l1:.3f}",
        f"ITD L1 difference: {itd_l1:.3f}",
        f"ledger relative difference: "
        f"{abs(a['ledger'] - b['ledger']) / a['ledger']:.2e}",
    ]
    p = Path(__file__).resolve().parent.parent / "validation" / \
        "VERTEX_CAP.md"
    if not p.exists():
        p.write_text(
            "# Vertex-cap fidelity study\n\n"
            "Cost of the fixed 32-vertex buffer cap vs a 64-vertex cap "
            "where FloeSimplify (30-vertex threshold, Subzero.m:185) "
            "governs shape complexity instead (round-3 VERDICT weak #7).\n"
        )
    with open(p, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()

"""Host-lifecycle pass wall-times at bench scale (round-3, VERDICT weak #6).

Builds the 10k-floe dense periodic pack (same generator as bench.py), takes
one HostView extraction, and times each lifecycle pass end-to-end,
including apply_edits device scatter.  Results go into BASELINE.md.

Usage: python tools/bench_lifecycle.py [n_floes]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(n_floes: int = 10240):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    cfg, state, _ = bench.build(n_floes, cap_factor=1.25)
    from subzero_tpu.processes.host import (
        apply_edits, candidate_pairs, extract_view,
    )
    from subzero_tpu.processes.simplify import simplify_pass
    from subzero_tpu.processes.ridge_raft import ridge_raft_pass
    from subzero_tpu.processes.fracture import fracture_pass
    from subzero_tpu.processes.weld import weld_pass
    from subzero_tpu.processes.pack import pack_pass
    from subzero_tpu.diagnostics import coverage_fraction

    rng = np.random.default_rng(0)
    dom = np.array([[-cfg.domain.lx, -cfg.domain.ly],
                    [cfg.domain.lx, -cfg.domain.ly],
                    [cfg.domain.lx, cfg.domain.ly],
                    [-cfg.domain.lx, cfg.domain.ly]])

    rows = []

    def bench_pass(name, fn, n_rep=3):
        ts = []
        for _ in range(n_rep):
            t0 = time.time()
            out = fn()
            ts.append(time.time() - t0)
        rows.append((name, min(ts)))
        print(f"{name:30s} {min(ts)*1e3:10.1f} ms")
        return out

    t0 = time.time()
    view = extract_view(state, cfg)
    print(f"{'extract_view':30s} {(time.time()-t0)*1e3:10.1f} ms")

    pairs = bench_pass("candidate_pairs",
                       lambda: candidate_pairs(view, cfg))
    print(f"  ({len(pairs)} pairs)")
    bench_pass("simplify_pass", lambda: simplify_pass(view, cfg, []))
    bench_pass("ridge_raft_pass(ridge)",
               lambda: ridge_raft_pass(view, cfg, rng, "ridge", dom))
    bench_pass("fracture_pass", lambda: fracture_pass(view, cfg, rng))
    bench_pass("weld_pass",
               lambda: weld_pass(view, cfg, rng, 3, 3,
                                 float(np.max(view.area)) / 3))
    bench_pass("coverage_fraction(40x40)",
               lambda: coverage_fraction(state, cfg, 40, 40))
    # Packing grid scaled with the pack so per-cell occupancy matches the
    # reference configurations (~5-10 floes/cell; a 10x10 grid over 10k
    # floes would put ~100 floes in every cell — a workload no reference
    # case approaches, and the per-cell exact-boolean cost is quadratic in
    # occupancy).
    npx = max(8, int(np.sqrt(n_floes / 10)))
    conc = coverage_fraction(state, cfg, npx, npx)
    bench_pass(f"pack_pass({npx}x{npx} grid, conc precomputed)",
               lambda: pack_pass(view, cfg, rng, 0.1, 1.0, npx, npx,
                                 conc=conc), n_rep=1)

    # apply_edits with a realistic edit (ridge pass output)
    edit = ridge_raft_pass(view, cfg, rng, "ridge", dom)
    n_edits = (len(edit.kills) + len(edit.dissolve_kills)
               + len(edit.new_floes) + len(edit.updates)
               + len(edit.reshapes))
    out = bench_pass(f"apply_edits ({n_edits} edits)",
                     lambda: jax.block_until_ready(
                         apply_edits(state, edit, cfg).x))

    total = sum(t for _, t in rows)
    print(f"{'TOTAL (one firing of each)':30s} {total*1e3:10.1f} ms")
    return rows


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10240)

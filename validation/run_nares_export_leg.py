"""Resume the recipe-faithful Nares campaign and run until export fires.

Round-5 continuation of validation/run_cases.py:run_nares: the [1; 0]
recipe case (README.md Validation 2) resumed from its latest snapshot and
driven until the lead floes cross the southern kill line (ref -250 km =
ours -375 km) and the below-ymin export kill fires, plus a 15k-step tail
so the export time series has body.  Snapshots/mass series keep writing at
the thinned n_dt_out=1500 cadence, so the run is resumable at any point.

Controls: touch validation/out/nares/STOP to stop at the next leg
boundary (the latest snapshot resumes later); hard cap 400k steps.
"""

import dataclasses as dc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np  # noqa: E402

from subzero_tpu.sim import Simulation  # noqa: E402
from subzero_tpu.validation import nares_sim  # noqa: E402

OUT = Path(__file__).resolve().parent / "out" / "nares"
HARD_CAP = 400_000
TAIL = 15_000          # steps to keep running after the first export
LEG = 1_500            # = n_dt_out snapshot cadence


def main():
    sim = nares_sim(n_floes=150, seed=0)
    sim.cfg = sim.cfg.replace(processes=dc.replace(
        sim.cfg.processes, n_dt_out=LEG))
    snaps = sorted(OUT.glob("snap*/meta.json"))
    snap = snaps[-1].parent
    loaded = Simulation.load(snap, sim.cfg, sim.forcing)
    loaded.output_dir = OUT
    loaded.plot_output = False
    loaded._resume_step = loaded.step_idx
    sim = loaded
    print(f"[nares-r5] resumed from {snap.name} (step {sim.step_idx}), "
          f"exported so far {sim.lifecycle.exported_mass:.3e} kg",
          flush=True)

    exp0_step = None
    t0, s0 = time.time(), sim.step_idx
    while sim.step_idx < HARD_CAP:
        if (OUT / "STOP").exists():
            print(f"[nares-r5] STOP file at step {sim.step_idx}", flush=True)
            break
        sim.run(LEG)
        alive = np.asarray(sim.state.alive)
        ymin = float(np.asarray(sim.state.y)[alive].min())
        rate = (sim.step_idx - s0) / max(time.time() - t0, 1e-9)
        print(f"[nares-r5] step {sim.step_idx}: {int(alive.sum())} floes, "
              f"lead y {ymin/1e3:.1f} km, exported "
              f"{sim.lifecycle.exported_mass:.3e} kg, {rate:.1f} steps/s",
              flush=True)
        if sim.lifecycle.exported_mass > 0:
            if exp0_step is None:
                exp0_step = sim.step_idx
                print(f"[nares-r5] FIRST EXPORT by step {exp0_step}",
                      flush=True)
            if sim.step_idx - exp0_step >= TAIL:
                break
    print(f"[nares-r5] done at step {sim.step_idx}; exported "
          f"{sim.lifecycle.exported_mass:.3e} kg; wall "
          f"{time.time() - t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()

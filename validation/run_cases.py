"""Run the reference validation cases end-to-end and record results.

Produces, per case, under validation/out/<case>/:
  * fig*.png          floe-field figures at the output cadence
  * mass_series.npy   (step, floe mass, dissolved mass) ledger
  * snap*/            full-state snapshots + Eulerian fields
and a summary block appended to validation/RESULTS.md.

Cases (README.md "Validation Cases" + winter.tar.gz):
  out_of_box : ~10 floes, 4-gyre ocean, collisions (7500 steps out-of-box;
               configurable)
  uniaxial   : 200 floes, N/S walls closing to 85 km, Mohr-Coulomb fracture
  nares      : 150 floes, 10 m/s southward wind through the strait
  winter     : 100 floes, all processes, PERIODIC + KEEP_MIN, freezing

Usage: python validation/run_cases.py [case ...] [--steps=N] [--resume]
                                      [--platform=cpu|tpu]
  --resume: continue each case from its latest snapshot (the runs are
  checkpointed every n_dt_out steps, so an interrupted campaign restarts
  where it stopped instead of from scratch).
  --platform: device to run on (default cpu).  The physics step is
  platform-agnostic; a campaign resumed on a different platform continues
  bit-inexactly but within the model's own chaos (documented in RESULTS.md).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

_PLATFORM = "cpu"
for _a in sys.argv[1:]:
    if _a.startswith("--platform"):
        _PLATFORM = _a.split("=")[1]
if _PLATFORM != "tpu":
    jax.config.update("jax_platforms", _PLATFORM)
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np  # noqa: E402

ROOT = Path(__file__).resolve().parent
OUT = ROOT / "out"
RESUME = "--resume" in sys.argv


def _total(sim) -> float:
    """Conserved total: floes + dissolved + exported.  The baseline m0 must
    be taken with THIS function — a resumed case already carries dissolved
    mass from its earlier legs, so baselining on floe mass alone reports a
    spurious ledger gain."""
    return (sim.total_mass() + float(np.sum(sim.dissolved))
            + sim.lifecycle.exported_mass)


def _ledger(sim, m0: float) -> dict:
    return {
        "floe mass [kg]": f"{sim.total_mass():.6e}",
        "dissolved [kg]": f"{float(np.sum(sim.dissolved)):.6e}",
        "exported [kg]": f"{sim.lifecycle.exported_mass:.6e}",
        "ledger (floes+dissolved+exported)/m0":
            f"{_total(sim) / m0:.8f}",
    }


def _summarize(name: str, sim, t_wall: float, extra: dict | None = None):
    from subzero_tpu.validation import (
        floe_size_distribution, ice_thickness_distribution,
    )

    alive = np.asarray(sim.state.alive)
    fsd, fsd_edges = floe_size_distribution(sim.state)
    itd, itd_edges = ice_thickness_distribution(sim.state)
    np.savez(OUT / name / "distributions.npz", fsd=fsd, fsd_edges=fsd_edges,
             itd=itd, itd_edges=itd_edges)
    rate = ((sim.step_idx - getattr(sim, "_resume_step", 0))
            / max(t_wall, 1e-9))
    lines = [
        f"\n## {name} ({time.strftime('%Y-%m-%d')})\n",
        f"- steps: {sim.step_idx}, wall: {t_wall:.0f} s "
        f"({rate:.2f} steps/s, {jax.devices()[0].platform})",
        f"- live floes: {int(alive.sum())}",
        f"- region-overflow steps: "
        f"{getattr(sim, 'region_overflow_steps', 0)} "
        f"(peak pool demand {getattr(sim, 'region_pool_need_max', 0)} "
        "pair slots)",
    ]
    if extra:
        lines += [f"- {k}: {v}" for k, v in extra.items()]
    with open(ROOT / "RESULTS.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    try:
        print(f"[{name}] " + sim.phase_report().replace("\n", f"\n[{name}] "),
              flush=True)
    except Exception:
        pass
    print("\n".join(lines), flush=True)


def _maybe_resume(sim, name: str):
    """Reload the latest snapshot under validation/out/<name>/ if --resume."""
    if not RESUME:
        return sim
    from subzero_tpu.sim import Simulation

    snaps = sorted((OUT / name).glob("snap*/meta.json"))
    if not snaps:
        return sim
    snap = snaps[-1].parent
    loaded = Simulation.load(snap, sim.cfg, sim.forcing)
    # keep the case-specific driver attachments (incl. output wiring — a
    # resumed leg must keep writing snapshots/figures/mass series)
    loaded.wall_fn = sim.wall_fn
    loaded.output_dir = sim.output_dir
    loaded.plot_output = sim.plot_output
    loaded._resume_step = loaded.step_idx
    print(f"[{name}] resumed from {snap.name} (step {loaded.step_idx})",
          flush=True)
    return loaded


def _finish(sim, name: str, steps: int, t0: float, m0: float, extra: dict):
    remaining = steps - sim.step_idx
    if remaining > 0:
        sim.run(remaining, log_every=500)
    extra = dict(extra or {})
    extra.update(_ledger(sim, m0))
    _summarize(name, sim, time.time() - t0, extra)


def run_out_of_box(steps: int):
    from subzero_tpu.sim import out_of_box_sim

    sim = out_of_box_sim(seed=0, n_floes=10)
    sim.output_dir = OUT / "out_of_box"
    sim.plot_output = True
    sim = _maybe_resume(sim, "out_of_box")
    m0_path = OUT / "out_of_box" / "m0.npy"
    if sim.step_idx == 0 or not m0_path.exists():
        m0 = _total(sim)
        np.save(m0_path, m0)
    else:
        m0 = float(np.load(m0_path))
    t0 = time.time()
    _finish(sim, "out_of_box", steps, t0, m0, {})


def run_uniaxial(steps: int):
    from subzero_tpu.validation import uniaxial_sim

    sim = uniaxial_sim(n_floes=200, seed=0)
    sim.output_dir = OUT / "uniaxial"
    sim.plot_output = True
    # The reference closes the walls 15 m / 30 steps -> 30000 steps to reach
    # 85 km.  Within this CPU budget the closure rate is scaled so the walls
    # reach 85 km by the end of the run (documented acceleration).
    rate = max(15.0, (1e5 - 8.5e4) / max(steps // 30, 1))
    wall_fn = lambda s: (1e5, max(1e5 - rate * (s // 30), 8.5e4))  # noqa
    sim.wall_fn = wall_fn
    sim = _maybe_resume(sim, "uniaxial")
    sim.wall_fn = wall_fn
    # f64 shadow ledger: pin any lifecycle-pass mass leak per invocation
    # (round-3 uniaxial +0.13% residual investigation)
    sim.lifecycle.shadow_ledger = True
    n0 = int(np.asarray(sim.state.alive).sum())
    m0 = _total(sim)
    t0 = time.time()
    sim.run(steps - sim.step_idx, log_every=500)
    n1 = int(np.asarray(sim.state.alive).sum())
    ly = sim.wall_fn(sim.step_idx)[1]
    extra = {
        "wall position Ly": f"{ly/1e3:.1f} km (target 85 km)",
        "floes (fracture grows count)": f"{n0} -> {n1}",
        "floe capacity (auto-grown)": sim.state.n,
        "max principal stress [Pa]":
            f"{float(np.max(np.asarray(sim.state.stress))):.3e}",
        "shadow-ledger drift [kg]":
            f"{sim.lifecycle.ledger_drift:+.3e} "
            f"(max single {sim.lifecycle.ledger_drift_max:+.3e})",
    }
    extra.update(_ledger(sim, m0))
    _summarize("uniaxial", sim, time.time() - t0, extra)


def run_nares(steps: int):
    import dataclasses as dc

    from subzero_tpu.validation import nares_sim

    sim = nares_sim(n_floes=150, seed=0)
    sim.output_dir = OUT / "nares"
    sim.plot_output = True
    if steps > 10000:
        # export run (~19 days of model time for the lead floes to reach
        # the ref -250 km kill line): thin the snapshot/figure cadence so
        # output IO doesn't dominate the wall clock
        sim.cfg = sim.cfg.replace(processes=dc.replace(
            sim.cfg.processes, n_dt_out=1500))
        sim.plot_output = False
    sim = _maybe_resume(sim, "nares")
    y0 = np.asarray(sim.state.y).copy()
    alive0 = np.asarray(sim.state.alive).copy()
    nb = sim.cfg.n_boundary
    m0 = _total(sim)
    t0 = time.time()
    sim.run(steps - sim.step_idx, log_every=500)
    y1 = np.asarray(sim.state.y)
    alive1 = np.asarray(sim.state.alive)
    moved = (y1 - y0)[alive0 & alive1]
    # deaths among the floes alive at the start of the leg (out-of-domain
    # exports + sub-minimum kills); a net count would be masked by fracture
    # births
    exported = int((alive0[nb:] & ~alive1[nb:]).sum())
    extra = {
        "mean southward drift": f"{float(np.mean(moved)):.1f} m",
        "initial-floe deaths (export + dissolve kills)": exported,
    }
    series_p = OUT / "nares" / "mass_series.npy"
    if series_p.exists():
        series = np.load(series_p)
        if series.shape[1] >= 4:
            hits = np.nonzero(series[:, 3] > 0)[0]
            extra["first export at step"] = (
                int(series[hits[0], 0]) if len(hits) else
                "none yet (see exported ledger)")
    extra.update(_ledger(sim, m0))
    _summarize("nares", sim, time.time() - t0, extra)
    if not sim.plot_output:  # long run: one final figure
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from subzero_tpu.plotting import plot_basic

            fig = plot_basic(sim.state, sim.cfg, sim.forcing)
            fig.savefig(OUT / "nares" / f"fig{sim.step_idx:07d}.png",
                        dpi=110)
            plt.close(fig)
        except Exception as e:
            print(f"[nares] final plot failed: {e}")


def run_winter(steps: int):
    from subzero_tpu.validation import winter_sim

    sim = winter_sim(n_floes=100, seed=0)
    sim.output_dir = OUT / "winter"
    sim.plot_output = True
    sim = _maybe_resume(sim, "winter")
    m0 = _total(sim)
    h0 = float(np.mean(np.asarray(sim.state.h)[np.asarray(sim.state.alive)]))
    n0 = int(np.asarray(sim.state.alive).sum())
    t0 = time.time()
    sim.run(steps - sim.step_idx, log_every=250)
    alive = np.asarray(sim.state.alive)
    h1 = float(np.mean(np.asarray(sim.state.h)[alive]))
    extra = {
        "mean thickness": f"{h0:.3f} -> {h1:.3f} m (freezing: must grow)",
        "floes": f"{n0} -> {int(alive.sum())} "
                 "(packing at step 5500 adds new ice)",
        "mass (floes+dissolved)/m0":
            f"{(sim.total_mass() + float(np.sum(sim.dissolved))) / m0:.4f} "
            "(>1: thermodynamic growth adds mass)",
    }
    extra.update(_ledger(sim, m0))
    _summarize("winter", sim, time.time() - t0, extra)


def run_nares_export(steps: int):
    """Export-path demonstration: the Nares configuration with
    concentration [1; 1] (floes through the whole domain incl. the strait
    and south basin) so floes reach the reference's -250 km kill line
    within the run.  The recipe-faithful [1; 0] case needs ~0.5M steps of
    ~8 cm/s pack drift before the first export; this variant exercises the
    same export physics (below-ymin kill -> exported-mass ledger) live."""
    import dataclasses as dc

    from subzero_tpu.validation import nares_sim

    sim = nares_sim(n_floes=150, seed=0, full_basin=True)
    sim.output_dir = OUT / "nares_export"
    sim.plot_output = False
    sim.cfg = sim.cfg.replace(processes=dc.replace(
        sim.cfg.processes, n_dt_out=1500))
    sim = _maybe_resume(sim, "nares_export")
    nb = sim.cfg.n_boundary
    alive0 = np.asarray(sim.state.alive).copy()
    m0 = _total(sim)
    t0 = time.time()
    sim.run(steps - sim.step_idx, log_every=500)
    alive1 = np.asarray(sim.state.alive)
    deaths = int((alive0[nb:] & ~alive1[nb:]).sum())
    extra = {
        "initial-floe deaths": deaths,
        "exported mass fired": sim.lifecycle.exported_mass > 0,
    }
    series_p = OUT / "nares_export" / "mass_series.npy"
    if series_p.exists():
        series = np.load(series_p)
        if series.shape[1] >= 4:
            hits = np.nonzero(series[:, 3] > 0)[0]
            if len(hits):
                extra["first export at step"] = int(series[hits[0], 0])
    extra.update(_ledger(sim, m0))
    _summarize("nares_export", sim, time.time() - t0, extra)


CASES = {
    "out_of_box": run_out_of_box,
    "uniaxial": run_uniaxial,
    "nares": run_nares,
    "nares_export": run_nares_export,
    "winter": run_winter,
}

# winter runs past n_pack=5500 so the packing pass fires at reference
# cadence (winter/Subzero.m:105-109)
DEFAULT_STEPS = {
    "out_of_box": 7500, "uniaxial": 6000, "nares": 3000,
    "nares_export": 30000, "winter": 6000,
}

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps_override = None
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            steps_override = int(a.split("=")[1])
    names = args or list(CASES)
    OUT.mkdir(exist_ok=True)
    failures = []
    for name in names:
        (OUT / name).mkdir(exist_ok=True, parents=True)
        try:
            CASES[name](steps_override or DEFAULT_STEPS[name])
        except Exception:
            import traceback

            traceback.print_exc()
            failures.append(name)
            print(f"[campaign] case {name} FAILED — continuing", flush=True)
    if failures:
        sys.exit(f"failed cases: {failures}")

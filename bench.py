"""Benchmark harness: floe-steps/s/chip on the flagship contact workload.

Prints ONE JSON line:
  {"metric": "floe-steps/s/chip@10k", "value": N, "unit": "floe-steps/s",
   "vs_baseline": R}

``vs_baseline`` is the speedup over the same step executed by the
single-host CPU backend (the stand-in for the reference's serial MATLAB
process — SubZero publishes no numbers, see BASELINE.md), measured at a
smaller floe count and scaled linearly in floe count (the per-step work is
dominated by the [N, K] narrow phase, linear in N at fixed neighbor cap).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# 10k floes is the SURVEY.md target scale; the default stays at 4096 until
# the narrow-phase kernel is Pallas-optimized (remote compile of the step
# graph is ~300 s and the driver's bench window is finite).
N_FLOES = int(os.environ.get("BENCH_FLOES", 4096))
N_CPU = int(os.environ.get("BENCH_CPU_FLOES", 512))
STEPS = int(os.environ.get("BENCH_STEPS", 30))


def build(n_floes: int, dtype: str = "float32"):
    import jax.numpy as jnp

    from subzero_tpu import SimConfig
    from subzero_tpu.config import (
        CapacityConfig, DomainConfig, NumericsConfig, ProcessConfig,
    )
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.state import state_from_polygons

    # Doubly-periodic dense pack: ~sqrt(N) x sqrt(N) lattice of irregular
    # quads at ~93% concentration so most floes are in contact.
    side = int(np.ceil(np.sqrt(n_floes)))
    pitch = 4000.0
    lx = side * pitch / 2
    cfg = SimConfig(
        capacity=CapacityConfig(
            max_floes=n_floes, max_verts=16, max_neighbors=8,
            n_mc_points=256, stress_window=100,
        ),
        numerics=NumericsConfig(dtype=dtype),
        domain=DomainConfig(lx=lx, ly=lx),
        processes=ProcessConfig(periodic=True),
    )
    rng = np.random.default_rng(0)
    sq = 0.5 * np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    polys = []
    for k in range(n_floes):
        i, j = divmod(k, side)
        center = np.array([
            -lx + (j + 0.5) * pitch, -lx + (i + 0.5) * pitch,
        ])
        jitter = rng.uniform(-0.03, 0.03, size=(4, 2)) * pitch
        polys.append(sq * pitch * 0.97 + jitter + center)
    vel = rng.uniform(-0.1, 0.1, size=(n_floes, 2))
    state = state_from_polygons(polys, 0.5, cfg, velocities=vel)
    forcing = uniform_forcing(lx=4 * lx, dx=lx / 8, uo=0.1,
                              dtype=jnp.dtype(dtype))
    return cfg, state, forcing


def measure(n_floes: int, steps: int, device=None) -> float:
    """floe-steps/s of the jitted physics step on ``device``."""
    import jax
    import jax.numpy as jnp

    from subzero_tpu.dynamics import make_step_fn

    t0 = time.time()
    cfg, state, forcing = build(n_floes)
    print(f"[bench] built {n_floes} floes in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    if device is not None:
        state = jax.device_put(state, device)
        forcing = jax.device_put(forcing, device)
    step = make_step_fn(cfg, forcing, 1.6e8)
    # warmup/compile
    t0 = time.time()
    s, aux = step(state, jnp.asarray(0))
    jax.block_until_ready(s.x)
    print(f"[bench] compile+warmup {time.time()-t0:.1f}s on {device}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for i in range(1, steps + 1):
        s, aux = step(s, jnp.asarray(i))
    jax.block_until_ready(s.x)
    dt = time.time() - t0
    return n_floes * steps / dt


def main():
    import jax

    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    dev = tpu_devices[0] if tpu_devices else jax.devices()[0]

    rate = measure(N_FLOES, STEPS, dev)

    # CPU proxy baseline (serial-reference stand-in), scaled to N_FLOES.
    try:
        cpu = jax.devices("cpu")[0]
        cpu_rate = measure(N_CPU, max(STEPS // 6, 3), cpu)
    except Exception:
        cpu_rate = float("nan")

    out = {
        "metric": f"floe-steps/s/chip@{N_FLOES}",
        "value": round(rate, 1),
        "unit": "floe-steps/s",
        "vs_baseline": round(rate / cpu_rate, 2) if cpu_rate == cpu_rate else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

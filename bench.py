"""Benchmark harness: floe-steps/s/chip on the flagship contact workload.

Prints ONE JSON line:
  {"metric": "floe-steps/s/chip@10240", "value": N, "unit": "floe-steps/s",
   "vs_baseline": R, "pairs_per_s": P, "compile_s": C}

``vs_baseline`` is the speedup over the *serial reference oracle*
(``subzero_tpu/oracle.py`` — the float64 numpy+native-engine implementation
of floe_interactions.m/calc_trajectory.m semantics, golden-tested against
the JAX step in tests/test_golden.py), measured on the same dense-pack
workload at a smaller floe count and scaled linearly in floe count.  The
serial model's cost is superlinear in N (O(N^2) broad phase), so linear
scaling UNDERSTATES the true speedup — the number is conservative.

A persistent XLA compilation cache (.jax_cache/) makes repeat runs of an
unchanged step graph skip the ~300 s remote TPU compile.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_FLOES = int(os.environ.get("BENCH_FLOES", 10240))
IMPL = os.environ.get("BENCH_IMPL", "integral")   # integral | pallas | xla
# Vertex-axis size of the state buffers.  The driver auto-sizes this to the
# population's need (CapacityConfig.verts_auto); the bench pins it so the
# V^2 narrow-phase cost is measurable in isolation (BENCH_VERTS=64 shows
# what a static fidelity-cap build would pay on this 4-vertex workload).
VERTS = int(os.environ.get("BENCH_VERTS", 16))
# Broad phase: "n2" (dense [N,N]) or "cells" (cell list — required at 50k+,
# where the dense candidate matrix alone is ~10 GB)
BROADPHASE = os.environ.get("BENCH_BROADPHASE", "n2")
# per-region contacts are the production default (reference-exact physics);
# BENCH_PER_REGION=0 measures the aggregate-contact mode (~13% faster)
PER_REGION = os.environ.get("BENCH_PER_REGION", "1") == "1"
N_SERIAL = int(os.environ.get("BENCH_SERIAL_FLOES", 128))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
SERIAL_STEPS = int(os.environ.get("BENCH_SERIAL_STEPS", 5))
# second workload: interlocking concave stars (per-region decomposition
# actually fires); pool fraction sized from the measured demand
CONCAVE = os.environ.get("BENCH_CONCAVE", "1") == "1"
# default: auto-size from a probe step (mirrors the driver's two-way
# auto-sizer); set BENCH_CONCAVE_FRAC to pin a fraction instead
_cf = os.environ.get("BENCH_CONCAVE_FRAC", "")
CONCAVE_FRAC = float(_cf) if _cf else None


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def build(n_floes: int, dtype: str = "float32", cap_factor: float = 1.0):
    import jax.numpy as jnp

    from subzero_tpu import SimConfig
    from subzero_tpu.config import (
        CapacityConfig, ContactConfig, DomainConfig, NumericsConfig,
        ProcessConfig,
    )
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.state import state_from_polygons

    # Doubly-periodic dense pack: ~sqrt(N) x sqrt(N) lattice of irregular
    # quads at ~93% concentration so most floes are in contact.
    side = int(np.ceil(np.sqrt(n_floes)))
    pitch = 4000.0
    lx = side * pitch / 2
    # cap_factor > 1 leaves free slots (spatial rebalance headroom)
    cap = int(np.ceil(n_floes * cap_factor / 8)) * 8
    cfg = SimConfig(
        capacity=CapacityConfig(
            max_floes=cap, max_verts=VERTS, max_neighbors=8,
            n_mc_points=256, stress_window=100,
            # quad half-diagonal ~0.72*pitch; cell edge >= 2*max(rmax)
            max_per_cell=8,
        ),
        numerics=NumericsConfig(
            dtype=dtype, contact_impl=IMPL, broadphase=BROADPHASE,
            cell_size=1.5 * pitch if BROADPHASE == "cells" else 0.0,
        ),
        domain=DomainConfig(lx=lx, ly=lx),
        processes=ProcessConfig(periodic=True),
        contact=ContactConfig(per_region=PER_REGION),
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


def build_concave(n_floes: int, dtype: str = "float32",
                  frac: float = 0.25):
    """Interlocking concave star lattice: every contact is multi-crossing,
    so the per-region decomposition actually fires (round-2 VERDICT weak
    #4: the dense-quad workload never exercises it).  ``frac`` sets the
    decomposition pool (ContactConfig.region_pair_frac)."""
    import jax.numpy as jnp

    from subzero_tpu import SimConfig
    from subzero_tpu.config import (
        CapacityConfig, ContactConfig, DomainConfig, NumericsConfig,
        ProcessConfig,
    )
    from subzero_tpu.forcing import uniform_forcing
    from subzero_tpu.state import state_from_polygons

    side = int(np.ceil(np.sqrt(n_floes)))
    pitch = 4000.0
    lx = side * pitch / 2
    cap = int(np.ceil(n_floes / 8)) * 8
    cfg = SimConfig(
        capacity=CapacityConfig(
            max_floes=cap, max_verts=VERTS, max_neighbors=8,
            n_mc_points=256, stress_window=100,
        ),
        numerics=NumericsConfig(dtype=dtype, contact_impl=IMPL),
        domain=DomainConfig(lx=lx, ly=lx),
        processes=ProcessConfig(periodic=True),
        contact=ContactConfig(per_region=True, region_pair_frac=frac),
    )
    rng = np.random.default_rng(0)
    polys = []
    for k in range(n_floes):
        i, j = divmod(k, side)
        center = np.array([
            -lx + (j + 0.5) * pitch, -lx + (i + 0.5) * pitch,
        ])
        n_arms = int(rng.integers(5, 9))            # 10-16 verts (cap 16)
        nv = 2 * n_arms
        th = (np.linspace(0, 2 * np.pi, nv + 1)[:-1]
              + rng.uniform(0, np.pi / nv))
        r = 0.45 * pitch * (
            1 + 0.45 * np.where(np.arange(nv) % 2 == 0, 1.0, -1.0)
            + rng.uniform(-0.1, 0.1, nv))
        polys.append(np.stack([center[0] + r * np.cos(th),
                               center[1] + r * np.sin(th)], axis=1))
    vel = rng.uniform(-0.1, 0.1, size=(n_floes, 2))
    state = state_from_polygons(polys, 0.5, cfg, velocities=vel)
    forcing = uniform_forcing(lx=4 * lx, dx=lx / 8, uo=0.1,
                              dtype=jnp.dtype(dtype))
    return cfg, state, forcing


def measure_concave(n_floes: int, steps: int, device=None,
                    frac: float | None = None):
    """(floe-steps/s, pool_need_max, pool_capacity, overflowed) on the
    concave star workload.

    ``frac=None`` (default) replicates the driver's steady state: one
    probe step at a generous pool measures the true >=4-crossing demand,
    then the pool is rebuilt at the exact 128-aligned size the two-way
    auto-sizer (Simulation._maybe_shrink_pools) converges to."""
    import math

    import jax
    import jax.numpy as jnp

    from subzero_tpu.dynamics import make_step_fn

    if frac is None:
        cfg_p, state_p, forcing_p = build_concave(n_floes, frac=0.25)
        step_p = make_step_fn(cfg_p, forcing_p, 1.6e8)
        _, aux_p = step_p(state_p, jnp.asarray(0))
        need_p = int(aux_p.region_pool_need)
        p_cnt = n_floes * cfg_p.capacity.max_neighbors
        slots = max(128, -(-int(need_p * 1.25 + 1) // 128) * 128)
        frac = slots / p_cnt
        print(f"[bench] concave probe: demand {need_p} -> {slots} slots "
              f"(frac {frac:.4f})", file=sys.stderr, flush=True)

    cfg, state, forcing = build_concave(n_floes, frac=frac)
    if device is not None:
        state = jax.device_put(state, device)
        forcing = jax.device_put(forcing, device)
    step = make_step_fn(cfg, forcing, 1.6e8)
    t0 = time.time()
    s, aux = step(state, jnp.asarray(0))
    jax.block_until_ready(s.x)
    compile_s = time.time() - t0
    print(f"[bench] concave frac={frac} compile {compile_s:.1f}s",
          file=sys.stderr, flush=True)
    need_max = int(aux.region_pool_need)
    overflow = bool(aux.region_overflow)
    t0 = time.time()
    for i in range(1, steps + 1):
        s, aux = step(s, jnp.asarray(i))
    jax.block_until_ready(s.x)
    dt = time.time() - t0
    need_max = max(need_max, int(aux.region_pool_need))
    overflow = overflow or bool(aux.region_overflow)
    p = n_floes * cfg.capacity.max_neighbors
    pool = min(p, max(64, math.ceil(p * frac)))
    return n_floes * steps / dt, need_max, pool, overflow, compile_s


def measure(n_floes: int, steps: int, device=None):
    """(floe-steps/s, pair-slots/s, compile_s) of the jitted step."""
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
    compile_s = time.time() - t0
    print(f"[bench] compile+warmup {compile_s:.1f}s on {device}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for i in range(1, steps + 1):
        s, aux = step(s, jnp.asarray(i))
    jax.block_until_ready(s.x)
    dt = time.time() - t0
    k = cfg.capacity.max_neighbors
    return n_floes * steps / dt, n_floes * k * steps / dt, compile_s


def measure_serial(n_floes: int, steps: int) -> float:
    """floe-steps/s of the serial reference oracle on the same workload."""
    from subzero_tpu.oracle import floes_from_state, oracle_step

    cfg, state, forcing = build(n_floes, dtype="float32")
    floes = floes_from_state(state, cfg, n=n_floes)
    # warmup one step (builds the native library, primes caches)
    oracle_step(floes, forcing, cfg, 1.6e8, 0)
    t0 = time.time()
    for s in range(1, steps + 1):
        oracle_step(floes, forcing, cfg, 1.6e8, s)
    dt = time.time() - t0
    return n_floes * steps / dt


def main():
    _enable_compile_cache()
    import jax

    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    dev = tpu_devices[0] if tpu_devices else jax.devices()[0]

    rate, pairs_s, compile_s = measure(N_FLOES, STEPS, dev)

    try:
        serial_rate = measure_serial(N_SERIAL, SERIAL_STEPS)
        print(f"[bench] serial oracle {serial_rate:.1f} floe-steps/s "
              f"@{N_SERIAL}", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"[bench] serial baseline failed: {e}", file=sys.stderr)
        serial_rate = float("nan")

    out = {
        "metric": f"floe-steps/s/chip@{N_FLOES}",
        "impl": IMPL,
        "value": round(rate, 1),
        "unit": "floe-steps/s",
        "vs_baseline": (round(rate / serial_rate, 2)
                        if serial_rate == serial_rate else None),
        "pairs_per_s": round(pairs_s, 1),
        "compile_s": round(compile_s, 1),
    }

    if CONCAVE:
        # Concave star workload: the per-region decomposition fires on
        # nearly every contact.  Report throughput + pool sizing.
        try:
            c_rate, need, pool, ovf, c_comp = measure_concave(
                N_FLOES, max(10, STEPS // 3), dev, frac=CONCAVE_FRAC)
            out["concave"] = {
                "floe_steps_per_s": round(c_rate, 1),
                "pool_frac": CONCAVE_FRAC or "auto",
                "pool_slots": pool,
                "pool_need_max": need,
                "overflow": ovf,
                "compile_s": round(c_comp, 1),
            }
        except Exception as e:  # pragma: no cover
            print(f"[bench] concave workload failed: {e}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Multi-device scaling measurement on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment (one tunneled
v5e chip), so the spatial-decomposition step is measured on
``--xla_force_host_platform_device_count=8`` virtual CPU devices.  All
virtual devices share the same host cores, so absolute throughput cannot
scale; what this DOES measure is the *overhead* of the sharded program —
halo exchange (ppermute ring), migration, and the shard_map partitioning —
relative to the single-device step at the same per-shard workload, i.e. the
weak-scaling efficiency ceiling imposed by the communication pattern.

Writes a row table to stdout; paste into BASELINE.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/scaling_bench.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

N_PER_SHARD = int(os.environ.get("SCALE_FLOES_PER_SHARD", 1280))
STEPS = int(os.environ.get("SCALE_STEPS", 10))


def build(n_floes):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.build(n_floes, cap_factor=1.5)


def measure_single(n_floes):
    from subzero_tpu.dynamics import make_step_fn

    cfg, state, forcing = build(n_floes)
    step = make_step_fn(cfg, forcing, 1.6e8)
    s, _ = step(state, jnp.asarray(0))
    jax.block_until_ready(s.x)
    t0 = time.time()
    for i in range(1, STEPS + 1):
        s, _ = step(s, jnp.asarray(i))
    jax.block_until_ready(s.x)
    return n_floes * STEPS / (time.time() - t0)


def measure_sharded(n_floes, n_dev):
    from subzero_tpu.parallel import (
        make_spatial_step, rebalance_slabs, shard_state,
    )

    cfg, state, forcing = build(n_floes)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shards",))
    state = shard_state(rebalance_slabs(state, cfg, n_dev), mesh)
    step = make_spatial_step(cfg, forcing, 1.6e8, 0.0, mesh)
    s, _ = step(state, jnp.asarray(0))
    jax.block_until_ready(s.x)
    t0 = time.time()
    for i in range(1, STEPS + 1):
        s, _ = step(s, jnp.asarray(i))
    jax.block_until_ready(s.x)
    return n_floes * STEPS / (time.time() - t0)


def measure_sharded_2d(n_floes, sx, sy):
    from subzero_tpu.parallel import (
        make_spatial_step_2d, rebalance_tiles, shard_state_2d,
    )

    cfg, state, forcing = build(n_floes)
    mesh = Mesh(np.array(jax.devices()[:sx * sy]).reshape(sx, sy),
                ("sx", "sy"))
    state = shard_state_2d(rebalance_tiles(state, cfg, sx, sy), mesh)
    step = make_spatial_step_2d(cfg, forcing, 1.6e8, 0.0, mesh)
    s, _ = step(state, jnp.asarray(0))
    jax.block_until_ready(s.x)
    t0 = time.time()
    for i in range(1, STEPS + 1):
        s, _ = step(s, jnp.asarray(i))
    jax.block_until_ready(s.x)
    return n_floes * STEPS / (time.time() - t0)


def main():
    n_dev_avail = len(jax.devices())
    print(f"# devices available: {n_dev_avail}")
    rows = []
    # weak scaling: constant floes per shard
    base = measure_single(N_PER_SHARD)
    rows.append(("single-device", N_PER_SHARD, base, 1.0))
    for nd in (2, 4, 8):
        if nd > n_dev_avail:
            break
        n = N_PER_SHARD * nd
        r = measure_sharded(n, nd)
        # ideal weak scaling on shared cores: same aggregate rate as the
        # single-device step at the same TOTAL size
        ref = measure_single(n)
        rows.append((f"spatial x{nd}", n, r, r / ref))
    if n_dev_avail >= 8:
        # 2-D tile mesh at the same total size (4x2 tiles, overlapped
        # x/y/corner halo exchange — parallel/spatial2d.py)
        n = N_PER_SHARD * 8
        r = measure_sharded_2d(n, 4, 2)
        ref = measure_single(n)
        rows.append(("tiles 4x2", n, r, r / ref))
    print(f"{'config':>16} {'floes':>8} {'floe-steps/s':>14} "
          f"{'vs single-dev same-N':>22}")
    for name, n, r, eff in rows:
        print(f"{name:>16} {n:>8} {r:>14.0f} {eff:>22.2f}")

    if os.environ.get("SCALE_BASIN"):
        # round-4 VERDICT weak #6: the 50k-floe basin under the 8-shard
        # spatial step (absolute CPU numbers are meaningless; the row
        # documents that the sharded program RUNS at this scale and its
        # overhead vs the same-N single-device step)
        n = int(os.environ["SCALE_BASIN"])
        nd = min(8, n_dev_avail)
        r = measure_sharded(n, nd)
        print(f"{'basin x' + str(nd):>16} {n:>8} {r:>14.0f}")


if __name__ == "__main__":
    main()

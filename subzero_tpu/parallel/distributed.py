"""Multi-host / multi-slice runtime setup.

The reference has no distributed backend at all (single MATLAB process,
SURVEY.md section 2 "Parallelism").  Here the spatial decomposition
(``parallel/spatial.py``) scales past one host through the standard JAX
multi-process runtime: every host runs the same program, ``jax.distributed``
wires the processes together, and the spatial ``Mesh`` spans all global
devices.  Halo exchange (``ppermute`` over the shard ring) rides ICI between
chips of one slice and DCN between slices — the stripe order below keeps
ring neighbors ICI-adjacent within a slice so only the slice boundaries
cross DCN.

Usage (same script on every host):

    from subzero_tpu.parallel.distributed import initialize, spatial_mesh
    initialize()                      # no-op single-process; env-driven else
    mesh = spatial_mesh()             # 1-D "shards" mesh over global devices
    sim = Simulation(..., mesh=mesh)
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the JAX multi-process runtime when running distributed.

    Returns True when a multi-process runtime was initialized.  Single
    process (the common case; also this dev environment) is a no-op.  On
    Cloud TPU pods the arguments are auto-detected from the metadata server;
    elsewhere set them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)

    if addr is None and nproc is None and "TPU_WORKER_HOSTNAMES" not in \
            os.environ and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ:
        return False  # single-process run

    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid)
    return True


def spatial_mesh(n_shards: int | None = None):
    """1-D ``("shards",)`` mesh over the global device list.

    Device order: ``jax.devices()`` enumerates devices grouped by process
    (host); consecutive stripes therefore live on the same host/slice and
    the ppermute ring crosses DCN only at host boundaries — the minimum
    possible for a 1-D ring.
    """
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_shards is not None:
        devs = devs[:n_shards]
    return Mesh(np.array(devs), ("shards",))


def local_slab_bounds(mesh, cfg) -> list[tuple[float, float]]:
    """[(x_lo, x_hi)] of the stripes owned by THIS process — for host-side
    IO that should touch only local floes."""
    import jax

    n_shards = int(np.prod(mesh.devices.shape))
    w = 2.0 * cfg.domain.lx / n_shards
    out = []
    for i, d in enumerate(mesh.devices.ravel()):
        if d.process_index == jax.process_index():
            out.append((-cfg.domain.lx + i * w, -cfg.domain.lx + (i + 1) * w))
    return out

"""Worker for the 2-process ``jax.distributed`` CPU test.

Launched (twice) by tests/test_distributed.py:

    python tests/distributed_worker.py <process_id> <num_processes> <port>

Each process brings 2 virtual CPU devices -> a 4-shard global spatial mesh.
Runs 5 spatial steps of a colliding workload and checks, per process, that
the locally-owned shards match the single-device reference step bit-for-bit
(f64).  Prints DIST_OK on success (checked by the pytest driver).
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subzero_tpu.config import (  # noqa: E402
    CapacityConfig, DomainConfig, NumericsConfig, PhysicsConfig,
    ProcessConfig, SimConfig,
)
from subzero_tpu.dynamics import make_step_fn  # noqa: E402
from subzero_tpu.forcing import uniform_forcing  # noqa: E402
from subzero_tpu.parallel import (  # noqa: E402
    make_spatial_step, rebalance_slabs, shard_state,
)
from subzero_tpu.parallel.distributed import (  # noqa: E402
    initialize, local_slab_bounds, spatial_mesh,
)
from subzero_tpu.state import state_from_polygons  # noqa: E402

ok = initialize(coordinator_address=f"localhost:{port}",
                num_processes=nproc, process_id=pid)
assert ok, "initialize() must report a multi-process runtime"
assert jax.process_count() == nproc, jax.process_count()
n_dev = len(jax.devices())
assert n_dev == 2 * nproc, f"{n_dev} global devices"

SQ = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
cfg = SimConfig(
    physics=PhysicsConfig(cd_ocean=0.0, cd_atm=0.0, f_coriolis=0.0),
    processes=ProcessConfig(periodic=False),
    capacity=CapacityConfig(
        max_floes=32, max_verts=16, max_neighbors=4,
        n_mc_points=16, stress_window=8, max_ghosts=8,
    ),
    numerics=NumericsConfig(dtype="float64"),
    domain=DomainConfig(lx=8e4, ly=8e4),
    modulus=1.5e3 * 2 * 2000.0,
    min_floe_size=1e4,
)
polys, vels = [], []
for cx in np.linspace(-6e4, 6e4, 7):
    # slightly overlapping so contact fires within the 5-step run
    polys.append(2000 * SQ + [cx - 1975, 0.0])
    polys.append(2000 * SQ + [cx + 1975, 0.0])
    vels += [[0.05, 0.0], [-0.05, 0.0]]
st = state_from_polygons(polys, 0.5, cfg, velocities=np.array(vels))
forcing = uniform_forcing(lx=4e5)

# single-device reference (every process computes it locally)
step1 = make_step_fn(cfg, forcing, cfg.modulus)
s_ref = st
for i in range(5):
    s_ref, _ = step1(s_ref, jnp.asarray(i))
ref_x = np.asarray(s_ref.x)
ref_alive = np.asarray(s_ref.alive)

mesh = spatial_mesh()
n_shards = int(np.prod(mesh.devices.shape))
sN = shard_state(rebalance_slabs(st, cfg, n_shards), mesh)
stepN = make_spatial_step(cfg, forcing, cfg.modulus, 0.0, mesh)
aux = None
for i in range(5):
    sN, aux = stepN(sN, jnp.asarray(i))
jax.block_until_ready(sN.x)

# check the locally-owned shards against the reference
bounds = local_slab_bounds(mesh, cfg)
assert len(bounds) == 2, bounds
ref_rows = sorted(
    (float(x), ) for x, a in zip(ref_x, ref_alive) if a
)
loc_rows = []
for xs, al in zip(sN.x.addressable_shards, sN.alive.addressable_shards):
    xv = np.asarray(xs.data)
    av = np.asarray(al.data)
    loc_rows.extend(float(v) for v in xv[av])
# every locally-owned live floe must appear in the reference set
ref_set = np.array([r[0] for r in ref_rows])
for v in loc_rows:
    assert np.min(np.abs(ref_set - v)) < 1e-9, (v, ref_set)

n_col = int(np.asarray(aux.n_collisions))
assert n_col > 0, "colliding workload must report collisions"
print(f"DIST_OK pid={pid} shards={n_shards} local_floes={len(loc_rows)} "
      f"collisions={n_col}", flush=True)

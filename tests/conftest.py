"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``--xla_force_host_platform_device_count=8``); real-TPU benchmarking happens
in bench.py only.

NOTE: the environment preloads jax and registers the remote `axon` TPU
backend via sitecustomize before this file runs, and JAX_PLATFORMS=axon is
set in the ambient environment — so forcing CPU needs an explicit
``jax.config.update``, not just env vars (eager ops on the tunneled TPU
remote-compile per shape and are catastrophically slow for tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

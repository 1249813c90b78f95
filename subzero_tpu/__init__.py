"""subzero_tpu — a TPU-native discrete-element sea-ice solver.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SeaIce-Math/SubZero (MATLAB + Clipper MEX): polygonal floes colliding,
drifting under ocean/wind forcing, and evolving through fracture, ridging,
rafting, welding, corner grinding, and new-ice packing.

Architecture (see SURVEY.md section 7):
  * fixed-capacity SoA ``FloeState`` pytree with alive masks and padded
    vertex buffers — fully jittable;
  * hot path (broad phase, contact geometry, force reduction, AB2
    integration) as batched XLA/Pallas tensor programs;
  * life-cycle topology surgery (fracture/weld/ridge/pack) host-side on a
    native C++ polygon-boolean engine, applied at process cadence;
  * multi-device scaling via ``jax.sharding`` + ``shard_map``.
"""

from .config import SimConfig

__version__ = "0.1.0"
__all__ = ["SimConfig", "__version__"]

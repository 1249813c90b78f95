from .spatial import (
    make_spatial_step,
    rebalance_slabs,
    shard_state,
    slab_bounds,
)

__all__ = [
    "make_spatial_step",
    "rebalance_slabs",
    "shard_state",
    "slab_bounds",
]

"""Device-mesh parallelism utilities (SPMD over ICI via jax.sharding)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    host_local_slice,
    initialize_multihost,
    make_mesh,
    replicate,
    shard_batch,
)

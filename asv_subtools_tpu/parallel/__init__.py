"""Device-mesh parallelism utilities (SPMD over ICI via jax.sharding)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    classifier_partition_rules,
    host_local_slice,
    initialize_multihost,
    make_fsdp_rules,
    make_mesh,
    opt_state_shardings,
    partition_params,
    replicate,
    shard_batch,
)

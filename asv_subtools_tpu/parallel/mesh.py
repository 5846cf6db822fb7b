"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL layer (pytorch/libs/support/utils.py:401-495).

Design: one global `Mesh` with axes ("data", "model"). Data parallelism
shards the batch axis over "data"; the gradient all-reduce is NOT an
explicit collective — writing the loss globally under jit makes XLA insert
psum on ICI, and BatchNorm batch statistics become cross-replica
(SyncBN) for free because the masked mean is computed over the global
batch. "model" (default size 1) is reserved for sharding very wide
classifier weights (e.g. LID heads) and backend cohort matmuls.

Multi-host: `jax.distributed.initialize()` before calling `make_mesh`;
`host_local_slice` reproduces the reference's rank/worker modulo data split
(egs_online.py:101-117).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over all devices (default: model=1)."""
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if num_data is None:
        if n % num_model:
            raise ValueError(f"{n} devices not divisible by model={num_model}")
        num_data = n // num_model
    if num_data * num_model != n:
        raise ValueError(
            f"mesh {num_data}x{num_model} != {n} devices"
        )
    arr = np.asarray(devs).reshape(num_data, num_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a host batch on the mesh, sharded over the data axis (dim 0)."""

    def put(x):
        spec = P(DATA_AXIS) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def classifier_partition_rules(path, leaf) -> P:
    """Default model-axis partition rules: row-parallel margin-loss
    classifier (class rows sharded over MODEL_AXIS); everything else
    replicated. The classifier weight [num_targets, embd] is the one
    parameter that grows with the speaker inventory (5994 VoxCeleb2, 10k+
    LID), so sharding its rows is where the model axis pays."""
    keys = [getattr(p, "key", "") for p in path]
    if "loss" in keys and keys[-1] == "weight" and getattr(leaf, "ndim", 0) == 2:
        return P(MODEL_AXIS, None)
    return P()


def make_fsdp_rules(
    mesh: Mesh,
    min_size: int = 8192,
    axis: str = DATA_AXIS,
    classifier_model_axis: bool = True,
):
    """ZeRO-3-style fully-sharded-data-parallel partition rules (factory).

    Beyond the reference (SURVEY §2.7: FSDP/ZeRO absent there — its models
    fit per-GPU). On TPU it is just a rules function: every parameter with
    >= min_size elements is sharded over the data axis along its largest
    axis-divisible dim, optimizer moments inherit the same sharding through
    `opt_state_shardings`, and XLA's SPMD partitioner inserts the per-use
    all-gather and the grad reduce-scatter on ICI. Small params (biases,
    BN) stay replicated — sharding them costs more collective latency than
    the bytes saved. With classifier_model_axis the margin-loss classifier
    weight keeps its row-parallel MODEL_AXIS sharding (the two compose).

    Returns rules(path, leaf) -> PartitionSpec for Trainer(partition_rules=).
    """
    n = int(mesh.shape[axis])
    model_n = int(mesh.shape.get(MODEL_AXIS, 1))

    def rules(path, leaf) -> P:
        shape = tuple(getattr(leaf, "shape", ()))
        keys = [getattr(p, "key", "") for p in path]
        if (
            classifier_model_axis
            and model_n > 1
            and "loss" in keys
            and keys
            and keys[-1] == "weight"
            and len(shape) == 2
        ):
            return P(MODEL_AXIS, None)
        if not shape or int(np.prod(shape)) < min_size or n <= 1:
            return P()
        # Prefer the LAST dim (output features): input dims of fused
        # kernels are consumed via block slices (_SplitGlobalConv splits
        # att1's [1, 3C, F] along 3C) and slicing a sharded dim at
        # non-shard-aligned offsets forces the SPMD partitioner into
        # involuntary full rematerialization (all-gather + repartition per
        # use — the MULTICHIP_r03 warning tail). The output dim is never
        # sliced, and matmul outputs can stay sharded through it. Fall back
        # to the other dims largest-first.
        order = ([len(shape) - 1] if shape[-1] % n == 0 else []) + sorted(
            (i for i in range(len(shape) - 1)), key=lambda i: -shape[i]
        )
        for i in order:
            if shape[i] % n == 0:
                spec: list = [None] * len(shape)
                spec[i] = axis
                return P(*spec)
        return P()

    return rules


def partition_params(mesh: Mesh, params: Any, rules=classifier_partition_rules) -> Any:
    """NamedSharding tree for a param pytree from `rules(path, leaf) -> P`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, rules(path, leaf)), params
    )


def opt_state_shardings(
    mesh: Mesh, opt_state: Any, params: Any, param_shardings: Any
) -> Any:
    """Give optimizer-state leaves the sharding of the same-shaped param.

    optax states mirror the param tree (adam mu/nu etc.) but with extra
    wrapper nodes, so we match by array shape: a shape that maps to exactly
    one param sharding inherits it; ambiguous or unknown shapes stay
    replicated (safe — XLA inserts resharding where needed)."""
    shape_to_sharding = {}
    ambiguous = set()
    for p, s in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(param_shardings),
    ):
        sh = tuple(p.shape)
        if sh in shape_to_sharding and shape_to_sharding[sh].spec != s.spec:
            ambiguous.add(sh)
        shape_to_sharding[sh] = s
    rep = NamedSharding(mesh, P())

    def pick(x):
        sh = tuple(getattr(x, "shape", ()))
        if sh in shape_to_sharding and sh not in ambiguous:
            return shape_to_sharding[sh]
        return rep

    return jax.tree_util.tree_map(pick, opt_state)


def host_local_slice(num_items: int, *, epoch: int = 0, shuffle_seed: int = 1024):
    """Deterministic per-host partition of a global index set.

    Reproduces the reference DistributedSampler rank split with per-epoch
    reshuffle (egs_online.py:67-128): shuffle indices with seed+epoch, then
    take every process_count-th item starting at process_index.
    """
    rng = np.random.default_rng(shuffle_seed + epoch)
    idx = rng.permutation(num_items)
    return idx[jax.process_index() :: jax.process_count()]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (the jax twin of the reference's DDP rendezvous,
    utils.py:457-466): call once per host before make_mesh(); afterwards
    jax.devices() spans the slice and the same jitted step runs SPMD over
    ICI+DCN. On TPU pods with default env vars, call with no arguments.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)

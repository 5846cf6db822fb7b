"""Checkpoint / resume (parity: trainer_online.py:113-196 save_model/resume).

Layout mirrors the reference:
    <dir>/<epoch>.params            — msgpack of {params, batch_stats[, opt_state]}
    <dir>/checkpoint_info/<epoch>.yaml — step / lr / loss sidecar
    <dir>/final.params              — symlink to the last epoch
Resume restores params+batch_stats (+ optionally optimizer state — the
reference intentionally skips it, trainer_online.py:125-130; we make it a
flag). Transfer learning filters/renames keys like
framework.py:133-143's transform_keys.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import yaml
from flax import serialization

from .trainer import TrainState


def save_checkpoint(
    directory: str,
    state: TrainState,
    epoch: Any,
    *,
    info: Optional[Dict] = None,
    save_optimizer: bool = True,
) -> str:
    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": int(jax.device_get(state.step)),
    }
    if save_optimizer:
        payload["opt_state"] = jax.device_get(state.opt_state)
    path = os.path.join(directory, f"{epoch}.params")
    with open(path, "wb") as f:
        # to_state_dict flattens optax NamedTuple states into dicts
        f.write(
            serialization.msgpack_serialize(
                serialization.to_state_dict(payload), in_place=True
            )
        )
    info_dir = os.path.join(directory, "checkpoint_info")
    os.makedirs(info_dir, exist_ok=True)
    with open(os.path.join(info_dir, f"{epoch}.yaml"), "w") as f:
        yaml.safe_dump(
            {"epoch": epoch, "step": payload["step"], **(info or {})}, f
        )
    final = os.path.join(directory, "final.params")
    if os.path.basename(path) != "final.params":
        if os.path.islink(final) or os.path.exists(final):
            os.remove(final)
        os.symlink(os.path.basename(path), final)
    return path


def load_checkpoint(
    path: str,
    state: Optional[TrainState] = None,
    *,
    restore_optimizer: bool = False,
) -> TrainState | Dict:
    """Load a checkpoint. With a template `state`, returns a new TrainState
    (optimizer restored only if asked — reference default is not to)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(bytearray(f.read()))
    if state is None:
        return payload
    new = state.replace(
        params=_restore_like(state.params, payload["params"]),
        batch_stats=_restore_like(state.batch_stats, payload["batch_stats"]),
        step=jax.numpy.asarray(payload.get("step", 0), jax.numpy.int32),
    )
    if restore_optimizer and "opt_state" in payload:
        new = new.replace(
            opt_state=_restore_like(state.opt_state, payload["opt_state"])
        )
    return new


def _restore_like(template: Any, data: Any) -> Any:
    """Restore `data` leaves onto `template`'s shapes/dtypes — and its
    SHARDINGS: a template whose leaves live sharded on a mesh (FSDP /
    model-axis training states) gets each restored leaf device_put with
    the same NamedSharding, so resuming a sharded run re-shards directly
    instead of materializing a replicated copy per device."""
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    flat_d = jax.tree_util.tree_leaves(data)
    if len(flat_t) != len(flat_d):
        raise ValueError(
            f"checkpoint structure mismatch: {len(flat_d)} leaves vs "
            f"{len(flat_t)} in template"
        )
    restored = []
    for t, d in zip(flat_t, flat_d):
        arr = np.asarray(d).reshape(t.shape).astype(t.dtype)
        sharding = getattr(t, "sharding", None)
        if sharding is not None and getattr(sharding, "mesh", None) is not None:
            arr = jax.device_put(arr, sharding)
        restored.append(arr)
    return jax.tree_util.tree_unflatten(treedef, restored)


def load_transfer(
    params: Dict,
    checkpoint_path: str,
    *,
    include: Optional[Sequence[str]] = None,
    exclude: Optional[Sequence[str]] = None,
    rename: Optional[Dict[str, str]] = None,
) -> Dict:
    """Transfer-learning load: copy matching top-level subtrees by name.

    Parity: load_transform_state_dict + transform_keys / rename (reference
    framework.py:133-143, ecapa model :351-357). `rename` maps checkpoint
    key -> target key.
    """
    with open(checkpoint_path, "rb") as f:
        payload = serialization.msgpack_restore(bytearray(f.read()))
    src = dict(payload["params"])
    if rename:
        for old, new in rename.items():
            if old in src:
                src[new] = src.pop(old)
    out = dict(params)
    for key in out:
        if include is not None and key not in include:
            continue
        if exclude is not None and key in exclude:
            continue
        if key in src:
            out[key] = _restore_like(out[key], src[key])
    return out

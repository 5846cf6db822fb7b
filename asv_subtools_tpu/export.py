"""Model export for serving (parity: pipeline/export_jit_model.sh +
onestep/export_jit.py:26-58 and the nnet.config blueprint idiom,
utils.py:189-202).

Two artifacts per export, mirroring the reference's jit .pt + nnet.config:
  <dir>/model.stablehlo      — jax.export serialized embed function
                               (per bucket length), loadable without the
                               model's python class
  <dir>/nnet_config.yaml     — model name + constructor params + ckpt ref,
                               so python consumers can rebuild the flax
                               module instead (transfer learning etc.)
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax import export as jax_export


def export_embed_fn(
    embed_fn: Callable,
    feat_dim: int,
    out_dir: str,
    bucket_lengths: Sequence[int] = (200, 400, 800, 1600, 3200, 6400, 10000),
    batch_sizes: Sequence[int] = (1, 8, 32),
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Dict[str, str]:
    """Serialize `embed_fn(x [B, T, D], mask [B, T]) -> [B, E]` for every
    (bucket, batch) shape; returns {shape_key: path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for t in bucket_lengths:
        for b in batch_sizes:
            exp = jax_export.export(
                jax.jit(embed_fn), platforms=list(platforms)
            )(
                jax.ShapeDtypeStruct((b, t, feat_dim), jnp.float32),
                jax.ShapeDtypeStruct((b, t), jnp.bool_),
            )
            key = f"b{b}_t{t}"
            path = os.path.join(out_dir, f"model_{key}.stablehlo")
            with open(path, "wb") as f:
                f.write(exp.serialize())
            paths[key] = path
    return paths


def load_embed_fn(path: str) -> Callable:
    """Load a serialized embed function; returns a callable."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    return exp.call


def write_nnet_config(
    out_dir: str,
    model_name: str,
    model_params: Dict,
    checkpoint_path: str,
    feat_config: Optional[Dict] = None,
) -> str:
    """Blueprint + creation-string equivalent: enough to rebuild the model
    class and reload params (reference config/nnet.config)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "nnet_config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(
            {
                "model_name": model_name,
                "model_params": model_params,
                "checkpoint": os.path.abspath(checkpoint_path),
                "feat_config": feat_config or {},
            },
            f,
            sort_keys=False,
        )
    return path


def load_model_from_config(config_path: str):
    """Rebuild (module, variables) from nnet_config.yaml."""
    from .models import MODELS
    from .train.checkpoint import load_checkpoint

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    module = MODELS[cfg["model_name"]](**cfg.get("model_params", {}))
    payload = load_checkpoint(cfg["checkpoint"])
    variables = {
        "params": payload["params"],
        "batch_stats": payload.get("batch_stats", {}),
    }
    return module, variables, cfg

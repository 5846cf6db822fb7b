"""Weight-only int8 quantization for serving.

Parity: the reference's optional dynamic int8 quantization at jit export
(pipeline/onestep/export_jit.py torch.quantization.quantize_dynamic).

Per-output-channel symmetric int8 for every >=2D kernel:
    q = round(w / scale), scale = max|w| / 127 per output channel.
`quantize_params` produces a compact tree {values int8, scales f32};
`dequantize_params` restores f32 weights (XLA folds the dequant multiply
into the consuming matmul). Storage: ~4x smaller checkpoints; on-chip the
dequantized weights run the normal bf16/f32 path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_leaf(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    axes = tuple(range(w.ndim - 1))
    scale = np.max(np.abs(w), axis=axes, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"int8_values": q, "int8_scales": scale.astype(np.float32)}


def quantize_params(params: Any, min_size: int = 1024) -> Any:
    """Quantize every float kernel with >=2 dims and >= min_size elements.

    Biases, BN scales, and small params stay float32.
    """

    def convert(leaf):
        arr = np.asarray(leaf)
        if (
            arr.ndim >= 2
            and arr.size >= min_size
            and np.issubdtype(arr.dtype, np.floating)
        ):
            return _quantize_leaf(arr.astype(np.float32))
        return arr

    return jax.tree_util.tree_map(convert, params)


def _is_qleaf(node) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) == {"int8_values", "int8_scales"}
    )


def dequantize_params(qparams: Any, dtype=jnp.float32) -> Any:
    """Inverse of quantize_params (returns jnp arrays)."""

    def walk(node):
        if _is_qleaf(node):
            return (
                jnp.asarray(node["int8_values"], jnp.float32)
                * jnp.asarray(node["int8_scales"])
            ).astype(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jnp.asarray(node)

    return walk(qparams)


def quantization_error(params: Any, qparams: Any) -> float:
    """Max relative weight error introduced by quantization."""
    deq = dequantize_params(qparams)
    errs = []

    def cmp(a, b):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-12)
        errs.append(float(np.abs(a - b).max() / denom))

    jax.tree_util.tree_map(cmp, params, deq)
    return max(errs) if errs else 0.0

"""Positional encodings (parity: pytorch/libs/nnet/transformer/embedding.py).

abs_pos (sinusoidal added), rel_pos (Transformer-XL style: returns the
position-embedding tensor for the attention bias path), rot_pos (RoPE
frequencies), no_pos. All precomputed host-side per static length.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_table(length: int, dim: int) -> np.ndarray:
    """Standard transformer sin/cos table [length, dim] (float32)."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    table = np.zeros((length, dim))
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table.astype(np.float32)


def abs_position_encoding(x: jax.Array, scale: bool = True) -> jax.Array:
    """x [B, T, D] + sinusoid PE; x scaled by sqrt(D) first (wenet abs_pos)."""
    t, d = x.shape[-2], x.shape[-1]
    pe = jnp.asarray(sinusoid_table(t, d))
    if scale:
        x = x * math.sqrt(d)
    return x + pe


def rel_position_encoding(t: int, d: int) -> jax.Array:
    """Relative PE tensor for Transformer-XL attention: positions
    [t-1 ... -(t-1)] -> [2t-1, d]."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    table = np.zeros((2 * t - 1, d))
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(table, jnp.float32)


def rope_freqs(t: int, rot_dim: int) -> Tuple[jax.Array, jax.Array]:
    """RoPE cos/sin tables [t, rot_dim//2]."""
    inv = 1.0 / (10000 ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    ang = np.arange(t, dtype=np.float64)[:, None] * inv[None, :]
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs of dims. x [..., T, D] with D even; cos/sin [T, D/2]."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    out = jnp.stack([out1, out2], axis=-1)
    return out.reshape(x.shape)

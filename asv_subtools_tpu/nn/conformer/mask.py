"""Attention masks (parity: pytorch/libs/nnet/transformer/mask.py).

Padding masks, chunk masks for streaming-style training, and the dynamic
chunk sampling policy. All masks are boolean with True = attend.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B, T] True for VALID positions (note: inverse of wenet's pad mask)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def subsequent_chunk_mask(
    size: int, chunk_size: int, num_left_chunks: int = -1
) -> jax.Array:
    """[T, T] chunk-causal mask: position i attends within its chunk and up
    to num_left_chunks previous chunks (mask.py subsequent_chunk_mask)."""
    idx = np.arange(size)
    chunk_of = idx // chunk_size
    q = chunk_of[:, None]
    k = chunk_of[None, :]
    ok = k <= q
    if num_left_chunks >= 0:
        ok = ok & (k >= q - num_left_chunks)
    return jnp.asarray(ok)


def add_optional_chunk_mask(
    pad_mask: Optional[jax.Array],
    size: int,
    static_chunk_size: int = 0,
    num_left_chunks: int = -1,
) -> Optional[jax.Array]:
    """Combine padding mask [B, T] with a chunk mask -> [B, 1, T, T]."""
    att = None
    if pad_mask is not None:
        att = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
    if static_chunk_size > 0:
        cm = subsequent_chunk_mask(size, static_chunk_size, num_left_chunks)
        cm = cm[None, None, :, :]
        att = cm if att is None else att & cm
    return att

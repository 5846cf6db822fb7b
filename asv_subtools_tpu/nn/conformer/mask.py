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


def _traced_chunk_mask(
    size: int, chunk_size: jax.Array, num_left_chunks: jax.Array
) -> jax.Array:
    """subsequent_chunk_mask with TRACED chunk size / left count (for the
    dynamic-chunk training policy) — same [T, T] semantics, jittable."""
    co = jnp.arange(size) // jnp.maximum(chunk_size, 1)
    q, k = co[:, None], co[None, :]
    ok = k <= q
    return jnp.where(num_left_chunks >= 0, ok & (k >= q - num_left_chunks), ok)


def dynamic_chunk_mask(
    rng: jax.Array,
    size: int,
    use_dynamic_left_chunk: bool = False,
) -> jax.Array:
    """Sample the wenet dynamic-chunk training mask (reference
    mask.py:72-93): chunk_size ~ U[1, T); if it lands above T//2 the batch
    trains full-context, else chunk becomes (chunk %% 25) + 1 (the 1 s /
    4x-subsampling streaming budget), optionally with a random number of
    left chunks. Returns a [T, T] boolean mask. Fully jittable — the
    sampled sizes stay traced scalars."""
    r1, r2 = jax.random.split(rng)
    c = jax.random.randint(r1, (), 1, max(size, 2))
    full = c > size // 2
    chunk = jnp.where(full, size, c % 25 + 1)
    left = jnp.asarray(-1)
    if use_dynamic_left_chunk:
        max_left = jnp.maximum((size - 1) // chunk, 1)
        left = jnp.where(full, -1, jax.random.randint(r2, (), 0, max_left))
    return _traced_chunk_mask(size, chunk, left)


def add_optional_chunk_mask(
    pad_mask: Optional[jax.Array],
    size: int,
    static_chunk_size: int = 0,
    num_left_chunks: int = -1,
    use_dynamic_chunk: bool = False,
    use_dynamic_left_chunk: bool = False,
    rng: Optional[jax.Array] = None,
    decoding_chunk_size: int = 0,
) -> Optional[jax.Array]:
    """Combine padding mask [B, T] with a chunk mask -> [B, 1, T, T].

    Mirrors reference mask.py:44-109 add_optional_chunk_mask:
    use_dynamic_chunk + decoding_chunk_size==0 samples a random chunk
    policy per batch (training; requires `rng` — without one, e.g. at
    inference, it falls back to full context rather than drawing torch-style
    randomness in eval), <0 forces full context, >0 uses the fixed decode
    chunk; otherwise static_chunk_size>0 applies the static chunk mask.
    """
    att = None
    if pad_mask is not None:
        att = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
    cm = None
    if use_dynamic_chunk:
        if decoding_chunk_size > 0:
            cm = subsequent_chunk_mask(size, decoding_chunk_size, num_left_chunks)
        elif decoding_chunk_size == 0 and rng is not None:
            cm = dynamic_chunk_mask(rng, size, use_dynamic_left_chunk)
        # decoding_chunk_size < 0 (or no rng): full context
    elif static_chunk_size > 0:
        cm = subsequent_chunk_mask(size, static_chunk_size, num_left_chunks)
    if cm is not None:
        cm = cm[None, None, :, :]
        att = cm if att is None else att & cm
    return att

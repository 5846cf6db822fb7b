"""Fused Pallas masked statistics pooling: mean + std in one VMEM pass.

Measured outcome (v5e, B=64 T=1000 D=1536, fresh inputs per call): the
XLA lowering of nn.pooling.StatisticsPooling runs at ~290 GB/s effective;
this hand kernel reaches ~165-210 GB/s across tile configs — XLA already
emits a single fused sum/sum-of-squares loop for the masked reduction, so
the hand-scheduled version only adds pipeline overhead. The op is
HBM-bound either way (~35% of the ~820 GB/s peak, limited by the [B,T,D]
read) and is a few percent of total model time.

Conclusion: nn.pooling.StatisticsPooling (XLA) stays the default path;
this kernel is kept as a verified-correct Pallas reduction pattern
(grid-accumulated output blocks) and a benchmark baseline.

Semantics match nn.pooling.StatisticsPooling (biased std, eps floor).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1.0e-10

T_TILE = 512  # frames per grid step
D_TILE = 128  # feature lanes per grid step


def _kernel(x_ref, mask_ref, out_ref, *, t_total: int, t_tiles: int):
    """Grid (B, D_tiles, T_tiles); accumulate into out [1, 2, D_TILE]."""
    tt = pl.program_id(2)

    @pl.when(tt == 0)
    def _init():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    x = x_ref[0]  # [T_TILE, D_TILE]
    m = mask_ref[0]  # [T_TILE, 1] float {0,1}
    xm = x * m
    s1 = jnp.sum(xm, axis=0)  # [D_TILE]
    s2 = jnp.sum(xm * x, axis=0)
    out_ref[0, 0, :] += s1
    out_ref[0, 1, :] += s2


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stats_pooling(
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """x [B, T, D], mask [B, T] (True=valid) -> [B, 2*D] (mean ++ std)."""
    b, t, d = x.shape
    if mask is None:
        mask = jnp.ones((b, t), bool)
    count = jnp.sum(mask, axis=1).astype(jnp.float32)  # [B]

    t_pad = -(-t // T_TILE) * T_TILE
    d_pad = -(-d // D_TILE) * D_TILE
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, t_pad - t), (0, d_pad - d)))
    mp = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, t_pad - t)))[..., None]

    t_tiles = t_pad // T_TILE
    d_tiles = d_pad // D_TILE
    sums = pl.pallas_call(
        functools.partial(_kernel, t_total=t, t_tiles=t_tiles),
        grid=(b, d_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, T_TILE, D_TILE),
                lambda i, j, k: (i, k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T_TILE, 1), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, D_TILE), lambda i, j, k: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, d_pad), jnp.float32),
        interpret=interpret,
    )(xp, mp)

    n = jnp.maximum(count, 1.0)[:, None]
    mean = sums[:, 0, :d] / n
    var = sums[:, 1, :d] / n - mean * mean
    std = jnp.sqrt(jnp.maximum(var, _EPS))
    return jnp.concatenate([mean, std], axis=-1)

"""Fused Pallas ECAPA attentive-stats pooling (inference path).

The XLA lowering of EcapaAttentiveStatsPool streams the [B, T, C]
activations 6-7 times (global mean/std pass, att1 GEMM, BN/tanh, att2
GEMM, masked softmax max+sum, two weighted reductions) — ~3.9 GB accessed
at B=128, T=998, C=1536, running at ~90% of the HBM roof but over 2x the
necessary bytes. This kernel does the whole pooling in TWO streams over x
(flash-attention-style online softmax), with the attention logits
recomputed per tile instead of materialized:

  grid (B, phase, T_tiles), sequential per batch row:
    phase 0: accumulate masked Σx, Σx² per channel            (1st stream)
    phase 1, t==0: global mean/std (unbiased, +1e-5), fold the
      att1 global terms into one [K] vector; reset M/S/N1/N2
    phase 1: u = x@Wx + glob; h = tanh(relu(u)·bn_s + bn_t);
      a = h@W2 + b2 (masked); online-softmax rescale of the
      running per-channel (max M, exp-sum S, Σe·x N1, Σe·x² N2)  (2nd stream)
    phase 1, t==last: write [mean_w ; std_w] = [N1/S ; sqrt(max(N2/S −
      (N1/S)², 1e-5))]

Inference only: the att BN is folded to an affine from its running stats
(training keeps the XLA path — batch stats need a cross-batch reduction
that would serialize the grid). Semantics match
models/ecapa.EcapaAttentiveStatsPool(train=False) with time_attention and
batch_norm (reference parity: AttentiveStatsPool,
pytorch/model/ecapa_tdnn_xvector.py:159-190); the fused path computes the
softmax/statistics in f32 (the XLA bf16 path is the looser one).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 256  # frames per grid step (bf16 sublane x16 -> 256 is ample)


def _kernel(
    cnt_ref,  # [1, 8, 128] f32: masked frame count, broadcast (tile-shaped
    #           because Mosaic block mappings need (8, 128)-aligned tails)
    x_ref,  # [1, T_TILE, C] input tile
    m_ref,  # [1, T_TILE, 1] f32 mask tile (1=valid)
    wx_ref,  # [C, K]
    wm_ref,  # [C, K]
    ws_ref,  # [C, K]
    b1_ref,  # [1, K]
    bns_ref,  # [1, K] folded BN scale
    bnt_ref,  # [1, K] folded BN shift
    w2_ref,  # [K, C]
    b2_ref,  # [1, C]
    out_ref,  # [1, 2, C] f32: row 0 = weighted mean, row 1 = weighted std
    s1,  # scratch [1, C] f32: Σ x (phase 0)
    s2,  # scratch [1, C] f32: Σ x²
    glob,  # scratch [8, K] f32 row 0: mean@Wm + std@Ws + b1
    run_sum,  # scratch [8, C] f32 row 0: Σ exp(a)
    n1,  # scratch [8, C] f32 row 0: Σ exp(a)·x
    n2,  # scratch [8, C] f32 row 0: Σ exp(a)·x²
    *,
    t_tiles: int,
):
    p = pl.program_id(1)
    t = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # [T_TILE, C]
    m = m_ref[0]  # [T_TILE, 1]

    @pl.when(jnp.logical_and(p == 0, t == 0))
    def _init_sums():
        s1[0, :] = jnp.zeros_like(s1[0])
        s2[0, :] = jnp.zeros_like(s2[0])

    @pl.when(p == 0)
    def _accumulate_sums():
        xm = x * m
        s1[0, :] += jnp.sum(xm, axis=0)
        s2[0, :] += jnp.sum(xm * x, axis=0)

    @pl.when(jnp.logical_and(p == 1, t == 0))
    def _global_context():
        cnt = jnp.maximum(jnp.max(cnt_ref[0]), 1.0)
        mean = s1[0, :] / cnt  # [C]
        # unbiased variance + 1e-5, matching torch.var(ddof=1) semantics
        var = (s2[0, :] - cnt * mean * mean) / jnp.maximum(cnt - 1.0, 1.0)
        std = jnp.sqrt(jnp.maximum(var, 0.0) + 1e-5)
        g = (
            jnp.sum(mean[:, None] * wm_ref[:].astype(jnp.float32), axis=0)
            + jnp.sum(std[:, None] * ws_ref[:].astype(jnp.float32), axis=0)
            + b1_ref[0, :]
        )
        glob[0, :] = g
        run_sum[0, :] = jnp.zeros_like(run_sum[0])
        n1[0, :] = jnp.zeros_like(n1[0])
        n2[0, :] = jnp.zeros_like(n2[0])

    @pl.when(p == 1)
    def _attend():
        u = (
            jnp.dot(x_ref[0], wx_ref[:], preferred_element_type=jnp.float32)
            + glob[0, :][None, :]
        )
        h = jnp.tanh(jax.nn.relu(u) * bns_ref[0, :][None, :] + bnt_ref[0, :][None, :])
        a = (
            jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                    preferred_element_type=jnp.float32)
            + b2_ref[0, :][None, :]
        )  # [T_TILE, C] per-channel time logits
        # |h| <= 1 (tanh), so |a| <= ||W2||_1 + |b2| — far from exp's f32
        # overflow at 88 for any trained model. No online max rescale
        # needed: exp(a) directly (clamped as a hard backstop; softmax is
        # only altered if logits exceed 80, where f32 would overflow
        # anyway), masked rows zeroed by the mask multiply.
        e = jnp.exp(jnp.minimum(a, 80.0)) * m
        run_sum[0, :] += jnp.sum(e, axis=0)
        ex = e * x
        n1[0, :] += jnp.sum(ex, axis=0)
        n2[0, :] += jnp.sum(ex * x, axis=0)

    @pl.when(jnp.logical_and(p == 1, t == t_tiles - 1))
    def _finalize():
        s = jnp.maximum(run_sum[0, :], 1e-30)
        mean_w = n1[0, :] / s
        var_w = n2[0, :] / s - mean_w * mean_w
        out_ref[0, 0, :] = mean_w
        out_ref[0, 1, :] = jnp.sqrt(jnp.maximum(var_w, 1e-5))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attentive_stats_pool(
    x: jax.Array,
    wx: jax.Array,
    wm: jax.Array,
    ws: jax.Array,
    b1: jax.Array,
    bn_scale: jax.Array,
    bn_shift: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x [B, T, C] -> [B, 2C] attentive (mean ++ std).

    wx/wm/ws [C, K] + b1 [K]: the att1 conv1x1 over [x; mean; std] split
    blockwise; bn_scale/bn_shift [K]: the att BN folded to an affine from
    its running stats; w2 [K, C] + b2 [C]: att2. Softmax over time per
    channel, flash-style online rescaling.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, c = x.shape
    k = wx.shape[1]
    if c % 128:
        raise ValueError(f"channels {c} must be lane-aligned (128)")
    kp = -(-k // 128) * 128
    if kp != k:  # pad bottleneck to a lane multiple with dead columns
        wx, wm, ws = (jnp.pad(w, ((0, 0), (0, kp - k))) for w in (wx, wm, ws))
        b1 = jnp.pad(b1, (0, kp - k))
        bn_scale = jnp.pad(bn_scale, (0, kp - k))
        bn_shift = jnp.pad(bn_shift, (0, kp - k))
        w2 = jnp.pad(w2, ((0, kp - k), (0, 0)))

    if mask is None:
        mask = jnp.ones((b, t), bool)
    t_pad = -(-t // T_TILE) * T_TILE
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    mp = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, t_pad - t)))[..., None]
    cnt = jnp.broadcast_to(
        jnp.sum(mask.astype(jnp.float32), axis=1)[:, None, None], (b, 8, 128)
    )
    t_tiles = t_pad // T_TILE

    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, t_tiles=t_tiles),
        grid=(b, 2, t_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, p, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE, c), lambda i, p, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE, 1), lambda i, p, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, kp), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, kp), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, kp), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, p, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), f32),
        scratch_shapes=[  # (8, .) rows: sublane-aligned; only row 0 is used
            pltpu.VMEM((8, c), f32),  # s1
            pltpu.VMEM((8, c), f32),  # s2
            pltpu.VMEM((8, kp), f32),  # glob
            pltpu.VMEM((8, c), f32),  # run_sum
            pltpu.VMEM((8, c), f32),  # n1
            pltpu.VMEM((8, c), f32),  # n2
        ],
        interpret=interpret,
    )(
        cnt,
        xp,
        mp,
        wx,
        wm,
        ws,
        b1.astype(f32)[None, :],
        bn_scale.astype(f32)[None, :],
        bn_shift.astype(f32)[None, :],
        w2,
        b2.astype(f32)[None, :],
    )
    return jnp.concatenate([out[:, 0, :], out[:, 1, :]], axis=-1)

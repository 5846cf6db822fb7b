"""Fused Pallas kernel for the ECAPA Res2Net chain (inference).

The res2 chain (reference ecapa_tdnn_xvector.py:17-75) is 7 SEQUENTIAL
128-channel dilated convs with relu+BN between: XLA runs it as 7 separate
conv ops, each writing its [B, T, 128] stage output to HBM and reading it
back (measured 2.0-2.6 ms per block at B=128 x 10 s — 3-4x over the HBM
roof; the 1x1 convs around it already run at ~96% of the MXU peak, so
this chain is the remaining hot spot of the extract graph).

This kernel keeps the WHOLE chain in VMEM: one grid step = one batch row,
the full [T, C] block resident; each stage is three shifted
[T, 128] @ [128, 128] GEMMs (taps of the k=3 dilated conv, f32
accumulate) + bias + relu + folded BN affine, and only the final
[T, C] concat is written back to HBM — one read + one write of the
activation tensor for the whole chain instead of eight.

Inference-only: BN running stats fold into per-stage (scale, shift) on
the host. Training keeps the XLA path (batch stats are a global
reduction, which cannot be tiled per batch row).

Semantics parity: Res2NetBlock (models/ecapa.py) with
ReluBatchNormTdnnLayer stages (relu -> BN order, conv zero 'same'
padding); golden-tested against the flax module in
tests/test_pallas_res2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget gate: x block + out block + stage intermediates, double
# buffered. [1280, 1024] bf16 = 2.6 MB per tensor.
MAX_T_PAD = 1280


def _kernel(x_ref, w_ref, b_ref, s_ref, t_ref, o_ref, pat_ref, *,
            n_stages: int, h: int, d: int, t: int, t_pad: int):
    x = x_ref[0]  # [t_pad, C] bf16
    zpad = jnp.zeros((d, h), jnp.float32)
    if t < t_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
        valid = row < t
    outs = [x[:, :h]]
    sp = None
    for i in range(n_stages):
        part = x[:, (i + 1) * h : (i + 2) * h].astype(jnp.float32)
        sp = part if i == 0 else sp + part
        # k=3 dilated conv as ONE K=3h GEMM per stage: lane-concat of the
        # three row-shifted tap views (in-VMEM im2col). K=128 GEMMs top out
        # at ~30 TFLOP/s on v5e (one MXU's stream); K=384 measures ~119.
        # Zero row-pad = the conv's 'same' zero padding. The chain state
        # stays f32: pltpu.roll (the sublane realign Mosaic needs before a
        # lane-concat of shifted views) is 32-bit-only; the GEMM input is
        # cast to bf16 per tap.
        spp = jnp.concatenate([zpad, sp, zpad], axis=0)  # [t_pad+2d, h]
        # assemble [t_pad, 3h] through a VMEM scratch: Mosaic cannot
        # lane-concat vectors whose sublane offsets differ (the shifted tap
        # views), but a store relayouts to offset 0
        for k in range(3):
            pat_ref[:, k * h : (k + 1) * h] = (
                spp[k * d : k * d + t_pad].astype(jnp.bfloat16)
            )
        z = jnp.dot(pat_ref[:], w_ref[i], preferred_element_type=jnp.float32)
        z = jax.nn.relu(z + b_ref[i])
        sp = z * s_ref[i] + t_ref[i]  # folded BN (inference running stats)
        if t < t_pad:
            # rows >= t are kernel row-padding, not model frames: keep them
            # zero so the next stage's taps read the conv zero-pad value
            sp = jnp.where(valid, sp, 0.0)
        outs.append(sp.astype(jnp.bfloat16))
    o_ref[0] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_res2_chain(
    x: jax.Array,          # [B, T, C] (C = scale * 128)
    w: jax.Array,          # [n_stages, 3, h, h] conv taps
    b: jax.Array,          # [n_stages, h] conv bias
    bn_scale: jax.Array,   # [n_stages, h] folded BN scale
    bn_shift: jax.Array,   # [n_stages, h] folded BN shift
    dilation: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bsz, t, c = x.shape
    n_stages, k, h, h2 = w.shape
    if k != 3 or h != h2 or (n_stages + 1) * h != c:
        raise ValueError("unsupported res2 geometry")
    if h % 128:
        raise ValueError("hidden width must be lane-aligned")
    t_pad = -(-t // 16) * 16
    if t_pad > MAX_T_PAD:
        raise ValueError("T too long for the VMEM-resident kernel")
    xp = x.astype(jnp.bfloat16)
    if t_pad != t:
        xp = jnp.pad(xp, ((0, 0), (0, t_pad - t), (0, 0)))
    # stage-table sublane padding (n_stages=7 -> 8); conv taps flattened to
    # [3h, h] per stage to match the kernel's tap-concat GEMM layout
    n_pad = -(-n_stages // 8) * 8
    pad_rows = n_pad - n_stages
    w_cat = w.reshape(n_stages, 3 * h, h)
    wp = jnp.pad(w_cat.astype(jnp.bfloat16), ((0, pad_rows), (0, 0), (0, 0)))
    bp = jnp.pad(b.astype(jnp.float32), ((0, pad_rows), (0, 0)))
    sp_ = jnp.pad(bn_scale.astype(jnp.float32), ((0, pad_rows), (0, 0)))
    tp_ = jnp.pad(bn_shift.astype(jnp.float32), ((0, pad_rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, n_stages=n_stages, h=h, d=dilation,
                          t=t, t_pad=t_pad),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 3 * h, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((t_pad, 3 * h), jnp.bfloat16)],
        interpret=interpret,
    )(xp, wp, bp, sp_, tp_)
    return out[:, :t, :]

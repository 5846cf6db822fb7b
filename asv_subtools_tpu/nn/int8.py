"""Dynamic int8 matmul path for inference (serving).

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 TOPS vs 197
TFLOP/s), and ECAPA extraction is compute-bound (PERF.md: 63% of the
bf16 roof), so the channel-mixing GEMMs — the SERes2Block 1x1 convs and
the MFA conv, ~60% of the graph's FLOPs — are the int8 target.

Scheme (mirrors the reference's dynamic quantization at jit export,
pipeline/onestep/export_jit.py, but for the MXU compute path rather
than storage):
  activations: symmetric per-row (each [b, t] frame) int8, scales from
    the running max|x| over channels — computed on the fly (VPU cost is
    one reduce + multiply, negligible next to the GEMM);
  weights: symmetric per-output-channel int8 (same scheme as
    quantize.py), quantized on the fly from the live params — the param
    tree is unchanged, so checkpoints and converters are untouched;
  GEMM in int8 with int32 accumulation, rescaled in f32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dynamic_int8_dot(
    x: jax.Array, w: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """y = x @ w (+ bias) with dynamic symmetric int8 quantization.

    x: [..., in] float; w: [in, out] float; returns [..., out] f32.
    Per-row activation scales, per-output-channel weight scales.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y

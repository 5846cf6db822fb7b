#!/usr/bin/env python
"""Per-stage ablation of the ECAPA-C1024 extract graph on the real chip.

Times each architectural stage in isolation (salted-scan + device_get,
differential) to attribute the end-to-end 25.8 ms. Informs which kernel
to attack next; results summarized in PERF.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from roofline import _timed_scan  # the one canonical timing protocol


def diff_ms(fn, args, iters=16):
    """Per-iteration ms via differential timing (cancels the tunnel RTT)."""
    t1 = _timed_scan(fn, args, iters)
    t2 = _timed_scan(fn, args, 2 * iters)
    return (t2 - t1) / iters * 1e3


def main():
    from asv_subtools_tpu.models.ecapa import (
        EcapaAttentiveStatsPool, Res2NetBlock, SERes2Block,
    )
    from asv_subtools_tpu.nn.tdnn import ReluBatchNormTdnnLayer

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    b, t, c = 128, 998, 1024

    def bench_mod(name, mod, x, **kw):
        v = mod.init({"params": rng}, x, **kw)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)

        def f(salt, v, x):
            # cast back: bf16 * f32-scalar promotes to f32 (would measure
            # the f32 kernel)
            return mod.apply(v, (x * (1.0 + 1e-6 * salt)).astype(x.dtype), **kw)

        ms = diff_ms(f, (v, x))
        print(f"{name:42s} {ms:7.3f} ms")
        return ms

    x = jax.random.normal(rng, (b, t, c), jnp.bfloat16)
    feats = jax.random.normal(rng, (b, t, 80), jnp.bfloat16)

    bench_mod("layer1 conv5 80->1024 +bn+relu",
              ReluBatchNormTdnnLayer(c, context=(-2, -1, 0, 1, 2)), feats,
              train=False)
    bench_mod("SERes2Block d2 (1x1 + res2 + 1x1 + SE)",
              SERes2Block(c, dilation=2), x, train=False)
    bench_mod("res2net chain alone (7x 128ch conv3)",
              Res2NetBlock(c, dilation=2), x, train=False)
    bench_mod("1x1 conv 1024->1024 +bn+relu",
              ReluBatchNormTdnnLayer(c, context=(0,)), x, train=False)
    x3 = jax.random.normal(rng, (b, t, 3 * c), jnp.bfloat16)
    bench_mod("mfa conv1 3072->1536 +bn+relu",
              ReluBatchNormTdnnLayer(1536, context=(0,)), x3, train=False)
    y = jax.random.normal(rng, (b, t, 1536), jnp.bfloat16)
    bench_mod("attentive pooling", EcapaAttentiveStatsPool(), y, train=False)


if __name__ == "__main__":
    main()

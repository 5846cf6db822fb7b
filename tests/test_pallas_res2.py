"""Fused Pallas res2-chain kernel vs the flax Res2NetBlock (interpret mode).

The kernel is a measured NEGATIVE result on v5e (2.8 ms vs XLA's 1.9 ms
at B=128 x 10 s — Mosaic's misaligned-sublane relayouts for the shifted
conv taps cost more than the HBM round-trips they remove; see PERF.md).
It is kept verified for architectures where the balance differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.models.ecapa import Res2NetBlock
from asv_subtools_tpu.nn.pallas_res2 import fused_res2_chain


def _fold(mod, v, scale):
    p, s = v["params"], v["batch_stats"]
    n = scale - 1
    w = jnp.stack([p[f"block_{i}"]["affine"]["conv"]["kernel"] for i in range(n)])
    b = jnp.stack([p[f"block_{i}"]["affine"]["conv"]["bias"] for i in range(n)])
    g = jnp.stack([p[f"block_{i}"]["act_bn"]["bn"]["scale"] for i in range(n)])
    beta = jnp.stack([p[f"block_{i}"]["act_bn"]["bn"]["bias"] for i in range(n)])
    mean = jnp.stack([s[f"block_{i}"]["act_bn"]["bn"]["mean"] for i in range(n)])
    var = jnp.stack([s[f"block_{i}"]["act_bn"]["bn"]["var"] for i in range(n)])
    bn_s = g.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + 1e-5)
    bn_t = beta.astype(jnp.float32) - mean.astype(jnp.float32) * bn_s
    return w, b, bn_s, bn_t


@pytest.mark.parametrize("t,dilation", [(200, 2), (197, 3), (64, 4)])
def test_matches_flax_inference(t, dilation):
    scale, c = 8, 1024
    rng = jax.random.PRNGKey(0)
    mod = Res2NetBlock(c, scale=scale, dilation=dilation)
    x = jax.random.normal(rng, (2, t, c), jnp.float32)
    v = mod.init({"params": rng}, x, train=True)
    # non-trivial running stats
    _, upd = mod.apply(v, x * 2 + 0.3, train=True, mutable=["batch_stats"])
    v = {**v, "batch_stats": upd["batch_stats"]}
    ref = np.asarray(mod.apply(v, x, train=False), np.float32)
    w, b, bn_s, bn_t = _fold(mod, v, scale)
    out = np.asarray(
        fused_res2_chain(x, w, b, bn_s, bn_t, dilation=dilation), np.float32
    )
    # kernel runs the chain in bf16 (production dtype); tolerance is the
    # 7-stage bf16 accumulation noise, same scale as the att-pooling kernel
    d = np.abs(out - ref)
    assert d.max() < 0.06, d.max()
    assert d.mean() < 5e-3, d.mean()


def test_row_padding_isolated():
    """Frames past T must not leak into valid frames through the taps
    (t=197 -> t_pad=208 exercises the in-kernel row mask)."""
    scale, c, dilation = 8, 1024, 4
    rng = jax.random.PRNGKey(1)
    mod = Res2NetBlock(c, scale=scale, dilation=dilation)
    x = jax.random.normal(rng, (1, 197, c), jnp.float32)
    v = mod.init({"params": rng}, x, train=True)
    w, b, bn_s, bn_t = _fold(mod, v, scale)
    full = np.asarray(fused_res2_chain(x, w, b, bn_s, bn_t, dilation=dilation))
    # same content, different padding amount: prepend frames, compare tail
    x2 = jnp.concatenate([x, jax.random.normal(rng, (1, 16, c))], axis=1)
    full2 = np.asarray(fused_res2_chain(x2, w, b, bn_s, bn_t, dilation=dilation))
    np.testing.assert_allclose(full[:, :150], full2[:, :150], atol=1e-6)

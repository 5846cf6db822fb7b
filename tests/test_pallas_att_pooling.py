"""Fused Pallas attentive pooling vs the XLA EcapaAttentiveStatsPool
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.models.ecapa import EcapaAttentiveStatsPool


def _mk(b=2, t=300, c=256, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, c)), dtype)
    mod_ref = EcapaAttentiveStatsPool(fused_inference=False)
    mod_fused = EcapaAttentiveStatsPool(fused_inference=True)
    v = mod_ref.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # non-trivial BN running stats + biases so the affine fold is exercised
    v = jax.tree_util.tree_map(lambda a: a, v)
    import flax

    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    v["batch_stats"] = {
        "att_bn": {
            "mean": jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, size=(128,)), jnp.float32),
        }
    }
    return mod_ref, mod_fused, v, x


class TestFusedAttentivePooling:
    def test_matches_xla_unmasked(self):
        mod_ref, mod_fused, v, x = _mk()
        ref = mod_ref.apply(v, x, train=False)
        out = mod_fused.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_matches_xla_masked(self):
        mod_ref, mod_fused, v, x = _mk(t=511)
        lengths = jnp.asarray([511, 173])
        mask = jnp.arange(511)[None, :] < lengths[:, None]
        ref = mod_ref.apply(v, x, train=False, mask=mask)
        out = mod_fused.apply(v, x, train=False, mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_bf16_activations(self):
        """Serving configuration: bf16 x and params; fused path computes
        the softmax in f32 so it is the tighter of the two — compare at
        bf16-level tolerance."""
        mod_ref, mod_fused, v, x = _mk(dtype=jnp.bfloat16, seed=1)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v
        )
        ref = np.asarray(mod_ref.apply(v, x, train=False), np.float32)
        out = np.asarray(mod_fused.apply(v, x, train=False), np.float32)
        np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)

    def test_train_keeps_xla_path(self):
        """train=True must not hit the fused kernel (BN batch stats)."""
        mod_ref, mod_fused, v, x = _mk(t=256)
        a, _ = mod_fused.apply(v, x, train=True, mutable=["batch_stats"])
        b, _ = mod_ref.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_nonaligned_bottleneck(self):
        """bottleneck=64 pads K to 128 with dead columns."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 200, 128)), jnp.float32)
        ref_m = EcapaAttentiveStatsPool(bottleneck=64, fused_inference=False)
        fus_m = EcapaAttentiveStatsPool(bottleneck=64, fused_inference=True)
        v = ref_m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = ref_m.apply(v, x, train=False)
        out = fus_m.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

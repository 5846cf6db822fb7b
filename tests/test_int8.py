"""Dynamic-int8 inference path: correctness vs the float path.

The int8 channel-mix GEMMs (nn/int8.py, threaded through
EcapaTdnn(int8_inference=True)) must preserve embeddings to serving
tolerance. Parity bar mirrors the reference's int8 export claim
(pipeline/onestep/export_jit.py quantize_dynamic).
"""

import jax
import jax.numpy as jnp
import numpy as np

from asv_subtools_tpu.models import EcapaTdnn
from asv_subtools_tpu.nn.int8 import dynamic_int8_dot


class TestDynamicInt8Dot:
    def test_matches_float_within_quant_noise(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 50, 96)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(96, 64)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
        ref = x @ w + b
        out = dynamic_int8_dot(x, w, b)
        # int8 quant noise: rel error ~ (1/127) * sqrt(K-ish averaging)
        denom = np.maximum(np.abs(np.asarray(ref)), 1.0)
        rel = np.abs(np.asarray(out - ref)) / denom
        assert rel.max() < 0.05, rel.max()
        assert rel.mean() < 0.01, rel.mean()

    def test_int8_types_inside_jit(self):
        """The GEMM must actually run in int8 (s32 accumulation), not be
        constant-folded back to float."""
        x = jnp.ones((2, 8, 32), jnp.float32)
        w = jnp.ones((32, 16), jnp.float32)
        txt = jax.jit(lambda a, b: dynamic_int8_dot(a, b)).lower(x, w).as_text()
        assert "xi8>" in txt and "xi32>" in txt


class TestEcapaInt8Inference:
    def test_embedding_cosine_vs_float(self):
        rng = jax.random.PRNGKey(0)
        model = EcapaTdnn(channels=64, embd_dim=32, mfa_conv=96)
        x = jax.random.normal(rng, (4, 120, 30), jnp.float32)
        v = model.init({"params": rng}, x, train=False)
        ref = np.asarray(model.apply(v, x, train=False))
        q = EcapaTdnn(channels=64, embd_dim=32, mfa_conv=96,
                      int8_inference=True)
        out = np.asarray(q.apply(v, x, train=False))
        cos = np.sum(ref * out, axis=1) / (
            np.linalg.norm(ref, axis=1) * np.linalg.norm(out, axis=1)
        )
        assert cos.min() >= 0.999, cos

    def test_training_path_unaffected(self):
        """int8_inference must be inert under train=True (grads flow the
        float path)."""
        rng = jax.random.PRNGKey(1)
        q = EcapaTdnn(channels=16, embd_dim=8, mfa_conv=24,
                      int8_inference=True)
        x = jax.random.normal(rng, (2, 40, 10), jnp.float32)
        v = q.init({"params": rng}, x, train=False)

        def loss(params):
            out, _ = q.apply(
                {**v, "params": params}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(v["params"])
        gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0

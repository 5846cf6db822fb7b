"""Conformer encoder + model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.nn.conformer import (
    GAU,
    ConformerEncoder,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    RoPESelfAttention,
    T5RelPositionBias,
    TransformerEncoder,
    make_pad_mask,
    subsequent_chunk_mask,
)
from asv_subtools_tpu.models import ConformerXvector, MODELS

KEY = jax.random.PRNGKey(0)
RNGS = {"params": KEY, "dropout": jax.random.PRNGKey(1)}


class TestAttention:
    @pytest.mark.parametrize(
        "cls,kw",
        [
            (MultiHeadedAttention, {}),
            (RelPositionMultiHeadedAttention, {}),
            (RoPESelfAttention, {}),
            (GAU, {"expansion_units": 64, "key_dim": 32}),
        ],
    )
    def test_shapes_and_mask(self, cls, kw):
        x = jax.random.normal(KEY, (2, 12, 32))
        mask = jnp.arange(12)[None, :] < jnp.array([12, 7])[:, None]
        att_mask = mask[:, None, None, :] & mask[:, None, :, None]
        mod = cls(**kw)
        v = mod.init(RNGS, x, mask=att_mask)
        y = mod.apply(v, x, mask=att_mask)
        assert y.shape == x.shape
        # padded-region inputs must not change valid outputs
        x2 = jnp.where(mask[..., None], x, 500.0)
        y2 = mod.apply(v, x2, mask=att_mask)
        np.testing.assert_allclose(
            np.asarray(y * mask[..., None]),
            np.asarray(y2 * mask[..., None]),
            atol=2e-4,
        )

    def test_rel_shift_alignment(self):
        """_rel_shift must map position-diff indices correctly: the score
        for (q=i, k=j) must come from rel index (i-j)."""
        b, h, t = 1, 1, 5
        # bd[q, p] = p  (identify the rel-emb index picked)
        bd = jnp.broadcast_to(
            jnp.arange(2 * t - 1, dtype=jnp.float32)[None, None, None, :],
            (b, h, t, 2 * t - 1),
        )
        out = RelPositionMultiHeadedAttention._rel_shift(bd)
        # rel emb ordered [t-1 ... -(t-1)]; index of diff d = (t-1) - d... for
        # (q,k): d = q - k -> index = t-1 - (q-k)
        for q in range(t):
            for k in range(t):
                assert out[0, 0, q, k] == (t - 1) - (q - k)

    def test_t5_bias(self):
        mod = T5RelPositionBias(num_buckets=8, max_distance=16)
        v = mod.init({"params": KEY}, 10)
        bias = mod.apply(v, 10)
        assert bias.shape == (1, 1, 10, 10)


class TestMasks:
    def test_pad_mask(self):
        m = make_pad_mask(jnp.array([3, 5]), 5)
        np.testing.assert_array_equal(
            np.asarray(m), [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]]
        )

    def test_chunk_mask(self):
        m = np.asarray(subsequent_chunk_mask(6, 2, num_left_chunks=1))
        assert m[0, 0] and m[1, 0]
        assert not m[0, 2]  # future chunk
        assert m[4, 2] and not m[4, 0]  # beyond left chunk limit


class TestEncoders:
    @pytest.mark.parametrize("input_layer,factor", [("linear", 1), ("conv2d2", 2), ("conv2d", 4), ("conv2d8", 8)])
    def test_subsampling_rates(self, input_layer, factor):
        x = jax.random.normal(KEY, (2, 64, 40))
        enc = ConformerEncoder(
            attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
            input_layer=input_layer,
        )
        mask = jnp.ones((2, 64), bool)
        v = enc.init(RNGS, x, mask=mask, train=False)
        y, m = enc.apply(v, x, mask=mask, train=False)
        assert y.shape[0] == 2 and y.shape[2] == 32
        assert abs(y.shape[1] - 64 // factor) <= 3
        if m is not None:
            assert m.shape == y.shape[:2]

    @pytest.mark.parametrize("pos", ["abs_pos", "rel_pos", "rot_pos", "no_pos"])
    def test_positional_variants(self, pos):
        x = jax.random.normal(KEY, (2, 32, 24))
        enc = ConformerEncoder(
            attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
            input_layer="linear", pos_enc_type=pos,
        )
        v = enc.init(RNGS, x, train=False)
        y, _ = enc.apply(v, x, train=False)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_gau_encoder(self):
        x = jax.random.normal(KEY, (2, 32, 24))
        enc = ConformerEncoder(
            attention_dim=32, num_blocks=2, input_layer="linear",
            att_type="gau", gau_units=48, gau_key=16, pos_enc_type="rot_pos",
            linear_units=64,
        )
        v = enc.init(RNGS, x, train=False)
        y, _ = enc.apply(v, x, train=False)
        assert y.shape == (2, 32, 32)

    def test_mfa_combiner(self):
        # reference aux taps (encoder.py:322-341): start at
        # num_blocks // aux_layer_start, step aux_layer_period, plus the
        # final layer. num_blocks=4, start=2, period=3 -> [2, 3] -> 2 taps.
        x = jax.random.normal(KEY, (2, 32, 24))
        enc = ConformerEncoder(
            attention_dim=32, num_blocks=4, input_layer="linear",
            combiner_type="mfa", linear_units=64, attention_heads=2,
            aux_layer_start=2,
        )
        v = enc.init(RNGS, x, train=False)
        y, _ = enc.apply(v, x, train=False)
        assert y.shape[-1] == 64
        # after_norm IS applied to the mfa concat (encoder.py:206, :414-417)
        assert "after_norm" in v["params"]
        assert v["params"]["after_norm"]["scale"].shape == (64,)
        # default aux_layer_start=1 -> empty range -> final layer only
        enc1 = ConformerEncoder(
            attention_dim=32, num_blocks=4, input_layer="linear",
            combiner_type="mfa", linear_units=64, attention_heads=2,
        )
        v1 = enc1.init(RNGS, x, train=False)
        y1, _ = enc1.apply(v1, x, train=False)
        assert y1.shape[-1] == 32

    def test_batch_norm_norm_type(self):
        # norm_type="batch_norm" (Trans_Bat, layer_norm.py:8-31): block
        # norms and after_norm are feature-axis BatchNorms with running
        # statistics.
        x = jax.random.normal(KEY, (2, 32, 24))
        enc = ConformerEncoder(
            attention_dim=32, num_blocks=2, input_layer="linear",
            linear_units=64, attention_heads=2, norm_type="batch_norm",
        )
        v = enc.init(RNGS, x, train=False)
        assert "mean" in v["batch_stats"]["block_0"]["norm_mha"]
        assert "mean" in v["batch_stats"]["after_norm"]
        y, _ = enc.apply(v, x, train=False)
        assert np.all(np.isfinite(np.asarray(y)))
        (y_tr, _), mut = enc.apply(
            v, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        # running stats must move in train mode
        assert not np.allclose(
            np.asarray(mut["batch_stats"]["block_0"]["norm_mha"]["mean"]), 0.0
        )

    def test_random_combiner_eval_is_last_layer(self):
        # forward_rand_layer/_frame return inputs[-1] in eval
        # (encoder.py:899-903) — identical to combiner_type="norm".
        x = jax.random.normal(KEY, (2, 32, 24))
        kw = dict(
            attention_dim=32, num_blocks=4, input_layer="linear",
            linear_units=64, attention_heads=2, aux_layer_start=2,
        )
        vr = ConformerEncoder(combiner_type="random_layer", **kw).init(
            RNGS, x, train=False
        )
        yr, _ = ConformerEncoder(combiner_type="random_layer", **kw).apply(
            vr, x, train=False
        )
        yn, _ = ConformerEncoder(combiner_type="norm", **kw).apply(
            vr, x, train=False
        )
        np.testing.assert_allclose(np.asarray(yr), np.asarray(yn), atol=1e-6)
        # train mode: random weights -> generally different, still finite
        for ct in ("random_layer", "random_frame"):
            yt, _ = ConformerEncoder(combiner_type=ct, **kw).apply(
                vr, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)},
            )
            assert np.all(np.isfinite(np.asarray(yt)))

    def test_dynamic_chunk_training(self):
        from asv_subtools_tpu.nn.conformer.mask import (
            add_optional_chunk_mask,
            dynamic_chunk_mask,
        )

        # sampled mask is chunk-causal: no future beyond the chunk edge
        m = np.asarray(dynamic_chunk_mask(jax.random.PRNGKey(0), 16))
        assert m.shape == (16, 16)
        assert np.all(np.diag(m))  # every frame attends to itself
        # row i's attendable set is a contiguous prefix ending at i's
        # chunk boundary: True entries form a prefix, none after it
        for i in range(16):
            row = m[i]
            last_true = np.max(np.nonzero(row)[0])
            first_true = np.min(np.nonzero(row)[0])
            assert row[first_true : last_true + 1].all()
            assert last_true >= i  # chunk edge at/after the diagonal
        # decoding_chunk_size < 0 under dynamic chunk -> full context
        full = add_optional_chunk_mask(
            jnp.ones((1, 8), bool), 8, use_dynamic_chunk=True,
            rng=jax.random.PRNGKey(0), decoding_chunk_size=-1,
        )
        assert np.asarray(full).all()
        # encoder trains with a per-batch random chunk policy
        x = jax.random.normal(KEY, (2, 32, 24))
        enc = ConformerEncoder(
            attention_dim=32, num_blocks=2, input_layer="linear",
            linear_units=64, attention_heads=2, use_dynamic_chunk=True,
            use_dynamic_left_chunk=True,
        )
        v = enc.init(RNGS, x, train=False)
        y, _ = enc.apply(
            v, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)},
        )
        assert np.all(np.isfinite(np.asarray(y)))
        # eval without a decode chunk falls back to full context == norm path
        y_eval, _ = enc.apply(v, x, train=False)
        base = ConformerEncoder(
            attention_dim=32, num_blocks=2, input_layer="linear",
            linear_units=64, attention_heads=2,
        )
        y_base, _ = base.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_base), atol=1e-6)

    def test_transformer_encoder(self):
        x = jax.random.normal(KEY, (2, 32, 24))
        enc = TransformerEncoder(
            attention_dim=32, num_blocks=2, input_layer="linear", linear_units=64,
            attention_heads=2,
        )
        v = enc.init(RNGS, x, train=False)
        y, _ = enc.apply(v, x, train=False)
        assert y.shape == (2, 32, 32)


class TestConformerXvector:
    def test_forward_and_embed(self):
        x = jax.random.normal(KEY, (2, 64, 40))
        model = ConformerXvector(
            embd_dim=32, attention_dim=32, attention_heads=2, linear_units=64,
            num_blocks=2, out_dim=64,
        )
        mask = jnp.arange(64)[None, :] < jnp.array([64, 40])[:, None]
        v = model.init(RNGS, x, mask=mask, train=False)
        emb = model.apply(v, x, mask=mask, train=False)
        assert emb.shape == (2, 32)
        emb2 = model.apply(v, x, mask=mask, train=False, position="near_affine")
        assert emb2.shape == (2, 32)
        # train mode with dropout rng
        emb3, _ = model.apply(
            v, x, mask=mask, train=True, rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        assert np.all(np.isfinite(np.asarray(emb3)))

    def test_in_registry(self):
        assert "conformer_xvector" in MODELS


class TestReConformer:
    def test_re_scale_variant(self):
        enc = ConformerEncoder(
            attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
            input_layer="linear", re_scale=True,
        )
        x = jax.random.normal(KEY, (2, 32, 24))
        v = enc.init(RNGS, x, train=False)
        # learned residual scales exist and start at 1
        assert "scale_mha" in v["params"]["block_0"]
        y, _ = enc.apply(v, x, train=False)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_streaming_chunk_mask(self):
        enc = ConformerEncoder(
            attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
            input_layer="linear", static_chunk_size=8,
        )
        x = jax.random.normal(KEY, (1, 32, 24))
        v = enc.init(RNGS, x, train=False)
        y_full, _ = enc.apply(v, x, train=False)
        # causality: changing FUTURE chunks must not affect earlier chunks
        x2 = x.at[:, 16:, :].set(0.0)
        y_cut, _ = enc.apply(v, x2, train=False)
        np.testing.assert_allclose(
            np.asarray(y_full[:, :8]), np.asarray(y_cut[:, :8]), atol=1e-5
        )


class TestT5BiasWired:
    def test_t5_bias_changes_output(self):
        """add_t5rel_bias must actually inject the bias into attention."""
        x = jax.random.normal(KEY, (1, 16, 24))
        enc_with = ConformerEncoder(
            attention_dim=32, attention_heads=2, linear_units=64, num_blocks=1,
            input_layer="linear", pos_enc_type="abs_pos", add_t5rel_bias=True,
        )
        v = enc_with.init(RNGS, x, train=False)
        y1, _ = enc_with.apply(v, x, train=False)
        # zero the learned bias -> output must change vs a random bias
        import flax

        p2 = flax.core.unfreeze(v["params"]) if hasattr(flax.core, "unfreeze") else dict(v["params"])
        p2 = jax.tree_util.tree_map(lambda a: a, v["params"])
        blk = dict(p2["block_0"])
        blk["t5_bias"] = {"rel_bias": jnp.full_like(blk["t5_bias"]["rel_bias"], 3.0)}
        p2 = {**p2, "block_0": blk}
        y2, _ = enc_with.apply({"params": p2}, x, train=False)
        assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


class TestReConformer:
    """ReConformer variant: BasicNorm + ActivationBalancer + DoubleSwish
    (reference scaling.py / layer_norm.py BasicNorm / encoder re_scale)."""

    def test_balancer_identity_forward_modified_backward(self):
        from asv_subtools_tpu.nn.conformer.scaling import activation_balancer

        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 16)),
                        jnp.float32)
        # forward is the identity
        np.testing.assert_array_equal(np.asarray(activation_balancer(x)), np.asarray(x))

        # backward differs from identity when constraints are violated:
        # make one channel always-negative (proportion_positive = 0)
        xneg = x.at[..., 0].set(-jnp.abs(x[..., 0]) - 1.0)
        g_plain = jax.grad(lambda v: jnp.sum(jnp.tanh(v)))(xneg)
        g_bal = jax.grad(lambda v: jnp.sum(jnp.tanh(activation_balancer(v))))(xneg)
        assert not np.allclose(np.asarray(g_plain), np.asarray(g_bal))
        # untouched channels with healthy stats keep gradients closer
        diff = np.abs(np.asarray(g_plain) - np.asarray(g_bal))
        assert diff[..., 0].mean() > 0  # violated channel was adjusted

    def test_basic_norm(self):
        from asv_subtools_tpu.nn.conformer.scaling import BasicNorm

        m = BasicNorm()
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 8)) * 3,
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        # matches the closed form with eps=0.25
        scales = (np.mean(np.asarray(x) ** 2, axis=-1, keepdims=True) + 0.25) ** -0.5
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) * scales, rtol=1e-5)
        assert "eps" in v["params"]

    def test_reconformer_encoder_trains(self):
        from asv_subtools_tpu.nn.conformer import ConformerEncoder

        enc = ConformerEncoder(
            attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
            norm_type="basic_norm", use_balancer=True, re_scale=True,
            activation_type="double_swish", cnn_norm_type="basic_norm",
        )
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 40, 23)),
                        jnp.float32)
        mask = jnp.ones((2, 40), bool)
        variables = enc.init(jax.random.PRNGKey(0), x, mask=mask, train=False)
        out, _ = enc.apply(variables, x, mask=mask, train=False)
        assert np.isfinite(np.asarray(out)).all()
        # BasicNorm eps params + re_scale scales exist
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        names = ["/".join(str(k.key) for k in path) for path, _ in flat]
        assert any("after_norm/eps" in n for n in names)
        assert any("scale_mha" in n for n in names)

        # gradient flows through the balancer path
        def loss(v):
            o, _ = enc.apply(
                v, x, mask=mask, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(o * o)

        g = jax.grad(loss)(variables)
        gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0

"""Unit tests for the NN component library (tdnn / pooling / loss / dropout).

The reference has no unit tests (SURVEY.md §4); these check shape contracts,
masking exactness, and core numerics against small numpy references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu import nn as annex


KEY = jax.random.PRNGKey(0)


def init_and_run(module, *args, rngs=None, **kwargs):
    rngs = rngs or {"params": KEY, "dropout": jax.random.PRNGKey(7)}
    variables = module.init(rngs, *args, **kwargs)
    out = module.apply(
        variables, *args, rngs={"dropout": jax.random.PRNGKey(3)}, **kwargs
    )
    return out, variables


class TestTdnnAffine:
    def test_pointwise_shape(self):
        x = jnp.ones((2, 10, 8))
        y, _ = init_and_run(annex.TdnnAffine(16), x)
        assert y.shape == (2, 10, 16)

    def test_symmetric_context_keeps_time(self):
        x = jnp.ones((2, 10, 8))
        y, _ = init_and_run(annex.TdnnAffine(16, context=(-2, 0, 2)), x)
        assert y.shape == (2, 10, 16)

    def test_irregular_context(self):
        x = jnp.ones((2, 12, 8))
        y, _ = init_and_run(annex.TdnnAffine(16, context=(-3, 0, 1)), x)
        assert y.shape == (2, 12, 16)

    def test_no_pad_shrinks(self):
        x = jnp.ones((2, 10, 8))
        y, _ = init_and_run(annex.TdnnAffine(16, context=(-2, -1, 0, 1, 2), pad=False), x)
        assert y.shape == (2, 6, 16)

    def test_dilated_equals_irregular(self):
        """[-2,0,2] as dilated conv must match explicit slice+matmul path."""
        x = jax.random.normal(KEY, (2, 9, 4))
        m_even = annex.TdnnAffine(6, context=(-2, 0, 2))
        v = m_even.init({"params": KEY}, x)
        y_even = m_even.apply(v, x)
        # manual: y[t] = sum_i W_i x[t+ctx_i] with zero pad
        kernel = v["params"]["conv"]["kernel"]  # [3, 4, 6]
        bias = v["params"]["conv"]["bias"]
        xp = np.pad(np.asarray(x), [(0, 0), (2, 2), (0, 0)])
        ref = np.zeros((2, 9, 6), np.float32)
        for t in range(9):
            for ki, c in enumerate((-2, 0, 2)):
                ref[:, t] += np.asarray(x if False else xp)[:, t + 2 + c] @ np.asarray(kernel)[ki]
        ref += np.asarray(bias)
        np.testing.assert_allclose(np.asarray(y_even), ref, rtol=2e-5, atol=2e-5)


class TestSemiOrth:
    def test_update_reduces_objective(self):
        k = jax.random.normal(KEY, (2, 32, 16)) * 0.5
        before = annex.semi_orth_objective(k)
        k2 = k
        for _ in range(12):
            k2 = annex.semi_orth_update(k2)
        after = annex.semi_orth_objective(k2)
        assert float(after) < float(before) * 0.5


class TestPooling:
    def _x_mask(self, b=3, t=20, d=16):
        x = jax.random.normal(KEY, (b, t, d))
        lengths = jnp.array([20, 13, 7])
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        return x, mask

    def test_stats_pooling_matches_numpy(self):
        x, mask = self._x_mask()
        pool = annex.StatisticsPooling()
        out, _ = init_and_run(pool, x, mask=mask)
        xn = np.asarray(x)
        for i, L in enumerate([20, 13, 7]):
            seg = xn[i, :L]
            np.testing.assert_allclose(out[i, :16], seg.mean(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                out[i, 16:], seg.std(0), rtol=1e-4, atol=1e-4
            )

    def test_mask_invariance(self):
        """Padded frames must not affect any masked pooling output."""
        x, mask = self._x_mask()
        x_garbage = jnp.where(mask[..., None], x, 1000.0)
        for name in ["statistics", "attentive", "multi-head", "mqmha"]:
            cls = annex.POOLINGS[name]
            pool = cls()
            v = pool.init({"params": KEY}, x, mask=mask)
            a = pool.apply(v, x, mask=mask)
            b = pool.apply(v, x_garbage, mask=mask)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ), name

    @pytest.mark.parametrize(
        "name,kwargs,expect_mult",
        [
            ("statistics", {}, 2),
            ("attentive", {}, 2),
            ("multi-head", {"num_head": 4}, 2),
            ("global-multi", {"num_head": 2}, 4),
            ("multi-resolution", {"num_head": 2}, 4),
            ("mqmha", {"num_q": 2, "num_head": 4}, 4),
            ("mqmha-linear", {"num_q": 2, "num_head": 4}, 4),
            ("lde", {"c_num": 8}, 8),
            ("xi", {"stddev": False}, 1),
        ],
    )
    def test_output_dims(self, name, kwargs, expect_mult):
        x, mask = self._x_mask()
        pool = annex.POOLINGS[name](**kwargs)
        out, _ = init_and_run(pool, x, mask=mask)
        assert out.shape == (3, 16 * expect_mult)
        assert annex.pooling_output_dim(name, 16, **kwargs) == 16 * expect_mult
        assert np.all(np.isfinite(np.asarray(out)))


class TestLosses:
    def _embed(self, b=8, d=32):
        e = jax.random.normal(KEY, (b, d))
        y = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
        return e, y

    def test_softmax_loss(self):
        e, y = self._embed()
        loss_mod = annex.SoftmaxLoss(num_targets=4)
        (loss, logits), _ = init_and_run(loss_mod, e, y)
        assert loss.shape == ()
        assert logits.shape == (8, 4)
        assert float(loss) > 0

    @pytest.mark.parametrize("method", ["am", "aam", "sm1", "sm2", "sm3"])
    def test_margin_softmax_methods(self, method):
        e, y = self._embed()
        mod = annex.MarginSoftmaxLoss(num_targets=4, method=method)
        (loss, logits), v = init_and_run(mod, e, y, train=True)
        assert np.isfinite(float(loss))
        # margin penalty increases the loss vs eval-mode
        loss_eval, _ = mod.apply(v, e, y, train=False)
        assert float(loss) >= float(loss_eval) - 1e-5

    def test_margin_zero_equals_softmax_form(self):
        e, y = self._embed()
        mod = annex.MarginSoftmaxLoss(num_targets=4, m=0.0, method="am")
        (loss_tr, _), v = init_and_run(mod, e, y, train=True)
        loss_ev, _ = mod.apply(v, e, y, train=False)
        np.testing.assert_allclose(float(loss_tr), float(loss_ev), rtol=1e-5)

    def test_lambda_interpolation(self):
        """lambda_m=0 disables the margin entirely."""
        e, y = self._embed()
        mod = annex.MarginSoftmaxLoss(num_targets=4, m=0.3, method="am")
        _, v = init_and_run(mod, e, y, train=True)
        loss_nomargin, _ = mod.apply(v, e, y, train=True, lambda_m=0.0)
        loss_ev, _ = mod.apply(v, e, y, train=False)
        np.testing.assert_allclose(float(loss_nomargin), float(loss_ev), rtol=1e-5)

    @pytest.mark.parametrize("adapt", [None, "topk", "batch_mean"])
    def test_v1_subcenter_topk(self, adapt):
        e, y = self._embed()
        mod = annex.MarginSoftmaxLossV1(
            num_targets=4, sub_k=3, method="aam", adapt_method=adapt, topk=2
        )
        (loss, logits), _ = init_and_run(mod, e, y, train=True)
        assert np.isfinite(float(loss))
        assert logits.shape == (8, 4)

    def test_margin_warm(self):
        mw = annex.MarginWarm(start_epoch=2, end_epoch=4, offset_margin=-0.2,
                              init_lambda=0.0, epoch_iter=100)
        off0, lam0 = mw.step(0)
        assert off0 == -0.2 and lam0 == 0.0
        off_mid, lam_mid = mw.step(200)
        assert -0.2 < off_mid < 0.0 and 0.0 < lam_mid < 1.0
        off_end, lam_end = mw.step(400)
        assert off_end == 0.0 and lam_end == 1.0

    def test_ocsoftmax(self):
        e, _ = self._embed()
        y = jnp.array([1, 0, 1, 0, 1, 0, 1, 0])
        (loss, scores), _ = init_and_run(annex.OCSoftmax(), e, y)
        assert np.isfinite(float(loss))


class TestResNet:
    def test_resnet34_shapes(self):
        x = jax.random.normal(KEY, (2, 64, 40))
        model = annex.resnet34(base_planes=8)
        v = model.init({"params": KEY}, x, train=False)
        y = model.apply(v, x, train=False)
        assert y.shape[0] == 2 and y.shape[1] == 8  # T/8
        assert y.shape[2] == int(np.ceil(40 / 8)) * 8 * 8

    def test_se_block(self):
        x = jax.random.normal(KEY, (2, 10, 16))
        out, _ = init_and_run(annex.SEBlock(ratio=4), x)
        assert out.shape == x.shape


class TestBatchNormMasked:
    def test_masked_stats_ignore_padding(self):
        x = jax.random.normal(KEY, (4, 10, 8))
        mask = jnp.arange(10)[None, :] < jnp.array([10, 8, 5, 3])[:, None]
        bn = annex.BatchNorm()
        v = bn.init({"params": KEY}, x, train=True, mask=mask)
        x_garbage = jnp.where(mask[..., None], x, 99.0)
        y1, m1 = bn.apply(v, x, train=True, mask=mask, mutable=["batch_stats"])
        y2, m2 = bn.apply(v, x_garbage, train=True, mask=mask, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(y1 * mask[..., None]), np.asarray(y2 * mask[..., None]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(m1["batch_stats"]["mean"]),
            np.asarray(m2["batch_stats"]["mean"]),
            rtol=1e-5, atol=1e-5,
        )


class TestDropout:
    def test_specaug_masks_bands(self):
        x = jnp.ones((2, 50, 40))
        mod = annex.SpecAugmentDropout(frequency=0.2, frame=0.2)
        out, _ = init_and_run(mod, x, train=True)
        arr = np.asarray(out)
        assert ((arr == 0).any(axis=(0, 1))).any() or ((arr == 0).any(axis=(0, 2))).any()
        out_eval, _ = init_and_run(mod, x, train=False)
        np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))

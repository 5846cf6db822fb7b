"""Margin-loss-zoo value AND gradient parity vs the reference torch class.

Model-level train parity certifies aam; this file certifies every other
MarginSoftmaxLoss configuration head-to-head — am/aam/sm1/sm2/sm3,
double-margin, ring loss (feature_normalize off), MHE, inter loss,
curricular, temperature, lambda interpolation — comparing the loss value
and d(loss)/d(embeddings) in f64, plus FocalLoss and the eval
(non-train) path.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from asv_subtools_tpu.nn.loss import FocalLoss, MarginSoftmaxLoss

B, D, C = 6, 16, 10


def _ref_loss():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    try:
        import libs.nnet.loss as mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference loss: {e}")
    return mod


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, D)) * 2.0
    w = rng.normal(size=(C, D)) * 0.5
    y = rng.integers(0, C, size=B)
    return x, w, y


def _torch_loss_and_grad(ref, x, y, train=True, lambda_m=None):
    ref.train(train)
    if lambda_m is not None:
        ref.step(lambda_m)
    xt = torch.from_numpy(x[:, :, None].copy()).requires_grad_(True)
    loss = ref(xt, torch.from_numpy(y))
    loss.backward()
    return float(loss.detach()), xt.grad.numpy()[:, :, 0]


def _ours_loss_and_grad(mod, w, x, y, train=True, lambda_m=1.0,
                        extra_params=None, batch_stats=None):
    with jax.enable_x64():
        params = {"weight": jnp.asarray(w, jnp.float64)}
        if extra_params:
            params.update(
                {k: jnp.asarray(v, jnp.float64)
                 for k, v in extra_params.items()}
            )
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64), batch_stats
            )

        def f(xe):
            out = mod.apply(
                variables, xe, jnp.asarray(y, jnp.int32), train=train,
                lambda_m=jnp.asarray(lambda_m, jnp.float64),
                mutable=["batch_stats"] if batch_stats is not None else False,
            )
            (loss, _logits) = out[0] if batch_stats is not None else out
            return loss

        xe = jnp.asarray(x, jnp.float64)
        loss, grad = jax.value_and_grad(f)(xe)
        return float(loss), np.asarray(grad)


CONFIGS = [
    ("am", dict(method="am"), {}),
    ("aam", dict(method="aam"), {}),
    ("sm1", dict(method="sm1"), {}),
    ("sm2", dict(method="sm2"), {}),
    ("sm3", dict(method="sm3"), {}),
    ("am-double", dict(method="am", double=True), {}),
    ("aam-double", dict(method="aam", double=True), {}),
    ("am-temp", dict(method="am", t=1.2), {}),
    ("am-mhe", dict(method="am", mhe_loss=True, mhe_w=0.05), {}),
    ("am-inter", dict(method="am", inter_loss=0.1), {}),
    ("am-ring", dict(method="am", ring_loss=0.1,
                     feature_normalize=False), {"ring_r": 20.0}),
]


@pytest.mark.parametrize("name,kw,extra", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_margin_variants(name, kw, extra):
    m = _ref_loss()
    x, w, y = _data()
    torch.manual_seed(0)
    ref = m.MarginSoftmaxLoss(D, C, m=0.2, s=30.0, **kw).to(torch.float64)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w[:, :, None]))
    ref_loss, ref_grad = _torch_loss_and_grad(ref, x, y)

    ours = MarginSoftmaxLoss(num_targets=C, m=0.2, s=30.0, **kw)
    our_loss, our_grad = _ours_loss_and_grad(ours, w, x, y,
                                             extra_params=extra)
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-9)
    np.testing.assert_allclose(our_grad, ref_grad, rtol=1e-7, atol=1e-10)


def test_lambda_interpolation():
    m = _ref_loss()
    x, w, y = _data()
    torch.manual_seed(0)
    ref = m.MarginSoftmaxLoss(D, C, m=0.2, method="aam").to(torch.float64)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w[:, :, None]))
    ref_loss, ref_grad = _torch_loss_and_grad(ref, x, y, lambda_m=0.3)
    ours = MarginSoftmaxLoss(num_targets=C, m=0.2, method="aam")
    our_loss, our_grad = _ours_loss_and_grad(ours, w, x, y, lambda_m=0.3)
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-9)
    np.testing.assert_allclose(our_grad, ref_grad, rtol=1e-7, atol=1e-10)


def test_curricular():
    """Curricular t-EMA: reference updates t from mean(cos_t) BEFORE the
    hard-example rescale (momentum 0.01 on the OLD t)."""
    m = _ref_loss()
    x, w, y = _data()
    torch.manual_seed(0)
    ref = m.MarginSoftmaxLoss(D, C, m=0.2, method="am",
                              curricular=True).to(torch.float64)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w[:, :, None]))
    ref_loss, ref_grad = _torch_loss_and_grad(ref, x, y)
    ref_t = float(ref.curricular.t)

    ours = MarginSoftmaxLoss(num_targets=C, m=0.2, method="am",
                             curricular=True)
    bs = {"curricular_t": np.zeros(())}
    our_loss, our_grad = _ours_loss_and_grad(ours, w, x, y, batch_stats=bs)
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-9)
    np.testing.assert_allclose(our_grad, ref_grad, rtol=1e-7, atol=1e-10)

    # and the updated t buffer matches
    with jax.enable_x64():
        _, mut = ours.apply(
            {"params": {"weight": jnp.asarray(w, jnp.float64)},
             "batch_stats": {"curricular_t": jnp.zeros((), jnp.float64)}},
            jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.int32),
            train=True, mutable=["batch_stats"],
        )
    np.testing.assert_allclose(
        float(mut["batch_stats"]["curricular_t"]), ref_t, rtol=1e-9
    )


def test_eval_path():
    """Non-train path: plain scaled-cosine CE (reference :313-316)."""
    m = _ref_loss()
    x, w, y = _data()
    torch.manual_seed(0)
    ref = m.MarginSoftmaxLoss(D, C, m=0.2, method="am").to(torch.float64)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w[:, :, None]))
    ref_loss, _ = _torch_loss_and_grad(ref, x, y, train=False)
    ours = MarginSoftmaxLoss(num_targets=C, m=0.2, method="am")
    our_loss, _ = _ours_loss_and_grad(ours, w, x, y, train=False)
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-9)


def test_focal():
    m = _ref_loss()
    x, w, y = _data()
    torch.manual_seed(0)
    ref = m.FocalLoss(D, C, gamma=2.0).to(torch.float64)
    with torch.no_grad():
        ref.softmax_affine.affine.weight.copy_(torch.from_numpy(w[:, :, None]))
        ref.softmax_affine.affine.bias.zero_()
    ref.train()
    xt = torch.from_numpy(x[:, :, None].copy()).requires_grad_(True)
    loss = ref(xt, torch.from_numpy(y))
    loss.backward()
    ref_loss, ref_grad = float(loss.detach()), xt.grad.numpy()[:, :, 0]

    ours = FocalLoss(num_targets=C, gamma=2.0)
    with jax.enable_x64():
        variables = {"params": {"affine": {
            "kernel": jnp.asarray(w.T, jnp.float64),
            "bias": jnp.zeros((C,), jnp.float64),
        }}}

        def f(xe):
            loss, _ = ours.apply(variables, xe, jnp.asarray(y, jnp.int32),
                                 train=True)
            return loss

        our_loss, our_grad = jax.value_and_grad(f)(
            jnp.asarray(x, jnp.float64)
        )
    np.testing.assert_allclose(float(our_loss), ref_loss, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(our_grad), ref_grad, rtol=1e-7,
                               atol=1e-10)

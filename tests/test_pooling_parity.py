"""Pooling-zoo output parity vs the live reference torch classes.

Model-level parity (test_convert_parity / test_train_parity) certifies
statistics + ECAPA-attentive pooling; this file certifies the REST of the
zoo head-to-head — LDE, Xi-vector, attentive, multi-head (+fixed
temperature), global multi-head, multi-resolution, MQMHASP (+time
attention) and MQMHASP-Linear — by instantiating the reference class
(torch f64, eval), mapping its weights onto our module, and comparing
pooled outputs on the same input at 1e-10.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from asv_subtools_tpu.convert import _bn, _conv_kernel, _tdnn_layer
from asv_subtools_tpu.nn import pooling as P

B, T, D = 3, 25, 24


def _ref_pooling():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    try:
        import libs.nnet.pooling as mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference pooling: {e}")
    if not hasattr(mod, "compute_statistics"):
        # The reference MQMHASP cannot run as shipped: pooling.py never
        # imports compute_statistics (NameError at forward). Reconstruct
        # it from transformer_xvector.py:12-25, with keepdim=True as
        # MQMHASP's own call sites require (mean.repeat/.reshape(B,-1,1)).
        def compute_statistics(x, m, dim=-1, stddev=True, eps=1e-5):
            mean = (m * x).sum(dim, keepdim=True)
            if stddev:
                std = torch.sqrt(
                    (torch.sum(m * x**2, dim=dim, keepdim=True)
                     - mean**2).clamp(eps)
                )
            else:
                std = torch.empty(0)
            return mean, std

        mod.compute_statistics = compute_statistics
    return mod


def _x(seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, T, D))


def _sd(ref):
    return {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}


def _affine(sd, prefix):
    p = {"conv": {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}}
    if f"{prefix}.bias" in sd:
        p["conv"]["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float64)
    return p


def _attention_tree(sd, prefix="attention"):
    tree = {}
    if f"{prefix}.first_affine.weight" in sd:
        tree["first_affine"] = _affine(sd, f"{prefix}.first_affine")
    tree["last_affine"] = _affine(sd, f"{prefix}.last_affine")
    if f"{prefix}.t" in sd and sd[f"{prefix}.t"].ndim == 4:
        # learnable temperature case only (fixed t is a buffer)
        pass
    return tree


def _run(ours_mod, variables, x, **kwargs):
    with jax.enable_x64():
        v = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), variables
        )
        out = ours_mod.apply(v, jnp.asarray(x, jnp.float64), **kwargs)
        return np.asarray(out)


def _ref_out(ref, x):
    with torch.no_grad():
        o = ref(torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()))
    o = o.squeeze(-1).numpy()
    return o


def _check(ours, ref_o, tol=1e-10):
    np.testing.assert_allclose(ours, ref_o, rtol=tol, atol=tol)


def test_statistics():
    m = _ref_pooling()
    x = _x()
    ref = m.StatisticsPooling(D, stddev=True).double().eval()
    ours = P.StatisticsPooling()
    out = _run(ours, {}, x)
    _check(out, _ref_out(ref, x), tol=1e-9)


def test_lde():
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.LDEPooling(D, c_num=8).double().eval()
    sd = _sd(ref)
    ours = P.LDEPooling(c_num=8)
    out = _run(ours, {"params": {"mu": sd["mu"], "s": sd["s"]}}, x)
    _check(out, _ref_out(ref, x))


@pytest.mark.parametrize("stddev", [False, True])
def test_xi_vector(stddev):
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.xivec_stdinit_softplus2_prec_pooling(
        D, hidden_size=16, stddev=stddev
    ).double().eval()
    sd = _sd(ref)
    lin1_p, lin1_s = _tdnn_layer(sd, "lin1_relu_bn")
    params = {
        "prior_mean": sd["prior_mean"][0],
        "prior_logprec": sd["prior_logprec"][0],
        "lin1_relu_bn": lin1_p,
        "lin2": _affine(sd, "lin2"),
    }
    ours = P.XiVectorPooling(hidden_size=16, stddev=stddev)
    out = _run(ours, {"params": params, "batch_stats": {"lin1_relu_bn": lin1_s}},
               x, train=False)
    _check(out, _ref_out(ref, x), tol=1e-8)


@pytest.mark.parametrize("stddev_attention", [True, False])
def test_attentive(stddev_attention):
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.AttentiveStatisticsPooling(
        D, hidden_size=16, stddev_attention=stddev_attention
    ).double().eval()
    sd = _sd(ref)
    ours = P.AttentiveStatisticsPooling(
        hidden_size=16, stddev_attention=stddev_attention
    )
    out = _run(ours, {"params": {"attention": _attention_tree(sd)}}, x)
    _check(out, _ref_out(ref, x))


@pytest.mark.parametrize("temperature", [False, True])
def test_multi_head(temperature):
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.MultiHeadAttentionPooling(
        D, num_head=4, temperature=temperature, fixed=True
    ).double().eval()
    sd = _sd(ref)
    ours = P.MultiHeadAttentionPooling(
        num_head=4, temperature=temperature, fixed=True
    )
    out = _run(ours, {"params": {"attention": _attention_tree(sd)}}, x)
    _check(out, _ref_out(ref, x))


def test_global_multi_head():
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.GlobalMultiHeadAttentionPooling(
        D, num_head=2, hidden_size=16
    ).double().eval()
    sd = _sd(ref)
    ours = P.GlobalMultiHeadAttentionPooling(num_head=2, hidden_size=16)
    out = _run(ours, {"params": {"attention": _attention_tree(sd)}}, x)
    _check(out, _ref_out(ref, x))


def test_multi_resolution():
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.MultiResolutionMultiHeadAttentionPooling(
        D, num_head=4, hidden_size=16
    ).double().eval()
    sd = _sd(ref)
    ours = P.MultiResolutionMultiHeadAttentionPooling(
        num_head=4, hidden_size=16
    )
    out = _run(ours, {"params": {"attention": _attention_tree(sd)}}, x)
    _check(out, _ref_out(ref, x))


@pytest.mark.parametrize("time_attention", [False, True])
def test_mqmhasp(time_attention):
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.MQMHASP(
        D, num_q=2, num_head=4, hidden_size=8,
        time_attention=time_attention,
    ).double().eval()
    sd = _sd(ref)
    att_bn_p, att_bn_s = _bn(sd, "attention.2")
    params = {
        "att1": _affine(sd, "attention.0"),
        "att_norm": att_bn_p,
        "att2": _affine(sd, "attention.4"),
    }
    ours = P.MQMHASP(num_q=2, num_head=4, hidden_size=8,
                     time_attention=time_attention)
    out = _run(ours, {"params": params,
                      "batch_stats": {"att_norm": att_bn_s}},
               x, train=False)
    _check(out, _ref_out(ref, x), tol=1e-9)


def test_mqmhasp_linear():
    m = _ref_pooling()
    torch.manual_seed(0)
    x = _x()
    ref = m.MQMHASP_Linear(
        D, num_q=2, num_head=4, hidden_size=8
    ).double().eval()
    sd = _sd(ref)
    params, stats = {}, {}
    for i in range(2):
        att_bn_p, att_bn_s = _bn(sd, f"querys.{i}.attention.2")
        params[f"query_{i}"] = {
            "att1": _affine(sd, f"querys.{i}.attention.0"),
            "att_norm": att_bn_p,
            "att2": _affine(sd, f"querys.{i}.attention.4"),
        }
        stats[f"query_{i}"] = {"att_norm": att_bn_s}
    ours = P.MQMHASPLinear(num_q=2, num_head=4, hidden_size=8)
    out = _run(ours, {"params": params, "batch_stats": stats}, x,
               train=False)
    _check(out, _ref_out(ref, x), tol=1e-9)

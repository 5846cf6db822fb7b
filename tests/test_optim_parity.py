"""Optimizer-trajectory parity vs the reference torch implementations.

The reference ships CUSTOM optimizer implementations (optim.py: SGDW,
AdamW+GC, Ralamb, AdaMod, Novograd, Eve, Lookahead) whose quirks its
recipes trained with — e.g. Ralamb's param-norm "trust ratio" (inherited
from lonePatient, NOT the LAMB update-norm ratio), AdaMod's lr-folded
per-element rate bound with an uncorrected denom, Novograd's scalar
second moment seeded from the first grad norm, and "Eve" being the
k2/icefall target-RMS-decay AdamW (not the published loss-adaptive Eve).

Each case runs K steps on identical params and identical per-step
gradients in torch f64 vs our optax transforms in f64 and asserts the
full parameter trajectory matches leaf-by-leaf. (Ralamb is compared at
f32-level tolerance: the reference internally casts to float32.)
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from asv_subtools_tpu.train.optim import get_optimizer

K_STEPS = 5
SHAPES = {"w": (8, 6), "b": (6,), "s": ()}  # matrix, vector, scalar


def _ref_optim():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    # torch._six was removed in torch>=2.0; the reference only takes `inf`
    if "torch._six" not in sys.modules:
        import math
        import types

        six = types.ModuleType("torch._six")
        six.inf = math.inf
        sys.modules["torch._six"] = six
    spec = importlib.util.spec_from_file_location(
        "ref_optim", "/root/reference/pytorch/libs/training/optim.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference optim: {e}")
    return mod


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    params = {k: np.asarray(rng.normal(size=s) * (3.0 if k == "w" else 1.0))
              for k, s in SHAPES.items()}
    grads = [
        {k: np.asarray(rng.normal(size=s)) for k, s in SHAPES.items()}
        for _ in range(K_STEPS)
    ]
    return params, grads


def _run_torch(opt_ctor, params, grads):
    # our layouts are [in, out]; torch filter-major layouts are [out, in].
    # GC means the layout matters: transpose matrices so the per-filter
    # mean matches, and transpose back at the end.
    tparams = {
        k: torch.nn.Parameter(
            torch.from_numpy(v.T.copy() if v.ndim >= 2 else v.copy())
        )
        for k, v in params.items()
    }
    opt = opt_ctor(list(tparams.values()))
    for g in grads:
        opt.zero_grad()
        for k, p in tparams.items():
            gv = g[k]
            p.grad = torch.from_numpy(gv.T.copy() if gv.ndim >= 2 else gv.copy())
        opt.step()
    return {
        k: (p.detach().numpy().T if p.ndim >= 2 else p.detach().numpy())
        for k, p in tparams.items()
    }


def _run_ours(tx, params, grads):
    with jax.enable_x64():
        p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), params)
        state = tx.init(p)
        for g in grads:
            gj = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64), g
            )
            updates, state = tx.update(gj, state, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        return jax.device_get(p)


CASES = [
    (
        "sgdw",
        lambda m: (lambda ps: m.SGDW(ps, lr=0.1, momentum=0.9, weight_decay=0.01)),
        dict(name="sgdw", learning_rate=0.1, momentum=0.9, weight_decay=0.01),
        1e-9,
    ),
    (
        "adamW",
        lambda m: (lambda ps: m.AdamW(ps, lr=0.01, weight_decay=0.01)),
        dict(name="adamW", learning_rate=0.01, weight_decay=0.01),
        1e-9,
    ),
    (
        "adamW+gc",
        lambda m: (lambda ps: m.AdamW(ps, lr=0.01, weight_decay=0.01, gc=True)),
        dict(name="adamW", learning_rate=0.01, weight_decay=0.01, gc=True),
        1e-9,
    ),
    (
        "ralamb",
        lambda m: (lambda ps: m.Ralamb(ps, lr=0.01, weight_decay=0.01)),
        dict(name="ralamb", learning_rate=0.01, weight_decay=0.01),
        1e-5,  # reference computes internally in float32
    ),
    (
        "adamod",
        lambda m: (lambda ps: m.AdaMod(ps, lr=0.01, beta3=0.999,
                                       weight_decay=0.01)),
        dict(name="adamod", learning_rate=0.01, beta3=0.999,
             weight_decay=0.01),
        1e-9,
    ),
    (
        "novograd",
        lambda m: (lambda ps: m.Novograd(ps, lr=0.01, betas=(0.95, 0.25),
                                         weight_decay=0.01)),
        dict(name="novograd", learning_rate=0.01, beta1=0.95, beta2=0.25,
             weight_decay=0.01),
        1e-5,  # reference keeps its scalar second moment in float32
    ),
    (
        "eve",
        lambda m: (lambda ps: m.Eve(ps, lr=0.01, betas=(0.9, 0.98),
                                    weight_decay=1e-3)),
        dict(name="eve", learning_rate=0.01, beta1=0.9, beta2=0.98,
             weight_decay=1e-3),
        # reference decay factor (1 - wd*is_above) promotes through a bool
        # TENSOR to float32, so its decay multiplier is f32-rounded
        1e-5,
    ),
]


@pytest.mark.parametrize("name,ref_ctor,ours_kw,tol",
                         CASES, ids=[c[0] for c in CASES])
def test_trajectory_parity(name, ref_ctor, ours_kw, tol):
    m = _ref_optim()
    params, grads = _make_data()
    ref_final = _run_torch(ref_ctor(m), params, grads)

    tx = get_optimizer(**ours_kw)
    ours_final = _run_ours(tx, params, grads)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(ours_final[k]), ref_final[k], rtol=tol, atol=tol,
            err_msg=f"{name}: param {k} diverged after {K_STEPS} steps",
        )


def test_lookahead_parity():
    """Lookahead(AdamW) with k=3: the slow-weight interpolation fires
    once within 5 steps (reference optim.py:124-221)."""
    m = _ref_optim()
    params, grads = _make_data()

    def ctor(ps):
        return m.Lookahead(m.AdamW(ps, lr=0.01, weight_decay=0.0),
                           alpha=0.5, k=3)

    ref_final = _run_torch(ctor, params, grads)
    tx = get_optimizer(name="adamW", learning_rate=0.01, weight_decay=0.0,
                       lookahead=True, lookahead_k=3, lookahead_alpha=0.5)
    ours_final = _run_ours(tx, params, grads)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(ours_final[k]), ref_final[k], rtol=1e-9, atol=1e-9,
            err_msg=f"lookahead: param {k} diverged",
        )

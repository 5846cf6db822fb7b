"""S-norm / AS-norm parity vs the reference ScoreNormalization.py.

The reference operates on score FILES through pandas groupby; the test
writes the trial + cohort score tables, runs the reference's snorm() /
asnorm() (both cross-select modes) via an argparse namespace, reads its
output back, and compares every normalized trial score against our dense
matrix implementations.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from asv_subtools_tpu.backend.score_norm import asnorm, snorm

E, T, C = 5, 7, 40


def _ref_mod():
    spec = importlib.util.spec_from_file_location(
        "ref_scorenorm", "/root/reference/score/ScoreNormalization.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference ScoreNormalization: {e}")
    return mod


def _data(seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.normal(size=(E, T))
    ec = rng.normal(size=(E, C))
    tc = rng.normal(size=(T, C))
    return raw, ec, tc


def _write(tmp_path, raw, ec, tc):
    enr = [f"e{i}" for i in range(E)]
    tst = [f"t{j}" for j in range(T)]
    coh = [f"c{k}" for k in range(C)]
    p_in = tmp_path / "in.score"
    p_ec = tmp_path / "ec.score"
    p_tc = tmp_path / "tc.score"
    with open(p_in, "w") as f:
        for i in range(E):
            for j in range(T):
                f.write(f"{enr[i]} {tst[j]} {float(raw[i, j])!r}\n")
    with open(p_ec, "w") as f:
        for i in range(E):
            for k in range(C):
                f.write(f"{enr[i]} {coh[k]} {float(ec[i, k])!r}\n")
    with open(p_tc, "w") as f:
        for j in range(T):
            for k in range(C):
                f.write(f"{tst[j]} {coh[k]} {float(tc[j, k])!r}\n")
    return p_in, p_ec, p_tc


def _read_out(path):
    out = np.zeros((E, T))
    for line in open(path):
        e, t, s = line.split()
        out[int(e[1:]), int(t[1:])] = float(s)
    return out


def _run_ref(tmp_path, method, top_n=10, cross="false"):
    m = _ref_mod()
    raw, ec, tc = _data()
    p_in, p_ec, p_tc = _write(tmp_path, raw, ec, tc)
    p_out = tmp_path / "out.score"
    args = types.SimpleNamespace(
        input_score=str(p_in),
        enroll_cohort_score=str(p_ec),
        test_cohort_score=str(p_tc),
        output_score=str(p_out),
        second_cohort="true",
        top_n=top_n,
        cross_select=cross,
    )
    getattr(m, method)(args)
    return raw, ec, tc, _read_out(p_out)


def test_snorm(tmp_path):
    raw, ec, tc, ref = _run_ref(tmp_path, "snorm")
    ours = snorm(raw, ec, tc)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_asnorm_topn(tmp_path):
    raw, ec, tc, ref = _run_ref(tmp_path, "asnorm", top_n=10)
    ours = asnorm(raw, ec, tc, top_n=10)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_asnorm_cross_select(tmp_path):
    raw, ec, tc, ref = _run_ref(tmp_path, "asnorm", top_n=10, cross="true")
    ours = asnorm(raw, ec, tc, top_n=10, cross_select=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_zca_whitening_parity():
    """ZCA vs the reference mwv/zca class (train_ZCA_Whitening.py:29-66):
    uncentered ddof=1 moment, clip-then-sqrt spectrum."""
    import re

    # the script runs its CLI at import (no __main__ guard) — exec only
    # the ZCA class block
    text = open(
        "/root/reference/score/whiten/train_ZCA_Whitening.py"
    ).read()
    match = re.search(r"(class ZCA\(.*?)\n## class defined end ##", text,
                      re.DOTALL)
    if not match:  # pragma: no cover
        pytest.skip("cannot locate reference ZCA class")
    try:
        from scipy import linalg
        from sklearn.base import BaseEstimator, TransformerMixin
        from sklearn.utils import as_float_array
    except Exception as e:  # pragma: no cover
        pytest.skip(f"missing reference deps: {e}")
    ns = {"np": np, "linalg": linalg, "BaseEstimator": BaseEstimator,
          "TransformerMixin": TransformerMixin,
          "as_float_array": as_float_array}
    exec(match.group(1), ns)
    mod = types.SimpleNamespace(ZCA=ns["ZCA"])
    from asv_subtools_tpu.backend.transforms import ZCAWhitening

    rng = np.random.default_rng(0)
    x = rng.normal(size=(120, 10)) @ rng.normal(size=(10, 10))
    ref = mod.ZCA(regularization=1e-6)
    ref.fit(x.copy())
    ours = ZCAWhitening(regularization=1e-6).fit(x)
    v = rng.normal(size=(7, 10))
    np.testing.assert_allclose(
        ours.transform(v), np.dot(v, ref.whiten_.T), rtol=1e-8, atol=1e-10
    )

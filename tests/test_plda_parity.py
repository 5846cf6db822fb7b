"""PLDA backend parity vs the reference pyplda (score/pyplda/plda_base.py).

The reference file cannot import as shipped (`import scipye` — a typo —
and a hard kaldi_io dependency); the test shims both and loads it by
path. Then: identical grouped training vectors -> reference
PldaStats/PldaEstimation (python loops, 10 EM iters) vs our vectorized
segment-sum EM -> compare the global mean, the EM covariances' invariant
spectrum (psi up to eigh order), transformed-vector length norms, and
every trial's LLR score (the end-to-end quantity; invariant to the
eigenvector order/sign where the raw transform is not). Also covers the
unsupervised mean/covariance adaptor.
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

from asv_subtools_tpu.backend.plda import (
    Plda,
    PldaStats,
    estimate_plda,
)

S, N_PER, D = 12, 5, 8


def _ref_plda():
    for name in ("scipye", "kaldi_io"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    spec = importlib.util.spec_from_file_location(
        "ref_plda", "/root/reference/score/pyplda/plda_base.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference plda: {e}")
    return mod


def _grouped_data(seed=0):
    rng = np.random.default_rng(seed)
    between = rng.normal(size=(D, D))
    between = between @ between.T / D + np.eye(D)
    spk_means = rng.multivariate_normal(np.zeros(D), between, size=S)
    xs, ids = [], []
    for s in range(S):
        # variable utterances per speaker exercises the count grouping
        n = N_PER + (s % 3)
        xs.append(spk_means[s] + rng.normal(size=(n, D)) * 0.7 + 0.3)
        ids += [s] * n
    return np.concatenate(xs), np.asarray(ids)


def _fit_both(m, x, ids, iters=10):
    stats = m.PldaStats(D)
    for s in np.unique(ids):
        stats.add_samples(1.0, x[ids == s])
    stats.sort()
    est = m.PldaEstimation(stats)
    est.estimate(num_em_iters=iters)
    ref = est.get_output()
    # get_output leaves mean as a [D,1] column, which breaks the
    # reference's own transform_ivector broadcasting for 1-D inputs —
    # flatten (its file-reading path uses flat vectors)
    ref.mean = np.asarray(ref.mean).ravel()
    ref.compute_derived_vars()

    ours = estimate_plda(
        PldaStats.from_vectors(x, ids), num_em_iters=iters
    )
    return ref, ours


def test_em_and_llr_parity():
    m = _ref_plda()
    x, ids = _grouped_data()
    ref, ours = _fit_both(m, x, ids)

    np.testing.assert_allclose(
        ours.mean, np.asarray(ref.mean).ravel(), rtol=1e-10
    )
    # psi is the diagonalized between-class spectrum: identical up to order
    np.testing.assert_allclose(
        np.sort(ours.psi), np.sort(np.asarray(ref.psi).ravel()), rtol=1e-8
    )

    rng = np.random.default_rng(1)
    enroll = rng.normal(size=(4, D)) + 0.3
    test = rng.normal(size=(6, D)) + 0.3
    n_enroll = 3

    # reference per-pair scoring
    ref_scores = np.zeros((4, 6))
    t_test = [
        m.PLDA.transform_ivector(ref, t, 1) for t in test
    ]
    for i, e in enumerate(enroll):
        te = m.PLDA.transform_ivector(ref, e, n_enroll)
        for j in range(6):
            ref_scores[i, j] = m.PLDA.log_likelihood_ratio(
                ref, te, n_enroll, t_test[j]
            )

    te_ours = ours.transform_vectors(
        enroll, num_examples=np.full(4, n_enroll)
    )
    tt_ours = ours.transform_vectors(test, num_examples=np.ones(6))
    our_scores = ours.llr_matrix(
        te_ours, tt_ours, enroll_counts=np.full(4, n_enroll)
    )
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-5, atol=1e-6)


def test_length_norm_parity():
    m = _ref_plda()
    x, ids = _grouped_data()
    ref, ours = _fit_both(m, x, ids, iters=5)
    rng = np.random.default_rng(2)
    v = rng.normal(size=(5, D))
    for simple in (False, True):
        ref_t = np.stack([
            np.asarray(
                m.PLDA.transform_ivector(
                    _with_simple(ref, simple), vi, 2
                )
            ).ravel()
            for vi in v
        ])
        our_t = ours.transform_vectors(
            v, num_examples=np.full(5, 2), simple_length_norm=simple
        )
        # norms are order/sign invariant even though rows are permuted
        np.testing.assert_allclose(
            np.linalg.norm(our_t, axis=1),
            np.linalg.norm(ref_t, axis=1),
            rtol=1e-8,
        )


def _with_simple(ref, simple):
    ref.simple_length_norm = simple
    ref.normalize_length = True
    return ref


def test_unsupervised_adaptation_parity():
    """PldaUnsupervisedAdaptor vs backend.adaptation's unsupervised path:
    adapt with the same out-of-domain vectors, compare LLR scores."""
    m = _ref_plda()
    from asv_subtools_tpu.backend.adaptation import adapt_plda_unsupervised

    x, ids = _grouped_data()
    ref, ours = _fit_both(m, x, ids, iters=5)

    rng = np.random.default_rng(3)
    adapt_vecs = rng.normal(size=(60, D)) * 1.4 + 1.0

    # update_plda needs the COLUMN mean its estimator produces (its
    # mean_diff broadcasts to [D,D] garbage with a flat mean), while
    # transform_ivector needs a FLAT one — the reference's two methods
    # require incompatible shapes, so switch around the call
    ref.mean = np.asarray(ref.mean).reshape(-1, 1)
    adaptor = m.PldaUnsupervisedAdaptor()
    for v in adapt_vecs:
        adaptor.add_stats(1.0, v)
    adaptor.update_plda(ref)
    ref.mean = np.asarray(ref.mean).ravel()
    ref.compute_derived_vars()

    ours2 = adapt_plda_unsupervised(ours, adapt_vecs)

    enroll = rng.normal(size=(3, D))
    test = rng.normal(size=(5, D))
    ref_scores = np.zeros((3, 5))
    t_test = [m.PLDA.transform_ivector(ref, t, 1) for t in test]
    for i, e in enumerate(enroll):
        te = m.PLDA.transform_ivector(ref, e, 1)
        for j in range(5):
            ref_scores[i, j] = m.PLDA.log_likelihood_ratio(
                ref, te, 1, t_test[j]
            )
    te_o = ours2.transform_vectors(enroll)
    tt_o = ours2.transform_vectors(test)
    our_scores = ours2.llr_matrix(te_o, tt_o)
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-4, atol=1e-5)

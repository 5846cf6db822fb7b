"""Backend at vox1-E/H scale, on-device, mesh-sharded (VERDICT r1 #8).

582k trials (600 enroll x 970 test) against a 5,994-speaker cohort —
the scale at which the reference's pandas AS-norm implementation fails
(gather_results_from_epochs.sh:31-33, ScoreNormalization.py:109-179).
Verifies the sharded device path against the float64 numpy path and
records wall-times (printed; summarized in PERF.md).
"""

import time

import jax
import numpy as np
import pytest

from asv_subtools_tpu.backend import asnorm, asnorm_device
from asv_subtools_tpu.backend.plda import (
    PldaStats,
    estimate_plda,
    llr_matrix_device,
)
from asv_subtools_tpu.backend.score_norm import cosine_score_matrix
from asv_subtools_tpu.parallel import make_mesh

E, T, C, D = 600, 970, 5994, 256  # 582,000 trials; VoxCeleb2-dev cohort size


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(0)
    # speaker-structured embeddings: per-speaker centroid + within noise
    n_spk = 400
    centroids = rng.normal(size=(n_spk, D)).astype(np.float32)
    def draw(n):
        spk = rng.integers(0, n_spk, n)
        return (centroids[spk] + 0.5 * rng.normal(size=(n, D))).astype(
            np.float32
        ), spk
    enroll, espk = draw(E)
    test, tspk = draw(T)
    cohort, _ = draw(C)
    return enroll, test, cohort, espk, tspk


class TestVoxScaleBackend:
    def test_sharded_asnorm_matches_numpy(self, embeddings):
        enroll, test, cohort, _, _ = embeddings
        mesh = make_mesh(num_data=8, num_model=1)

        t0 = time.perf_counter()
        raw = np.asarray(cosine_score_matrix(enroll, test))
        ec = np.asarray(cosine_score_matrix(enroll, cohort))
        tc = np.asarray(cosine_score_matrix(test, cohort))
        t_score = time.perf_counter() - t0

        t0 = time.perf_counter()
        dev = np.asarray(
            asnorm_device(raw, ec, tc, top_n=300, mesh=mesh)
        )
        t_dev = time.perf_counter() - t0

        t0 = time.perf_counter()
        ref = asnorm(raw, ec, tc, top_n=300)
        t_np = time.perf_counter() - t0

        assert dev.shape == (E, T)
        assert np.isfinite(dev).all()
        np.testing.assert_allclose(dev, ref, rtol=2e-3, atol=2e-4)
        print(
            f"\n[vox-scale] {E * T} trials, cohort {C}: score {t_score:.2f}s, "
            f"asnorm sharded(8dev) {t_dev:.2f}s, numpy {t_np:.2f}s"
        )

    def test_sharded_equals_unsharded(self, embeddings):
        enroll, test, cohort, _, _ = embeddings
        mesh = make_mesh(num_data=8, num_model=1)
        raw = np.asarray(cosine_score_matrix(enroll[:100], test[:130]))
        ec = np.asarray(cosine_score_matrix(enroll[:100], cohort))
        tc = np.asarray(cosine_score_matrix(test[:130], cohort))
        a = np.asarray(asnorm_device(raw, ec, tc, top_n=200))
        b = np.asarray(asnorm_device(raw, ec, tc, top_n=200, mesh=mesh))
        # 100 and 130 are not divisible by 8: exercises the padding path
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_plda_llr_device_at_scale(self, embeddings):
        enroll, test, _, _, _ = embeddings
        rng = np.random.default_rng(1)
        # train a PLDA on synthetic speaker-structured vectors
        n_spk, per = 200, 8
        centroids = rng.normal(size=(n_spk, D))
        vecs = (
            centroids[:, None, :] + 0.4 * rng.normal(size=(n_spk, per, D))
        ).reshape(-1, D)
        labels = np.repeat(np.arange(n_spk), per)
        stats = PldaStats.from_vectors(vecs, labels)
        plda = estimate_plda(stats, num_em_iters=5)

        t0 = time.perf_counter()
        dev = np.asarray(llr_matrix_device(plda, enroll, test))
        t_dev = time.perf_counter() - t0
        assert dev.shape == (E, T)
        assert np.isfinite(dev).all()

        # parity vs the host implementation on a slice
        host = plda.llr_matrix(enroll[:40], test[:50])
        np.testing.assert_allclose(
            dev[:40, :50], host, rtol=2e-3, atol=2e-3
        )
        print(f"[vox-scale] PLDA LLR {E * T} trials on device: {t_dev:.2f}s")

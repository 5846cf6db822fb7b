"""Classic GMM-UBM / i-vector subsystem.

Parity: kaldi/runIvector.sh (UBM + 400-d total-variability i-vector via
sid/train_diag_ubm.sh + train_ivector_extractor.sh + extract_ivectors.sh),
re-designed as batched array programs: Baum-Welch statistics are two
matmuls per utterance batch; the T-matrix EM M-step solves per-component
normal equations with stacked einsums.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .classifiers import DiagGmm, train_diag_gmm


def train_ubm(
    frames: np.ndarray, num_components: int = 256, num_iters: int = 20, seed: int = 0
) -> DiagGmm:
    """Diagonal UBM on pooled frame features [N, D] (train_diag_ubm.sh)."""
    return train_diag_gmm(
        frames, num_components=num_components, num_iters=num_iters, seed=seed
    )


@dataclasses.dataclass
class BaumWelchStats:
    """Zeroth/first-order sufficient statistics per utterance."""

    n: np.ndarray  # [U, K] soft counts
    f: np.ndarray  # [U, K, D] first-order stats (already mean-centered)


def collect_stats(
    ubm: DiagGmm, utterances: Sequence[np.ndarray]
) -> BaumWelchStats:
    """Per-utterance Baum-Welch stats, centered by the UBM means."""
    k, d = ubm.means.shape
    n_out = np.zeros((len(utterances), k))
    f_out = np.zeros((len(utterances), k, d))
    for i, x in enumerate(utterances):
        gamma = ubm.responsibilities(np.asarray(x, np.float64))  # [T, K]
        n_out[i] = gamma.sum(axis=0)
        f_out[i] = gamma.T @ x - n_out[i][:, None] * ubm.means
    return BaumWelchStats(n_out, f_out)


@dataclasses.dataclass
class IvectorExtractor:
    """Total-variability model: M = m + T w, diag covariances from the UBM."""

    t: np.ndarray  # [K, D, R]
    ubm: DiagGmm

    @property
    def ivector_dim(self) -> int:
        return self.t.shape[2]

    def _posterior(self, n: np.ndarray, f: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior (mean, covariance) of w given one utterance's stats."""
        mean, cov = self._posterior_batch(n[None], f[None])
        return mean[0], cov[0]

    def _posterior_batch(
        self, n: np.ndarray, f: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior (means [U, R], covariances [U, R, R]) for a whole
        utterance batch at once — stacked einsums + one batched inverse,
        no per-utterance python loop."""
        k, d, r = self.t.shape
        sigma_inv = 1.0 / self.ubm.vars  # [K, D]
        # L_i = I + sum_k n_ik T_k' Sigma_k^-1 T_k
        ti = self.t * sigma_inv[:, :, None]  # [K, D, R]
        tt = np.einsum("kdr,kds->krs", ti, self.t)  # [K, R, R] (shared)
        l = np.eye(r)[None] + np.einsum("uk,krs->urs", n, tt)
        b = np.einsum("kdr,ukd->ur", ti, f)
        cov = np.linalg.inv(l)  # batched
        return np.einsum("urs,us->ur", cov, b), cov

    def extract(self, stats: BaumWelchStats) -> np.ndarray:
        """Posterior-mean i-vectors [U, R] (one batched solve)."""
        means, _ = self._posterior_batch(stats.n, stats.f)
        return means

    def extract_from_frames(self, utterances: Sequence[np.ndarray]) -> np.ndarray:
        return self.extract(collect_stats(self.ubm, utterances))


def train_ivector_extractor(
    ubm: DiagGmm,
    stats: BaumWelchStats,
    ivector_dim: int = 100,
    num_iters: int = 10,
    seed: int = 0,
) -> IvectorExtractor:
    """EM for the total-variability matrix T (train_ivector_extractor.sh).

    E-step: posterior mean/cov of w per utterance; M-step: per-component
    T_k <- (sum_i F_ik E[w]') (sum_i n_ik E[ww'])^-1.
    """
    rng = np.random.default_rng(seed)
    k, d = ubm.means.shape
    r = ivector_dim
    t = rng.normal(size=(k, d, r)) * 0.1
    model = IvectorExtractor(t, ubm)
    for _ in range(num_iters):
        # E-step: batched posteriors over ALL utterances at once
        means, covs = model._posterior_batch(stats.n, stats.f)  # [U,R],[U,R,R]
        eww = covs + np.einsum("ur,us->urs", means, means)  # [U, R, R]
        # M-step accumulators as stacked einsums (no python loops)
        acc_a = np.einsum("uk,urs->krs", stats.n, eww)  # sum_i n_ik E[ww']
        acc_b = np.einsum("ukd,ur->kdr", stats.f, means)  # sum_i f_ik E[w]'
        # batched per-component solve: T_k acc_a[k] = acc_b[k]
        model.t = np.linalg.solve(
            acc_a + 1e-6 * np.eye(r)[None],
            np.transpose(acc_b, (0, 2, 1)),
        ).transpose(0, 2, 1)
    return model

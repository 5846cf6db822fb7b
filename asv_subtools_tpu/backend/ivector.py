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
        k, d, r = self.t.shape
        sigma_inv = 1.0 / self.ubm.vars  # [K, D]
        # L = I + sum_k n_k T_k' Sigma_k^-1 T_k
        ti = self.t * sigma_inv[:, :, None]  # [K, D, R]
        l = np.eye(r) + np.einsum("k,kdr,kds->rs", n, ti, self.t)
        b = np.einsum("kdr,kd->r", ti, f)
        cov = np.linalg.inv(l)
        return cov @ b, cov

    def extract(self, stats: BaumWelchStats) -> np.ndarray:
        """Posterior-mean i-vectors [U, R]."""
        out = np.zeros((stats.n.shape[0], self.ivector_dim))
        for i in range(stats.n.shape[0]):
            out[i], _ = self._posterior(stats.n[i], stats.f[i])
        return out

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
    u = stats.n.shape[0]
    for _ in range(num_iters):
        acc_a = np.zeros((k, r, r))  # sum_i n_ik E[w w']
        acc_b = np.zeros((k, d, r))  # sum_i f_ik E[w]'
        for i in range(u):
            mean, cov = model._posterior(stats.n[i], stats.f[i])
            eww = cov + np.outer(mean, mean)
            acc_a += stats.n[i][:, None, None] * eww[None, :, :]
            acc_b += stats.f[i][:, :, None] * mean[None, None, :]
        for ki in range(k):
            # solve T_k acc_a[k] = acc_b[k]
            model.t[ki] = np.linalg.solve(
                acc_a[ki] + 1e-6 * np.eye(r), acc_b[ki].T
            ).T
    return model

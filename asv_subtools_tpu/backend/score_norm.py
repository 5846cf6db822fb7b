"""Score normalization: S-norm and adaptive AS-norm (top-N), vectorized.

Parity: score/ScoreNormalization.py (snorm :70-107, asnorm :109-179 incl.
cross-select). The reference's pandas groupby cannot handle vox1-E/H scale
(gather_results_from_epochs.sh:31-33) — here cohort statistics are top-k
reductions over dense [N, cohort] score matrices, which also shard cleanly
over a device mesh for very large tasks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _mean_std_topk(scores: np.ndarray, top_n: Optional[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Row-wise mean/std over the top_n largest entries (ddof=1, matching
    pandas .std())."""
    s = np.asarray(scores, np.float64)
    if top_n is not None and top_n < s.shape[1]:
        part = -np.partition(-s, top_n - 1, axis=1)[:, :top_n]
    else:
        part = s
    mean = part.mean(axis=1)
    std = part.std(axis=1, ddof=1)
    return mean, std


def snorm(
    raw: np.ndarray,
    enroll_cohort: np.ndarray,
    test_cohort: np.ndarray,
) -> np.ndarray:
    """Symmetric normalization.

    raw [E, T] trial scores; enroll_cohort [E, C]; test_cohort [T, C].
    """
    em, es = _mean_std_topk(enroll_cohort, None)
    tm, ts = _mean_std_topk(test_cohort, None)
    return 0.5 * (
        (raw - em[:, None]) / es[:, None] + (raw - tm[None, :]) / ts[None, :]
    )


def asnorm(
    raw: np.ndarray,
    enroll_cohort: np.ndarray,
    test_cohort: np.ndarray,
    top_n: int = 300,
    cross_select: bool = False,
) -> np.ndarray:
    """Adaptive S-norm with top-N cohort selection.

    Standard: each side's cohort stats use its own top-N scores.
    Cross-select (ScoreNormalization.py:144-159): the enroll-side stats for
    trial (e, t) are computed over the cohort set selected by TEST t's
    top-N, and vice versa — a per-trial [E, T] statistic.
    """
    if not cross_select:
        em, es = _mean_std_topk(enroll_cohort, top_n)
        tm, ts = _mean_std_topk(test_cohort, top_n)
        return 0.5 * (
            (raw - em[:, None]) / es[:, None] + (raw - tm[None, :]) / ts[None, :]
        )

    e = np.asarray(enroll_cohort, np.float64)  # [E, C]
    t = np.asarray(test_cohort, np.float64)  # [T, C]
    c = e.shape[1]
    top_n = min(top_n, c)
    # top-N masks per row
    def topn_mask(m):
        thresh = -np.partition(-m, top_n - 1, axis=1)[:, top_n - 1 : top_n]
        return m >= thresh  # [rows, C] boolean (>= handles ties like head(n)~)

    e_sel = topn_mask(e)  # enroll's top cohort ids [E, C]
    t_sel = topn_mask(t)  # test's top cohort ids [T, C]

    # enroll stats over test-selected cohorts: for pair (i,j):
    # mean_ij = sum_c e[i,c]*t_sel[j,c] / n_j
    tw = t_sel.astype(np.float64)
    n_t = tw.sum(axis=1)  # [T]
    e_mean = (e @ tw.T) / n_t[None, :]  # [E, T]
    e_sq = (e**2) @ tw.T / n_t[None, :]
    e_std = np.sqrt(
        np.maximum(e_sq - e_mean**2, 1e-12) * (n_t / np.maximum(n_t - 1, 1))[None, :]
    )

    ew = e_sel.astype(np.float64)
    n_e = ew.sum(axis=1)  # [E]
    t_mean = (t @ ew.T) / n_e[None, :]  # [T, E]
    t_sq = (t**2) @ ew.T / n_e[None, :]
    t_std = np.sqrt(
        np.maximum(t_sq - t_mean**2, 1e-12) * (n_e / np.maximum(n_e - 1, 1))[None, :]
    )
    return 0.5 * ((raw - e_mean) / e_std + (raw - t_mean.T) / t_std.T)


def asnorm_device(
    raw: jnp.ndarray,
    enroll_cohort: jnp.ndarray,
    test_cohort: jnp.ndarray,
    top_n: int = 300,
    mesh=None,
) -> jnp.ndarray:
    """Jittable AS-norm: top-k on device, sharded over trial rows.

    With `mesh`, the [E, T] trial matrix and both cohort matrices are
    sharded row-wise over the mesh's data axis (C replicated): each device
    computes top-k cohort stats for its slice of enroll rows, and XLA
    all-gathers only the tiny [T] test-side stat vectors — vox1-E/H scale
    (581k trials x 6k cohort) that the reference's pandas implementation
    cannot reach (ScoreNormalization.py:109-179,
    gather_results_from_epochs.sh:31-33). Without `mesh`, plain jit.
    """

    def stats(mat):
        k = min(top_n, mat.shape[1])
        top = jax.lax.top_k(mat, k)[0]
        mean = jnp.mean(top, axis=1)
        var = jnp.sum((top - mean[:, None]) ** 2, axis=1) / jnp.maximum(k - 1, 1)
        return mean, jnp.sqrt(jnp.maximum(var, 1e-12))

    def compute(raw, ec, tc):
        em, es = stats(ec)
        tm, ts = stats(tc)
        return 0.5 * (
            (raw - em[:, None]) / es[:, None] + (raw - tm[None, :]) / ts[None, :]
        )

    raw = jnp.asarray(raw, jnp.float32)
    ec = jnp.asarray(enroll_cohort, jnp.float32)
    tc = jnp.asarray(test_cohort, jnp.float32)
    if mesh is None:
        return jax.jit(compute)(raw, ec, tc)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    e, t = raw.shape

    def pad_rows(m, target):
        return jnp.pad(m, [(0, target - m.shape[0]), (0, 0)])

    e_pad = -(-e // n_data) * n_data
    t_pad = -(-t // n_data) * n_data
    raw_p = jnp.pad(raw, [(0, e_pad - e), (0, t_pad - t)])
    ec_p = pad_rows(ec, e_pad)
    tc_p = pad_rows(tc, t_pad)

    rows = NamedSharding(mesh, P(DATA_AXIS, None))
    fn = jax.jit(
        compute,
        in_shardings=(rows, rows, rows),
        out_shardings=rows,
    )
    out = fn(
        jax.device_put(raw_p, rows),
        jax.device_put(ec_p, rows),
        jax.device_put(tc_p, rows),
    )
    return out[:e, :t]


def cosine_score_matrix(
    enroll: jnp.ndarray, test: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """Cosine scoring as one big (shardable) matmul [E, T].

    The reference scores trials with a per-pair dot product via Kaldi
    binaries; on TPU the full matrix is a single MXU matmul.
    """
    e = jnp.asarray(enroll, jnp.float32)
    t = jnp.asarray(test, jnp.float32)
    if normalize:
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return e @ t.T

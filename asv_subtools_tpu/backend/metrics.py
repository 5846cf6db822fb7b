"""Evaluation metrics: EER, minDCF, Cavg, min t-DCF — vectorized sweeps.

Parity: computeEER.sh/compute-eer (Kaldi), computeEER-like-Bosaris.py,
computeCavg.py:83-117, computeMin-t-DCF.py. All are O(N log N)
sort-and-sweep array programs instead of per-threshold loops.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def roc_curve(
    scores: np.ndarray, labels: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(false-alarm rate, miss rate, thresholds) swept over all scores.

    labels: 1 = target, 0 = nontarget. Thresholds descend; at threshold t
    a trial is accepted iff score >= t.
    """
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    order = np.argsort(-scores, kind="mergesort")
    s = scores[order]
    l = labels[order]
    n_target = l.sum()
    n_non = len(l) - n_target
    if n_target == 0 or n_non == 0:
        raise ValueError("need both target and nontarget trials")
    tp = np.cumsum(l)  # accepted targets at each cut
    fp = np.cumsum(1 - l)  # accepted nontargets
    fa = fp / n_non
    miss = 1.0 - tp / n_target
    return fa, miss, s


def compute_eer(scores: np.ndarray, labels: np.ndarray) -> Tuple[float, float]:
    """Equal error rate + its threshold (Kaldi compute-eer semantics)."""
    fa, miss, thr = roc_curve(scores, labels)
    idx = np.nanargmin(np.abs(miss - fa))
    # linear interpolation between the bracketing points (Bosaris-like)
    if miss[idx] == fa[idx]:
        return float(miss[idx]), float(thr[idx])
    # find crossing
    diff = miss - fa
    sign = np.signbit(diff)
    cross = np.where(sign[:-1] != sign[1:])[0]
    if len(cross) == 0:
        return float((miss[idx] + fa[idx]) / 2), float(thr[idx])
    i = cross[0]
    d0, d1 = diff[i], diff[i + 1]
    w = d0 / (d0 - d1) if d0 != d1 else 0.5
    eer = fa[i] + w * (fa[i + 1] - fa[i])
    t = thr[i] + w * (thr[i + 1] - thr[i])
    return float(eer), float(t)


def compute_min_dcf(
    scores: np.ndarray,
    labels: np.ndarray,
    p_target: float = 0.01,
    c_miss: float = 1.0,
    c_fa: float = 1.0,
) -> Tuple[float, float]:
    """Normalized minimum detection cost (NIST DCF)."""
    fa, miss, thr = roc_curve(scores, labels)
    dcf = c_miss * miss * p_target + c_fa * fa * (1.0 - p_target)
    dcf_default = min(c_miss * p_target, c_fa * (1.0 - p_target))
    idx = int(np.argmin(dcf))
    return float(dcf[idx] / dcf_default), float(thr[idx])


def compute_cavg(
    pairs: Sequence[Tuple[int, int, float]],
    lang_num: int,
    p_target: float = 0.5,
    bins: int = 20,
    min_score: Optional[float] = None,
    max_score: Optional[float] = None,
    unknown_as_nontarget: bool = False,
) -> Tuple[list, float]:
    """LID Cavg over threshold bins (parity: computeCavg.py:83-117).

    pairs: (claimed_lang_id, true_lang_id or -1, score). With
    unknown_as_nontarget (computeCavg_unknown.py), utterances whose true
    language is unknown (-1) count as an extra nontarget class for every
    claimed language.
    """
    arr = np.asarray([[a, b, c] for a, b, c in pairs], np.float64)
    claimed = arr[:, 0].astype(int)
    true = arr[:, 1].astype(int)
    score = arr[:, 2]
    lo = score.min() if min_score is None else min_score
    hi = score.max() if max_score is None else max_score
    precision = (hi - lo) / bins
    # computeCavg_unknown.py:114: with the unknown pseudo-class the
    # nontarget prior divides by lang_num (lang_num_1 - 1), not lang_num-1
    n_nontarget_classes = lang_num if unknown_as_nontarget else lang_num - 1
    p_nontarget = (1.0 - p_target) / n_nontarget_classes

    cavgs = []
    for section in range(bins + 1):
        threshold = lo + section * precision
        target_cavg = np.zeros(lang_num)
        for lang in range(lang_num):
            sel = claimed == lang
            is_tgt = sel & (true == lang)
            n_tgt = is_tgt.sum()
            p_miss = (score[is_tgt] < threshold).mean() if n_tgt else 0.0
            p_fa_sum = 0.0
            others = list(range(lang_num))
            if unknown_as_nontarget:
                others.append(-1)
            for other in others:
                if other == lang:
                    continue
                is_non = sel & (true == other)
                if is_non.sum():
                    p_fa_sum += (score[is_non] >= threshold).mean()
            target_cavg[lang] = p_target * p_miss + p_nontarget * p_fa_sum
        cavgs.append(float(target_cavg.mean()))
    return cavgs, float(min(cavgs))


def compute_min_tdcf(
    asv_scores: np.ndarray,
    asv_labels: np.ndarray,  # 1 target, 0 nontarget, -1 spoof
    cm_scores: np.ndarray,
    cm_labels: np.ndarray,  # 1 bona fide, 0 spoof
    pi_tar: float = 0.9405,
    pi_non: float = 0.0095,
    pi_spoof: float = 0.05,
    c_miss_asv: float = 1.0,
    c_fa_asv: float = 10.0,
    c_miss_cm: float = 1.0,
    c_fa_cm: float = 10.0,
) -> float:
    """ASVspoof t-DCF with the reference's fixed priors/costs
    (computeMin-t-DCF.py:14-25), ASV operating at its EER threshold."""
    tar = asv_scores[asv_labels == 1]
    non = asv_scores[asv_labels == 0]
    spoof = asv_scores[asv_labels == -1]
    eer, thr = compute_eer(
        np.concatenate([tar, non]),
        np.concatenate([np.ones(len(tar)), np.zeros(len(non))]),
    )
    p_miss_asv = (tar < thr).mean()
    p_fa_asv = (non >= thr).mean()
    p_miss_spoof_asv = (spoof < thr).mean() if len(spoof) else 0.0

    c1 = (
        pi_tar * (c_miss_cm - c_miss_asv * p_miss_asv)
        - pi_non * c_fa_asv * p_fa_asv
    )
    c2 = c_fa_cm * pi_spoof * (1.0 - p_miss_spoof_asv)
    if c1 < 0 or c2 < 0:
        raise ValueError("negative t-DCF weights; check ASV scores")

    bona = cm_scores[cm_labels == 1]
    sp = cm_scores[cm_labels == 0]
    fa_cm, miss_cm, _ = roc_curve(
        np.concatenate([bona, sp]),
        np.concatenate([np.ones(len(bona)), np.zeros(len(sp))]),
    )
    tdcf = c1 * miss_cm + c2 * fa_cm
    tdcf_default = min(c1, c2)
    return float(tdcf.min() / tdcf_default) if tdcf_default > 0 else float("inf")

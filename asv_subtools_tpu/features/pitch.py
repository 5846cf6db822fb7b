"""Kaldi-style pitch features: NCCF + Viterbi tracking + POV.

Parity target: Kaldi compute-kaldi-pitch / process-pitch-feats
(Ghahremani et al., "A pitch extraction algorithm tuned for ASR", ICASSP
2014) — the algorithm the reference's fbank_pitch/mfcc_pitch configs rely
on (makeFeatures.sh -> steps/make_fbank_pitch.sh). Reimplemented from the
published algorithm (algorithmic parity; the reference runtime only ships
the header, pitch-functions.h:27):

  1. resample the waveform to `resample_freq` (4 kHz)
  2. per frame, NCCF over candidate lags spanning [1/max_f0, 1/min_f0],
     with a ballast term that suppresses spurious unvoiced correlation
  3. Viterbi over lag states with an octave-jump penalty
     (penalty_factor * log(lag_i/lag_j)^2), vectorized over states
  4. POV (probability-of-voicing) feature from the raw NCCF
  5. post-processing into the 3-dim Kaldi pitch feature:
     [pov_feature, normalized_log_pitch (POV-weighted mean-subtracted),
      delta_pitch]

Host-side numpy (pitch augments data prep, not the train hot path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
from scipy import signal as sps


@dataclasses.dataclass(frozen=True)
class PitchOptions:
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    resample_freq: float = 4000.0
    penalty_factor: float = 0.1
    delta_pitch: float = 0.005  # relative lag spacing
    nccf_ballast: float = 7000.0
    soft_min_f0: float = 10.0
    # post-processing
    pov_scale: float = 2.0
    delta_window: int = 2
    normalization_window: int = 151  # frames, centered mean of log-pitch


def _candidate_lags(opts: PitchOptions) -> np.ndarray:
    """Geometric lag grid from 1/max_f0 to 1/min_f0 (Kaldi delta_pitch)."""
    min_lag = 1.0 / opts.max_f0
    max_lag = 1.0 / opts.min_f0
    lags = [min_lag]
    while lags[-1] < max_lag:
        lags.append(lags[-1] * (1.0 + opts.delta_pitch))
    return np.asarray(lags)


def _nccf(
    wave: np.ndarray, opts: PitchOptions, lags_samples: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """NCCF matrix [T, L] with and without ballast.

    nccf(t, l) = <x_t, x_{t+l}> / sqrt((e_t + ballast)(e_{t+l} + ballast))
    where x_t is the window starting at frame t's sample offset.
    """
    sr = opts.resample_freq
    shift = int(sr * 0.001 * opts.frame_shift_ms)
    window = int(sr * 0.001 * opts.frame_length_ms)
    max_lag = int(lags_samples.max())
    n = len(wave)
    t_frames = max(0, 1 + (n - (window + max_lag)) // shift)
    if t_frames == 0:
        return np.zeros((0, len(lags_samples))), np.zeros((0, len(lags_samples)))

    # ballast in energy^2 units (inside the sqrt of the energy product):
    # denom = sqrt(e0*e1 + nccf_ballast * global_mean_sq^2). For voiced
    # frames e0*e1 ~ (w*ms)^2 dominates (w^2 > nccf_ballast); for quiet
    # frames the ballast squashes the correlation toward zero.
    mean_sq = float(np.mean(wave**2)) + 1e-10
    ballast = opts.nccf_ballast * mean_sq * mean_sq

    starts = np.arange(t_frames) * shift
    idx = starts[:, None] + np.arange(window)[None, :]
    frames0 = wave[idx]  # [T, W]
    e0 = np.sum(frames0**2, axis=1)  # [T]

    nccf_b = np.zeros((t_frames, len(lags_samples)))
    nccf_nb = np.zeros((t_frames, len(lags_samples)))
    for li, lag in enumerate(lags_samples):
        lag = int(lag)
        frames_l = wave[idx + lag]
        cross = np.sum(frames0 * frames_l, axis=1)
        e1 = np.sum(frames_l**2, axis=1)
        denom_b = np.sqrt(e0 * e1 + ballast) + 1e-10
        denom_nb = np.sqrt(e0 * e1) + 1e-10
        nccf_b[:, li] = cross / denom_b
        nccf_nb[:, li] = cross / denom_nb
    return nccf_b, nccf_nb


def _viterbi_lags(
    nccf: np.ndarray, lags: np.ndarray, opts: PitchOptions
) -> np.ndarray:
    """Best lag index per frame via Viterbi with octave-jump penalty."""
    t, l = nccf.shape
    if t == 0:
        return np.zeros(0, int)
    log_lag = np.log(lags)
    # transition cost [L, L]: the paper's octave-jump penalty
    # penalty_factor * log(lag_i/lag_j)^2 (Ghahremani 2014, eq. 3)
    diff = log_lag[:, None] - log_lag[None, :]
    trans = opts.penalty_factor * diff**2
    # local cost with the soft-min-f0 lag penalty (paper eq. 2:
    # 1 - nccf * (1 - soft_min_f0 * lag)) — breaks subharmonic ties toward
    # the shorter lag, since integer multiples of the period correlate too
    cost = 1.0 - nccf * (1.0 - opts.soft_min_f0 * lags[None, :])
    acc = cost[0].copy()
    back = np.zeros((t, l), np.int32)
    for i in range(1, t):
        total = acc[None, :] + trans  # [to, from]
        back[i] = np.argmin(total, axis=1)
        acc = total[np.arange(l), back[i]] + cost[i]
    path = np.zeros(t, np.int32)
    path[-1] = int(np.argmin(acc))
    for i in range(t - 2, -1, -1):
        path[i] = back[i + 1][path[i + 1]]
    return path


def _nccf_to_pov_feature(nccf: np.ndarray) -> np.ndarray:
    """Kaldi NccfToPovFeature: f = 2*((1.0001 - nccf)^0.15 - 1)."""
    return 2.0 * ((1.0001 - nccf) ** 0.15 - 1.0)


def nccf_to_pov(nccf: np.ndarray) -> np.ndarray:
    """Kaldi NccfToPov: probability of voicing from NCCF via the published
    polynomial fit on |nccf|."""
    c = np.abs(np.clip(nccf, -1.0, 1.0))
    # Kaldi pitch-functions.cc NccfToPov polynomial
    ndash = -5.2 + 5.4 * np.exp(7.5 * (c - 1.0)) + 4.8 * c - 2.0 * np.exp(
        -10.0 * c
    ) + 4.2 * np.exp(20.0 * (c - 1.0))
    return 1.0 / (1.0 + np.exp(-ndash))


def compute_kaldi_pitch(
    wave: np.ndarray, opts: PitchOptions = PitchOptions()
) -> np.ndarray:
    """wave [S] at opts.samp_freq -> [T, 2] (nccf_pov_raw, pitch_hz).

    T matches the standard Kaldi frame count for the SAME shift at the
    original rate (frames are trimmed/padded by edge copy to align with
    fbank frames).
    """
    from math import gcd

    sr_in, sr = int(opts.samp_freq), int(opts.resample_freq)
    g = gcd(sr_in, sr)
    down = sps.resample_poly(np.asarray(wave, np.float64), sr // g, sr_in // g)

    lags = _candidate_lags(opts)
    lags_samples = np.unique(np.round(lags * sr).astype(int))
    lags_sec = lags_samples / sr

    nccf_b, nccf_nb = _nccf(down, opts, lags_samples)
    if nccf_b.shape[0] == 0:
        return np.zeros((0, 2), np.float32)
    path = _viterbi_lags(nccf_b, lags_sec, opts)
    t = len(path)
    pitch = 1.0 / lags_sec[path]
    best_nccf = nccf_nb[np.arange(t), path]

    # align to the fbank frame count at the original rate
    shift = int(opts.samp_freq * 0.001 * opts.frame_shift_ms)
    window = int(opts.samp_freq * 0.001 * opts.frame_length_ms)
    t_target = max(0, 1 + (len(wave) - window) // shift)
    out = np.zeros((t_target, 2), np.float32)
    n = min(t, t_target)
    out[:n, 0] = best_nccf[:n]
    out[:n, 1] = pitch[:n]
    if t_target > n and n > 0:  # pad by edge copy
        out[n:, 0] = best_nccf[n - 1]
        out[n:, 1] = pitch[n - 1]
    return out


def process_pitch(
    raw: np.ndarray, opts: PitchOptions = PitchOptions()
) -> np.ndarray:
    """Raw (nccf, pitch) -> 3-dim Kaldi pitch feature
    [pov_feature, normalized_log_pitch, delta_pitch]
    (process-pitch-feats defaults: add-pov-feature, add-normalized-log-pitch,
    add-delta-pitch)."""
    if raw.shape[0] == 0:
        return np.zeros((0, 3), np.float32)
    nccf, pitch = raw[:, 0], np.maximum(raw[:, 1], 1.0)
    pov_feat = _nccf_to_pov_feature(nccf) * opts.pov_scale
    pov = nccf_to_pov(nccf)
    log_pitch = np.log(pitch)

    # POV-weighted moving-average subtraction (centered window)
    t = len(pitch)
    half = opts.normalization_window // 2
    norm_log = np.zeros(t)
    csum_w = np.concatenate([[0.0], np.cumsum(pov)])
    csum_wl = np.concatenate([[0.0], np.cumsum(pov * log_pitch)])
    for i in range(t):
        a, b = max(0, i - half), min(t, i + half + 1)
        w = csum_w[b] - csum_w[a]
        wl = csum_wl[b] - csum_wl[a]
        mean = wl / max(w, 1e-10)
        norm_log[i] = log_pitch[i] - mean

    # delta pitch over a small window
    dw = opts.delta_window
    delta = np.zeros(t)
    denom = sum(j * j for j in range(1, dw + 1)) * 2.0
    for j in range(1, dw + 1):
        upper = np.concatenate([log_pitch[j:], np.repeat(log_pitch[-1], j)])
        lower = np.concatenate([np.repeat(log_pitch[0], j), log_pitch[:-j]])
        delta += j * (upper - lower)
    delta /= denom

    return np.stack([pov_feat, norm_log * 1.0, delta * 10.0], axis=1).astype(
        np.float32
    )


def compute_and_process_pitch(
    wave: np.ndarray, opts: PitchOptions = PitchOptions()
) -> np.ndarray:
    """wave -> 3-dim pitch features aligned with fbank frames (the
    `fbank_pitch` pipeline appends these to the fbank matrix)."""
    return process_pitch(compute_kaldi_pitch(wave, opts), opts)

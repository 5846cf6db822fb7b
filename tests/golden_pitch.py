"""Golden float64 NumPy implementation of the Kaldi pitch algorithm.

A direct scalar/loop transcription of the published spec (Ghahremani et
al., ICASSP 2014 + the option semantics in the reference's
runtime/kaldifeat/csrc/pitch-functions.h:27-115, which ships options only
— the reference never implemented the algorithm itself). Deliberately
structured with per-frame/per-lag loops so it and the vectorized
implementation in asv_subtools_tpu/features/pitch.py act as independent
checks on each other:

  NCCF:      nccf(t,l) = sum x_t[j] x_{t+l}[j] / sqrt((e_t + B)(e_{t+l} + B))
             with ballast B = nccf_ballast * E[x^2]^2 (0 for the "no
             ballast" matrix used for the POV output).
  Viterbi:   local cost  1 - nccf(t,l) (1 - soft_min_f0 * lag_l)   (paper eq)
             transition  penalty_factor * log(lag_i / lag_j)^2
  POV:       f = 2((1.0001 - nccf)^0.15 - 1);
             p = 1/(1+exp(-l)), l = -5.2 + 5.4 e^{7.5(c-1)} + 4.8c
                                    - 2 e^{-10c} + 4.2 e^{20(c-1)}
  Process:   [pov_feature, POV-weighted mean-subtracted log-pitch,
              delta log-pitch], matching process-pitch-feats defaults.
"""

import math

import numpy as np


def golden_filter_func(t, cutoff, num_zeros):
    """Kaldi resample.h FilterFunc, scalar: Hanning-windowed sinc with
    support |t| < num_zeros/(2 cutoff)."""
    t = float(t)
    if abs(t) >= num_zeros / (2.0 * cutoff):
        return 0.0
    window = 0.5 * (1.0 + math.cos(2.0 * math.pi * cutoff / num_zeros * t))
    if t == 0.0:
        return window * 2.0 * cutoff
    return window * math.sin(2.0 * math.pi * cutoff * t) / (math.pi * t)


def golden_lowpass_resample(wave, sr_in, sr_out, cutoff, num_zeros):
    """Per-output-sample loop over the windowed-sinc interpolation
    (LinearResample semantics: one pass lowpasses at `cutoff` AND changes
    the rate)."""
    n_in = len(wave)
    n_out = int(n_in * sr_out / sr_in)
    out = np.zeros(n_out)
    half_support = num_zeros / (2.0 * cutoff)
    for j in range(n_out):
        t_out = j / sr_out
        lo = int(math.floor((t_out - half_support) * sr_in)) - 1
        hi = int(math.ceil((t_out + half_support) * sr_in)) + 1
        acc = 0.0
        for i in range(max(0, lo), min(n_in, hi + 1)):
            acc += float(wave[i]) * golden_filter_func(
                i / sr_in - t_out, cutoff, num_zeros
            )
        out[j] = acc / sr_in
    return out


def golden_resample_nccf(nccf_row, first_lag, lags_sec, resample_freq,
                         upsample_filter_width=5):
    """Interpolate ONE frame's integer-lag NCCF at the exact geometric
    lags (ArbitraryResample: cutoff = resample_freq/2), scalar loops."""
    cutoff = 0.5 * resample_freq
    n = len(nccf_row)
    out = np.zeros(len(lags_sec))
    half_support = upsample_filter_width / (2.0 * cutoff)
    for li, lag in enumerate(lags_sec):
        pos = lag * resample_freq - first_lag  # fractional sample index
        lo = int(math.floor(pos - half_support * resample_freq)) - 1
        hi = int(math.ceil(pos + half_support * resample_freq)) + 1
        acc = 0.0
        for i in range(max(0, lo), min(n, hi + 1)):
            acc += float(nccf_row[i]) * golden_filter_func(
                (i - pos) / resample_freq, cutoff, upsample_filter_width
            )
        out[li] = acc / resample_freq
    return out


def golden_candidate_lags(min_f0=50.0, max_f0=400.0, delta_pitch=0.005):
    lags = []
    lag = 1.0 / max_f0
    while lag < 1.0 / min_f0:
        lags.append(lag)
        lag *= 1.0 + delta_pitch
    lags.append(lag)
    return np.asarray(lags, np.float64)


def golden_nccf(wave, lags_samples, resample_freq=4000.0, frame_shift_ms=10.0,
                frame_length_ms=25.0, nccf_ballast=7000.0):
    """Return (nccf_ballast_mat, nccf_noballast_mat), each [T, L]."""
    shift = int(resample_freq * frame_shift_ms / 1000.0)
    window = int(resample_freq * frame_length_ms / 1000.0)
    max_lag = int(max(lags_samples))
    n = len(wave)
    t_frames = max(0, 1 + (n - (window + max_lag)) // shift)
    mean_sq = 0.0
    for s in wave:
        mean_sq += float(s) * float(s)
    mean_sq = mean_sq / max(n, 1) + 1e-10
    ballast = nccf_ballast * mean_sq * mean_sq

    nb = np.zeros((t_frames, len(lags_samples)))
    nnb = np.zeros((t_frames, len(lags_samples)))
    for t in range(t_frames):
        start = t * shift
        x0 = wave[start : start + window]
        e0 = 0.0
        for v in x0:
            e0 += float(v) * float(v)
        for li, lag in enumerate(lags_samples):
            x1 = wave[start + int(lag) : start + int(lag) + window]
            cross = 0.0
            e1 = 0.0
            for a, b in zip(x0, x1):
                cross += float(a) * float(b)
                e1 += float(b) * float(b)
            nb[t, li] = cross / (math.sqrt(e0 * e1 + ballast) + 1e-10)
            nnb[t, li] = cross / (math.sqrt(e0 * e1) + 1e-10)
    return nb, nnb


def golden_viterbi(nccf, lags_sec, penalty_factor=0.1, soft_min_f0=10.0):
    """Best lag index per frame; explicit forward pass + traceback."""
    t_frames, n_lags = nccf.shape
    if t_frames == 0:
        return np.zeros(0, int)
    local = np.zeros((t_frames, n_lags))
    for t in range(t_frames):
        for l in range(n_lags):
            local[t, l] = 1.0 - nccf[t, l] * (1.0 - soft_min_f0 * lags_sec[l])
    acc = [local[0, l] for l in range(n_lags)]
    back = [[0] * n_lags for _ in range(t_frames)]
    for t in range(1, t_frames):
        new_acc = [0.0] * n_lags
        for l in range(n_lags):
            best_cost, best_j = None, 0
            for j in range(n_lags):
                trans = penalty_factor * math.log(lags_sec[l] / lags_sec[j]) ** 2
                c = acc[j] + trans
                if best_cost is None or c < best_cost:
                    best_cost, best_j = c, j
            back[t][l] = best_j
            new_acc[l] = best_cost + local[t, l]
        acc = new_acc
    path = [0] * t_frames
    best = min(range(n_lags), key=lambda l: acc[l])
    path[-1] = best
    for t in range(t_frames - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return np.asarray(path, int)


def golden_pov_feature(nccf):
    out = np.zeros_like(nccf, np.float64)
    flat_in, flat_out = nccf.reshape(-1), out.reshape(-1)
    for i, c in enumerate(flat_in):
        flat_out[i] = 2.0 * ((1.0001 - float(c)) ** 0.15 - 1.0)
    return out


def golden_pov(nccf):
    out = np.zeros_like(nccf, np.float64)
    flat_in, flat_out = nccf.reshape(-1), out.reshape(-1)
    for i, cv in enumerate(flat_in):
        c = abs(max(-1.0, min(1.0, float(cv))))
        ndash = (
            -5.2
            + 5.4 * math.exp(7.5 * (c - 1.0))
            + 4.8 * c
            - 2.0 * math.exp(-10.0 * c)
            + 4.2 * math.exp(20.0 * (c - 1.0))
        )
        flat_out[i] = 1.0 / (1.0 + math.exp(-ndash))
    return out


def golden_process(nccf, pitch_hz, pov_scale=2.0, pitch_scale=2.0,
                   delta_pitch_scale=10.0, left_context=75,
                   right_context=75, delta_window=2, online=False):
    """[T, 3]: pov_scale*pov_feature,
    pitch_scale*weighted-mean-subtracted log pitch,
    delta_pitch_scale*delta — process-pitch-feats defaults. online=True
    truncates the normalization window's right context at the current
    frame (first-pass online semantics, pitch-functions.h:78-86)."""
    t_frames = len(pitch_hz)
    nccf = np.clip(np.asarray(nccf, np.float64), -1.0, 1.0)
    pov_feat = golden_pov_feature(nccf) * pov_scale
    pov = golden_pov(nccf)
    log_pitch = np.array([math.log(max(p, 1.0)) for p in pitch_hz])

    if online:
        right_context = 0
    norm_log = np.zeros(t_frames)
    for i in range(t_frames):
        a, b = max(0, i - left_context), min(t_frames, i + right_context + 1)
        w = 0.0
        wl = 0.0
        for j in range(a, b):
            w += pov[j]
            wl += pov[j] * log_pitch[j]
        norm_log[i] = log_pitch[i] - wl / max(w, 1e-10)

    denom = 2.0 * sum(j * j for j in range(1, delta_window + 1))
    delta = np.zeros(t_frames)
    for i in range(t_frames):
        acc = 0.0
        for j in range(1, delta_window + 1):
            up = log_pitch[min(i + j, t_frames - 1)]
            lo = log_pitch[max(i - j, 0)]
            acc += j * (up - lo)
        delta[i] = acc / denom

    return np.stack(
        [pov_feat, norm_log * pitch_scale, delta * delta_pitch_scale],
        axis=1,
    )

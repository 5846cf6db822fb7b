"""Golden float64 NumPy implementation of the Kaldi feature front-end.

Written as a direct frame-by-frame transcription of the spec
(reference runtime/kaldifeat/csrc) with loops and np.fft — deliberately
structured differently from the vectorized JAX implementation so that the
two act as independent checks on each other.
"""

import math

import numpy as np

EPS = 1.1920928955078125e-07


def window_vec(n, window_type="povey", blackman_coeff=0.42):
    a = 2 * math.pi / (n - 1)
    w = np.zeros(n)
    for i in range(n):
        if window_type == "hanning":
            w[i] = 0.5 - 0.5 * math.cos(a * i)
        elif window_type == "sine":
            w[i] = math.sin(0.5 * a * i)
        elif window_type == "hamming":
            w[i] = 0.54 - 0.46 * math.cos(a * i)
        elif window_type == "povey":
            w[i] = (0.5 - 0.5 * math.cos(a * i)) ** 0.85
        elif window_type == "rectangular":
            w[i] = 1.0
        elif window_type == "blackman":
            w[i] = (
                blackman_coeff
                - 0.5 * math.cos(a * i)
                + (0.5 - blackman_coeff) * math.cos(2 * a * i)
            )
    return w


def pow2ceil(n):
    p = 1
    while p < n:
        p *= 2
    return p


def golden_frames(wave, samp_freq=16000, frame_shift_ms=10.0, frame_length_ms=25.0,
                  snip_edges=True):
    shift = int(samp_freq * 0.001 * frame_shift_ms)
    length = int(samp_freq * 0.001 * frame_length_ms)
    ns = len(wave)
    if snip_edges:
        nf = 0 if ns < length else 1 + (ns - length) // shift
        return np.stack([wave[i * shift : i * shift + length] for i in range(nf)])
    nf = (ns + shift // 2) // shift
    out = np.zeros((nf, length))
    for f in range(nf):
        beg = shift * f + shift // 2 - length // 2
        for j in range(length):
            s = beg + j
            # reflect (symmetric) at the edges, as GetStrided's flip-padding does
            if s < 0:
                s = -s - 1
            if s >= ns:
                s = ns - 1 - (s - ns)
            out[f, j] = wave[s]
    return out


def golden_fbank(wave, num_bins=23, samp_freq=16000, low_freq=20.0, high_freq=0.0,
                 preemph=0.97, remove_dc=True, window_type="povey", use_energy=False,
                 raw_energy=True, energy_floor=0.0, htk_compat=False, use_log_fbank=True,
                 use_power=True, snip_edges=True):
    frames = golden_frames(wave, samp_freq=samp_freq, snip_edges=snip_edges)
    length = frames.shape[1]
    padded = pow2ceil(length)
    win = window_vec(length, window_type)
    nyq = samp_freq / 2
    hi = high_freq if high_freq > 0 else nyq + high_freq
    nfft_bins = padded // 2
    mel = lambda f: 1127.0 * math.log(1 + f / 700.0)
    mlo, mhi = mel(low_freq), mel(hi)
    mdelta = (mhi - mlo) / (num_bins + 1)
    fbw = samp_freq / padded
    bins = np.zeros((num_bins, nfft_bins))
    for b in range(num_bins):
        l, c, r = mlo + b * mdelta, mlo + (b + 1) * mdelta, mlo + (b + 2) * mdelta
        for i in range(nfft_bins):
            m = mel(fbw * i)
            if l < m < r:
                bins[b, i] = (m - l) / (c - l) if m <= c else (r - m) / (r - c)

    feats = []
    for fr in frames:
        x = fr.copy()
        if remove_dc:
            x -= x.mean()
        log_e = math.log(max(np.dot(x, x), EPS))
        if preemph != 0:
            y = x.copy()
            y[1:] = x[1:] - preemph * x[:-1]
            y[0] = x[0] * (1 - preemph)
            x = y
        x = x * win
        if not raw_energy:
            log_e = math.log(max(np.dot(x, x), EPS))
        xp = np.zeros(padded)
        xp[:length] = x
        spec = np.abs(np.fft.rfft(xp))[:-1]
        if use_power:
            spec = spec**2
        me = bins @ spec
        if use_log_fbank:
            me = np.log(np.maximum(me, EPS))
        if use_energy:
            if energy_floor > 0:
                log_e = max(log_e, math.log(energy_floor))
            me = np.concatenate([me, [log_e]] if htk_compat else [[log_e], me])
        feats.append(me)
    return np.stack(feats)


def golden_mfcc(wave, num_bins=23, num_ceps=13, cepstral_lifter=22.0, use_energy=True,
                raw_energy=True, energy_floor=0.0, samp_freq=16000):
    logmel = golden_fbank(wave, num_bins=num_bins, samp_freq=samp_freq,
                          use_energy=False, use_log_fbank=True, use_power=True)
    # recompute energies for the energy column
    frames = golden_frames(wave, samp_freq=samp_freq)
    length = frames.shape[1]
    win = window_vec(length, "povey")
    n = num_bins
    dct = np.zeros((num_ceps, n))
    dct[0, :] = math.sqrt(1.0 / n)
    for k in range(1, num_ceps):
        for j in range(n):
            dct[k, j] = math.sqrt(2.0 / n) * math.cos(math.pi / n * k * (j + 0.5))
    lift = np.array(
        [1.0 + 0.5 * cepstral_lifter * math.sin(math.pi * i / cepstral_lifter)
         for i in range(num_ceps)]
    )
    out = logmel @ dct.T
    if cepstral_lifter != 0:
        out = out * lift
    if use_energy:
        for t, fr in enumerate(frames):
            x = fr - fr.mean()
            if raw_energy:
                log_e = math.log(max(np.dot(x, x), EPS))
            else:
                y = x.copy()
                y[1:] = x[1:] - 0.97 * x[:-1]
                y[0] = x[0] * (1 - 0.97)
                y = y * win
                log_e = math.log(max(np.dot(y, y), EPS))
            if energy_floor > 0:
                log_e = max(log_e, math.log(energy_floor))
            out[t, 0] = log_e
    return out


def golden_vad(log_energy, threshold=5.5, mean_scale=0.5, context=0, proportion=0.6):
    t_len = len(log_energy)
    thr = threshold + (mean_scale * np.sum(log_energy) / t_len if mean_scale != 0 else 0.0)
    out = np.zeros(t_len)
    for t in range(t_len):
        num = den = 0
        for t2 in range(t - context, t + context + 1):
            if 0 <= t2 < t_len:
                den += 1
                if log_energy[t2] > thr:
                    num += 1
        out[t] = 1.0 if num >= den * proportion else 0.0
    return out


def golden_plp(wave, num_bins=23, lpc_order=12, num_ceps=13, compress=0.33333,
               cepstral_lifter=22.0, cepstral_scale=1.0, use_energy=True,
               samp_freq=16000, low_freq=20.0, high_freq=0.0):
    """Loop-based PLP transcription of kaldifeat feature-plp.cc:80-175."""
    linmel = golden_fbank(wave, num_bins=num_bins, samp_freq=samp_freq,
                          low_freq=low_freq, high_freq=high_freq,
                          use_energy=False, use_log_fbank=False, use_power=True)
    # equal loudness from mel center freqs
    nyq = samp_freq / 2
    hi = high_freq if high_freq > 0 else nyq + high_freq
    mel = lambda f: 1127.0 * math.log(1 + f / 700.0)
    imel = lambda m: 700.0 * (math.exp(m / 1127.0) - 1.0)
    mlo, mhi = mel(low_freq), mel(hi)
    mdelta = (mhi - mlo) / (num_bins + 1)
    eql = np.zeros(num_bins)
    for b in range(num_bins):
        f0 = imel(mlo + (b + 1) * mdelta)
        fsq = f0 * f0
        fsub = fsq / (fsq + 1.6e5)
        eql[b] = fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6))
    # idft bases [lpc_order+1, num_bins+2]
    dim = num_bins + 2
    angle = math.pi / (dim - 1)
    scale = 1.0 / (2 * (dim - 1))
    idft = np.zeros((lpc_order + 1, dim))
    for i in range(lpc_order + 1):
        idft[i, 0] = scale
        for j in range(1, dim - 1):
            idft[i, j] = 2 * scale * math.cos(angle * i * j)
        idft[i, dim - 1] = scale * math.cos(angle * i * (dim - 1))
    lift = np.array(
        [1.0 + 0.5 * cepstral_lifter * math.sin(math.pi * i / cepstral_lifter)
         for i in range(num_ceps)]
    )
    frames = golden_frames(wave, samp_freq=samp_freq)
    out = []
    for t in range(linmel.shape[0]):
        me = np.maximum(linmel[t], EPS) ** 0  # placeholder keeps flow clear
        me = linmel[t] * eql
        me = np.maximum(me, EPS) ** compress
        dup = np.concatenate([[me[0]], me, [me[-1]]])
        ac = idft @ dup
        # Durbin
        lp = np.zeros(lpc_order)
        e = ac[0]
        for i in range(lpc_order):
            ki = ac[i + 1]
            for j in range(i):
                ki += lp[j] * ac[i - j]
            ki /= e
            c = max(1 - ki * ki, 1e-5)
            e *= c
            tmp = np.zeros(lpc_order)
            tmp[i] = -ki
            for j in range(i):
                tmp[j] = lp[j] - ki * lp[i - j - 1]
            lp[: i + 1] = tmp[: i + 1]
        c0 = math.log(max(e, EPS))
        cep = np.zeros(lpc_order)
        for i in range(lpc_order):
            s = 0.0
            for j in range(i):
                s += (i - j) * lp[j] * cep[i - j - 1]
            cep[i] = -lp[i] - s / (i + 1)
        feat = np.concatenate([[c0], cep[: num_ceps - 1]])
        feat = feat * lift * cepstral_scale
        out.append(feat)
    out = np.stack(out)
    if use_energy:
        for t, fr in enumerate(frames):
            x = fr - fr.mean()
            out[t, 0] = math.log(max(np.dot(x, x), EPS))
    return out

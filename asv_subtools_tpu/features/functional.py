"""Kaldi-compatible feature extraction as pure, jittable JAX functions.

TPU-first design notes
----------------------
* Everything is static-shape: the frame count is a pure function of the
  (static) waveform length, so a jitted extractor compiles once per bucket.
* The spectrum can be computed either with `jnp.fft.rfft` or as two real
  GEMMs against precomputed DFT cosine/sine matrices ("gemm" mode). On TPU
  the GEMM path runs on the MXU and fuses with the mel projection, which is
  the MelT/NDFT trick — for 512-point frames it is far faster than the
  generic FFT lowering.
* All per-config constants (window, mel filterbank, DFT, DCT, lifter) are
  precomputed in float64 NumPy at trace time and closed over as f32 device
  constants.

Semantics parity: reference runtime/kaldifeat/csrc/{feature-window.cc,
mel-computations.cc, feature-fbank.cc, feature-mfcc.cc,
feature-spectrogram.cc}; energy VAD parity:
runtime/extractor/torch_asv_extractor.cc:14-62.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    EPSILON,
    FbankOptions,
    FrameOptions,
    MelOptions,
    MfccOptions,
    PlpOptions,
    SpectrogramOptions,
    VadOptions,
    inverse_mel_scale,
    mel_scale,
)

# ---------------------------------------------------------------------------
# Precomputed constants (host-side, float64 -> float32)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def feature_window(opts: FrameOptions) -> np.ndarray:
    """Window function vector, shape [window_size] float32."""
    n = opts.window_size
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    wt = opts.window_type
    if wt == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif wt == "sine":
        w = np.sin(0.5 * a * i)
    elif wt == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif wt == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif wt == "rectangular":
        w = np.ones_like(i)
    elif wt == "blackman":
        w = (
            opts.blackman_coeff
            - 0.5 * np.cos(a * i)
            + (0.5 - opts.blackman_coeff) * np.cos(2 * a * i)
        )
    else:
        raise ValueError(f"Invalid window type {wt!r}")
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def mel_banks(
    mel_opts: MelOptions, frame_opts: FrameOptions, vtln_warp: float = 1.0
) -> np.ndarray:
    """Mel filterbank matrix, shape [num_fft_bins, num_bins] float32.

    num_fft_bins = padded_window_size // 2 (the highest rfft bin is dropped,
    matching the reference fbank/mfcc path).
    """
    num_bins = mel_opts.num_bins
    if num_bins < 3:
        raise ValueError("Must have at least 3 mel bins")
    padded = frame_opts.padded_window_size
    if padded % 2 != 0:
        raise ValueError("padded window size must be even")
    num_fft_bins = padded // 2
    nyquist = 0.5 * frame_opts.samp_freq

    low_freq = mel_opts.low_freq
    high_freq = mel_opts.high_freq if mel_opts.high_freq > 0 else nyquist + mel_opts.high_freq
    if not (0 <= low_freq < nyquist and 0 < high_freq <= nyquist and low_freq < high_freq):
        raise ValueError(f"Bad low/high freq {low_freq}/{high_freq} vs nyquist {nyquist}")

    fft_bin_width = frame_opts.samp_freq / padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    vtln_low = mel_opts.vtln_low
    vtln_high = mel_opts.vtln_high
    if vtln_high < 0:
        vtln_high += nyquist

    def warp_mel(mel):
        if vtln_warp == 1.0:
            return mel
        return _vtln_warp_mel(vtln_low, vtln_high, low_freq, high_freq, vtln_warp, mel)

    bins = np.zeros((num_bins, num_fft_bins), dtype=np.float64)
    fft_mels = np.array([mel_scale(fft_bin_width * i) for i in range(num_fft_bins)])
    for b in range(num_bins):
        left = warp_mel(mel_low + b * mel_delta)
        center = warp_mel(mel_low + (b + 1) * mel_delta)
        right = warp_mel(mel_low + (b + 2) * mel_delta)
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        w = np.where(fft_mels <= center, up, down)
        w = np.where((fft_mels > left) & (fft_mels < right), w, 0.0)
        if not np.any(w > 0):
            raise ValueError("num_mel_bins too large for this window size")
        bins[b] = w
    return bins.T.astype(np.float32)


def _vtln_warp_freq(vtln_low_cutoff, vtln_high_cutoff, low_freq, high_freq, warp, freq):
    if freq < low_freq or freq > high_freq:
        return freq
    l = vtln_low_cutoff * max(1.0, warp)
    h = vtln_high_cutoff * min(1.0, warp)
    scale = 1.0 / warp
    fl, fh = scale * l, scale * h
    scale_left = (fl - low_freq) / (l - low_freq)
    scale_right = (high_freq - fh) / (high_freq - h)
    if freq < l:
        return low_freq + scale_left * (freq - low_freq)
    if freq < h:
        return scale * freq
    return high_freq + scale_right * (freq - high_freq)


def _vtln_warp_mel(vtln_low, vtln_high, low_freq, high_freq, warp, mel):
    return mel_scale(
        _vtln_warp_freq(vtln_low, vtln_high, low_freq, high_freq, warp, inverse_mel_scale(mel))
    )


@functools.lru_cache(maxsize=None)
def dct_matrix(num_rows: int, num_cols: int) -> np.ndarray:
    """Orthonormal DCT-II matrix rows 0..num_rows-1, shape [num_cols, num_rows].

    Returned transposed (ready for `mel @ dct`), matching the reference layout.
    """
    n = num_cols
    m = np.zeros((num_rows, n), dtype=np.float64)
    m[0, :] = math.sqrt(1.0 / n)
    for k in range(1, num_rows):
        m[k, :] = math.sqrt(2.0 / n) * np.cos(math.pi / n * k * (np.arange(n) + 0.5))
    return m.T.astype(np.float32)


@functools.lru_cache(maxsize=None)
def lifter_coeffs(q: float, num_ceps: int) -> np.ndarray:
    i = np.arange(num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def dft_matrices(padded_window_size: int, num_bins_keep: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cosine/sine matrices for the GEMM spectrum path.

    Returns (C, S) with shape [padded_window_size, num_bins_keep] such that
    power[k] = (x @ C)[k]^2 + (x @ S)[k]^2 equals |rfft(x)[k]|^2.
    """
    n = padded_window_size
    k = np.arange(num_bins_keep)[None, :]
    t = np.arange(n)[:, None]
    ang = 2.0 * math.pi * t * k / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + windowing
# ---------------------------------------------------------------------------


def _backend(x):
    """numpy for numpy inputs, jnp for jax arrays/tracers.

    Host data-pipeline stages (and forked loader workers, which must never
    touch the JAX runtime) pass np.ndarray waveforms and get pure-numpy
    compute; jitted/device paths are unchanged. One implementation, two
    backends — the ops used are API-identical."""
    return np if isinstance(x, np.ndarray) else jnp


def frame_signal(wave: jax.Array, opts: FrameOptions) -> jax.Array:
    """Slice a waveform [num_samples] into frames [num_frames, window_size].

    Static-shape: num_frames is computed from the static length of `wave`.
    """
    xp = _backend(wave)
    num_samples = wave.shape[-1]
    shift, length = opts.window_shift, opts.window_size
    num_frames = opts.num_frames(num_samples)
    if num_frames <= 0:
        raise ValueError(f"waveform too short: {num_samples} samples")
    if not opts.snip_edges:
        num_new = (num_frames - 1) * shift + length
        num_pad = num_new - num_samples
        left = (length - shift) // 2
        right = num_pad - left
        wave = xp.concatenate(
            [wave[..., :left][..., ::-1], wave, wave[..., num_samples - right:][..., ::-1]],
            axis=-1,
        )
    idx = np.arange(num_frames)[:, None] * shift + np.arange(length)[None, :]
    return wave[..., idx]


def _process_window(
    frames: jax.Array,
    opts: FrameOptions,
    *,
    rng: Optional[jax.Array] = None,
    need_raw_energy: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Dither / DC-remove / raw-energy / preemphasis / window / pad.

    frames: [..., num_frames, window_size] float32 (Kaldi int16 sample scale).
    Returns (padded_frames [..., num_frames, padded_window_size], raw_log_energy).
    """
    xp = _backend(frames)
    frames = frames.astype(np.float32)
    if opts.dither != 0.0 and rng is not None:
        if xp is np:
            # host path: rng is an np.random.Generator
            frames = frames + (opts.dither * rng.normal(size=frames.shape)).astype(np.float32)
        else:
            frames = frames + opts.dither * jax.random.normal(rng, frames.shape, frames.dtype)
    if opts.remove_dc_offset:
        frames = frames - xp.mean(frames, axis=-1, keepdims=True)
    raw_log_energy = xp.zeros(frames.shape[:-1], np.float32)
    if need_raw_energy:
        raw_log_energy = xp.log(
            xp.maximum(xp.sum(frames * frames, axis=-1), EPSILON)
        )
    if opts.preemph_coeff != 0.0:
        first = frames[..., :1] * (1.0 - opts.preemph_coeff)
        rest = frames[..., 1:] - opts.preemph_coeff * frames[..., :-1]
        frames = xp.concatenate([first, rest], axis=-1)
    frames = frames * xp.asarray(feature_window(opts), dtype=np.float32)
    pad = opts.padded_window_size - opts.window_size
    if pad > 0:
        frames = xp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    return frames, raw_log_energy


def power_spectrum(
    padded_frames: jax.Array, opts: FrameOptions, *, keep_bins: int, fft_mode: str = "rfft"
) -> jax.Array:
    """Power spectrum of windowed frames; keeps the first `keep_bins` rfft bins.

    fft_mode="gemm" computes the DFT as two real matmuls (MXU-friendly);
    "rfft" uses the generic FFT lowering.
    """
    n = opts.padded_window_size
    xp = _backend(padded_frames)
    if fft_mode == "gemm":
        c, s = dft_matrices(n, keep_bins)
        if xp is np:
            re = padded_frames @ c.astype(np.float32)
            im = padded_frames @ s.astype(np.float32)
        else:
            re = jnp.matmul(padded_frames, jnp.asarray(c), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            im = jnp.matmul(padded_frames, jnp.asarray(s), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        return re * re + im * im
    spec = xp.fft.rfft(padded_frames, axis=-1)
    power = spec.real * spec.real + spec.imag * spec.imag
    if xp is np:
        power = power.astype(np.float32)  # np.fft computes in f64
    return power[..., :keep_bins]


# ---------------------------------------------------------------------------
# Feature computers
# ---------------------------------------------------------------------------


def compute_fbank(
    wave: jax.Array,
    opts: FbankOptions = FbankOptions(),
    *,
    rng: Optional[jax.Array] = None,
    fft_mode: str = "rfft",
) -> jax.Array:
    """Log-mel filterbank features. wave [num_samples] -> [num_frames, dim].

    Parity: reference runtime/kaldifeat/csrc/feature-fbank.cc:46-108.
    """
    fo = opts.frame_opts
    xp = _backend(wave)
    frames = frame_signal(wave, fo)
    need_raw = opts.use_energy and opts.raw_energy
    padded, raw_log_energy = _process_window(frames, fo, rng=rng, need_raw_energy=need_raw)
    if opts.use_energy and not opts.raw_energy:
        raw_log_energy = xp.log(xp.maximum(xp.sum(padded * padded, axis=-1), EPSILON))

    keep = fo.padded_window_size // 2  # highest bin dropped
    spectrum = power_spectrum(padded, fo, keep_bins=keep, fft_mode=fft_mode)
    if not opts.use_power:
        spectrum = xp.sqrt(spectrum)
    if xp is np:
        mel = spectrum @ mel_banks(opts.mel_opts, fo).astype(np.float32)
    else:
        mel = jnp.matmul(
            spectrum,
            jnp.asarray(mel_banks(opts.mel_opts, fo)),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if opts.use_log_fbank:
        mel = xp.log(xp.maximum(mel, EPSILON))
    if opts.use_energy:
        if opts.energy_floor > 0.0:
            raw_log_energy = xp.maximum(raw_log_energy, math.log(opts.energy_floor))
        e = raw_log_energy[..., None]
        mel = xp.concatenate([mel, e] if opts.htk_compat else [e, mel], axis=-1)
    return mel


def compute_mfcc(
    wave: jax.Array,
    opts: MfccOptions = MfccOptions(),
    *,
    rng: Optional[jax.Array] = None,
    fft_mode: str = "rfft",
) -> jax.Array:
    """MFCC features. wave [num_samples] -> [num_frames, num_ceps].

    Parity: reference runtime/kaldifeat/csrc/feature-mfcc.cc:75-140.
    """
    fo = opts.frame_opts
    xp = _backend(wave)
    num_bins = opts.mel_opts.num_bins
    if opts.num_ceps > num_bins:
        raise ValueError("num_ceps cannot exceed num_mel_bins")
    frames = frame_signal(wave, fo)
    need_raw = opts.use_energy and opts.raw_energy
    padded, raw_log_energy = _process_window(frames, fo, rng=rng, need_raw_energy=need_raw)
    if opts.use_energy and not opts.raw_energy:
        raw_log_energy = xp.log(xp.maximum(xp.sum(padded * padded, axis=-1), EPSILON))

    keep = fo.padded_window_size // 2
    spectrum = power_spectrum(padded, fo, keep_bins=keep, fft_mode=fft_mode)
    if xp is np:
        mel = spectrum @ mel_banks(opts.mel_opts, fo).astype(np.float32)
        mel = np.log(np.maximum(mel, EPSILON))
        feats = mel @ dct_matrix(opts.num_ceps, num_bins).astype(np.float32)
    else:
        mel = jnp.matmul(
            spectrum,
            jnp.asarray(mel_banks(opts.mel_opts, fo)),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        mel = jnp.log(jnp.maximum(mel, EPSILON))
        feats = jnp.matmul(
            mel,
            jnp.asarray(dct_matrix(opts.num_ceps, num_bins)),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if opts.cepstral_lifter != 0.0:
        feats = feats * xp.asarray(lifter_coeffs(opts.cepstral_lifter, opts.num_ceps), dtype=np.float32)
    if opts.use_energy:
        if opts.energy_floor > 0.0:
            raw_log_energy = xp.maximum(raw_log_energy, math.log(opts.energy_floor))
        if xp is np:
            feats[..., 0] = raw_log_energy
        else:
            feats = feats.at[..., 0].set(raw_log_energy)
    if opts.htk_compat:
        energy = feats[..., :1]
        if opts.use_energy and opts.energy_floor == 0.0:
            pass  # kaldi scales C0 only when !use_energy
        if not opts.use_energy:
            energy = energy * math.sqrt(2.0)
        feats = xp.concatenate([feats[..., 1:], energy], axis=-1)
    return feats


def compute_spectrogram(
    wave: jax.Array,
    opts: SpectrogramOptions = SpectrogramOptions(),
    *,
    rng: Optional[jax.Array] = None,
    fft_mode: str = "rfft",
) -> jax.Array:
    """Log power spectrogram. wave [num_samples] -> [num_frames, n_fft/2+1].

    Parity: reference runtime/kaldifeat/csrc/feature-spectrogram.cc:22-66.
    """
    fo = opts.frame_opts
    xp = _backend(wave)
    frames = frame_signal(wave, fo)
    padded, raw_log_energy = _process_window(frames, fo, rng=rng, need_raw_energy=opts.raw_energy)
    if not opts.raw_energy:
        raw_log_energy = xp.log(xp.maximum(xp.sum(padded * padded, axis=-1), EPSILON))
    keep = fo.padded_window_size // 2 + 1
    spectrum = power_spectrum(padded, fo, keep_bins=keep, fft_mode=fft_mode)
    spectrum = xp.log(xp.maximum(spectrum, EPSILON))
    if opts.energy_floor > 0.0:
        raw_log_energy = xp.maximum(raw_log_energy, math.log(opts.energy_floor))
    if xp is np:
        spectrum[..., 0] = raw_log_energy
        return spectrum
    return spectrum.at[..., 0].set(raw_log_energy)


@functools.lru_cache(maxsize=None)
def mel_center_freqs(
    mel_opts: MelOptions, frame_opts: FrameOptions, vtln_warp: float = 1.0
) -> np.ndarray:
    """Center frequency (Hz) of each mel bin (for equal-loudness weights)."""
    num_bins = mel_opts.num_bins
    nyquist = 0.5 * frame_opts.samp_freq
    low_freq = mel_opts.low_freq
    high_freq = mel_opts.high_freq if mel_opts.high_freq > 0 else nyquist + mel_opts.high_freq
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    vtln_low = mel_opts.vtln_low
    vtln_high = mel_opts.vtln_high
    if vtln_high < 0:
        vtln_high += nyquist
    centers = []
    for b in range(num_bins):
        center = mel_low + (b + 1) * mel_delta
        if vtln_warp != 1.0:
            center = _vtln_warp_mel(
                vtln_low, vtln_high, low_freq, high_freq, vtln_warp, center
            )
        centers.append(inverse_mel_scale(center))
    return np.asarray(centers, np.float32)


@functools.lru_cache(maxsize=None)
def equal_loudness_coeffs(
    mel_opts: MelOptions, frame_opts: FrameOptions, vtln_warp: float = 1.0
) -> np.ndarray:
    """Equal-loudness weighting per mel bin.

    Parity: GetEqualLoudnessVector (reference
    runtime/kaldifeat/csrc/mel-computations.cc:214-227).
    """
    f0 = mel_center_freqs(mel_opts, frame_opts, vtln_warp).astype(np.float64)
    fsq = f0 * f0
    fsub = fsq / (fsq + 1.6e5)
    return (fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def idft_bases(n_bases: int, dimension: int) -> np.ndarray:
    """IDFT basis matrix [dimension, n_bases] (ready for `mel @ idft`).

    Parity: InitIdftBases (reference
    runtime/kaldifeat/csrc/feature-functions.cc:13-30).
    """
    angle = math.pi / (dimension - 1)
    scale = 1.0 / (2 * (dimension - 1))
    out = np.zeros((n_bases, dimension), np.float64)
    for i in range(n_bases):
        out[i, 0] = scale
        for j in range(1, dimension):
            out[i, j] = 2 * scale * math.cos(angle * i * j)
        out[i, dimension - 1] = scale * math.cos(angle * i * (dimension - 1))
    return out.T.astype(np.float32)


def _durbin(autocorr: jax.Array, order: int) -> tuple[jax.Array, jax.Array]:
    """Levinson-Durbin, vectorized over leading dims.

    autocorr [..., order+1] -> (lpc [..., order], residual energy E [...]).
    Parity: Durbin (reference mel-computations.cc:235-277). The recursion
    over `order` (static, ~12) unrolls; each step is a vectorized update.
    """
    e = autocorr[..., 0]
    lp = [jnp.zeros_like(e) for _ in range(order)]
    for i in range(order):
        ki = autocorr[..., i + 1]
        for j in range(i):
            ki = ki + lp[j] * autocorr[..., i - j]
        ki = ki / e
        c = jnp.maximum(1.0 - ki * ki, 1.0e-5)
        e = e * c
        new_lp = [lp[j] - ki * lp[i - j - 1] for j in range(i)]
        new_lp.append(-ki)
        for j in range(i + 1):
            lp[j] = new_lp[j]
    return jnp.stack(lp, axis=-1), e


def _lpc_to_cepstrum(lpc: jax.Array) -> jax.Array:
    """LPC -> cepstrum (parity: Lpc2CepstrumInternal mel-computations.cc:313)."""
    order = lpc.shape[-1]
    ceps = []
    for i in range(order):
        s = jnp.zeros_like(lpc[..., 0])
        for j in range(i):
            s = s + (i - j) * lpc[..., j] * ceps[i - j - 1]
        ceps.append(-lpc[..., i] - s / (i + 1))
    return jnp.stack(ceps, axis=-1)


def compute_plp(
    wave: jax.Array,
    opts: PlpOptions = PlpOptions(),
    *,
    rng: Optional[jax.Array] = None,
    fft_mode: str = "rfft",
    vtln_warp: float = 1.0,
) -> jax.Array:
    """PLP features. wave [num_samples] -> [num_frames, num_ceps].

    Parity: reference runtime/kaldifeat/csrc/feature-plp.cc:80-175:
    mel energies -> equal loudness -> power compression -> IDFT to
    autocorrelation -> Durbin LPC -> cepstrum -> lifter/scale.
    """
    fo = opts.frame_opts
    frames = frame_signal(wave, fo)
    need_raw = opts.use_energy and opts.raw_energy
    padded, raw_log_energy = _process_window(frames, fo, rng=rng, need_raw_energy=need_raw)
    if opts.use_energy and not opts.raw_energy:
        raw_log_energy = jnp.log(jnp.maximum(jnp.sum(padded * padded, axis=-1), EPSILON))

    keep = fo.padded_window_size // 2
    spectrum = power_spectrum(padded, fo, keep_bins=keep, fft_mode=fft_mode)
    mel = jnp.matmul(
        spectrum,
        jnp.asarray(mel_banks(opts.mel_opts, fo, vtln_warp)),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mel = mel * jnp.asarray(equal_loudness_coeffs(opts.mel_opts, fo, vtln_warp))
    mel = jnp.maximum(mel, EPSILON) ** opts.compress_factor
    dup = jnp.concatenate([mel[..., :1], mel, mel[..., -1:]], axis=-1)
    autocorr = jnp.matmul(
        dup,
        jnp.asarray(idft_bases(opts.lpc_order + 1, opts.mel_opts.num_bins + 2)),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    lpc, resid = _durbin(autocorr, opts.lpc_order)
    c0 = jnp.log(jnp.maximum(resid, EPSILON))
    ceps = _lpc_to_cepstrum(lpc)
    feats = jnp.concatenate([c0[..., None], ceps[..., : opts.num_ceps - 1]], axis=-1)
    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(lifter_coeffs(opts.cepstral_lifter, opts.num_ceps))
    if opts.cepstral_scale != 1.0:
        feats = feats * opts.cepstral_scale
    if opts.use_energy:
        if opts.energy_floor > 0.0:
            raw_log_energy = jnp.maximum(raw_log_energy, math.log(opts.energy_floor))
        feats = feats.at[..., 0].set(raw_log_energy)
    if opts.htk_compat:
        energy = feats[..., :1]
        feats = jnp.concatenate([feats[..., 1:], energy], axis=-1)
    return feats


# ---------------------------------------------------------------------------
# Energy VAD
# ---------------------------------------------------------------------------


def compute_vad_energy(
    log_energy: jax.Array, opts: VadOptions = VadOptions(), mask: Optional[jax.Array] = None
) -> jax.Array:
    """Frame-level energy VAD -> float {0,1} per frame.

    log_energy: [..., T] — column 0 of MFCC-with-energy feats, or raw frame
    log-energies. `mask` marks valid frames in padded batches (True=valid).

    Parity: reference runtime/extractor/torch_asv_extractor.cc:14-62 (itself a
    port of Kaldi compute-vad), extended with padding-mask support.
    """
    t_axis = log_energy.shape[-1]
    if mask is None:
        valid = jnp.ones_like(log_energy, dtype=bool)
        count = jnp.asarray(float(t_axis))
    else:
        valid = mask.astype(bool)
        count = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True).astype(jnp.float32), 1.0)
    e = jnp.where(valid, log_energy, 0.0)
    threshold = opts.energy_threshold
    if opts.energy_mean_scale != 0.0:
        mean = jnp.sum(e, axis=-1, keepdims=True) / count
        threshold = threshold + opts.energy_mean_scale * mean
    above = jnp.where(valid, (log_energy > threshold).astype(jnp.float32), 0.0)
    ctx = opts.frames_context
    if ctx == 0:
        return above * valid.astype(jnp.float32)
    # windowed vote: num_count >= den_count * proportion
    kernel = np.ones(2 * ctx + 1, dtype=np.float32)
    num = _correlate_last(above, kernel)
    den = _correlate_last(valid.astype(jnp.float32), kernel)
    voiced = (num >= den * opts.proportion_threshold).astype(jnp.float32)
    return voiced * valid.astype(jnp.float32)


def _correlate_last(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """'same' correlation along the last axis with a small static kernel."""
    k = kernel.shape[0]
    pad = k // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    out = jnp.zeros_like(x)
    for i in range(k):
        out = out + kernel[i] * jax.lax.slice_in_dim(xp, i, i + x.shape[-1], axis=-1)
    return out


# ---------------------------------------------------------------------------
# CMVN
# ---------------------------------------------------------------------------


def cmvn_utterance(
    feats: jax.Array,
    *,
    norm_means: bool = True,
    norm_vars: bool = False,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-10,
) -> jax.Array:
    """Per-utterance cepstral mean (and optional variance) normalization.

    feats [..., T, D]; mask [..., T] True for valid frames. Equivalent of the
    reference InputSequenceNormalization (pytorch/libs/nnet/components.py:751).
    """
    xp = _backend(feats)
    if mask is None:
        mean = xp.mean(feats, axis=-2, keepdims=True)
        if norm_vars:
            var = xp.var(feats, axis=-2, keepdims=True)
    else:
        m = mask.astype(feats.dtype)[..., None]
        count = xp.maximum(xp.sum(m, axis=-2, keepdims=True), 1.0)
        mean = xp.sum(feats * m, axis=-2, keepdims=True) / count
        if norm_vars:
            var = xp.sum((feats - mean) ** 2 * m, axis=-2, keepdims=True) / count
    out = feats
    if norm_means:
        out = out - mean
    if norm_vars:
        out = out / xp.sqrt(var + eps)
    return out


def cmvn_sliding(
    feats: jax.Array, *, window: int = 300, norm_vars: bool = False, eps: float = 1e-10
) -> jax.Array:
    """Sliding-window CMVN (Kaldi apply-cmvn-sliding semantics, center=true).

    For each frame t, normalize by stats of frames in a centered window of
    length `window`, clipped to the utterance (window shrinks near edges only
    in the sense of Kaldi center=true: the window is shifted to stay inside
    when possible).
    """
    t_len = feats.shape[-2]
    if t_len <= window:
        return cmvn_utterance(feats, norm_vars=norm_vars, eps=eps)
    # cumulative sums for O(T) windowed stats
    cs = jnp.cumsum(feats, axis=-2)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1, :]), cs], axis=-2)
    cs2 = jnp.cumsum(feats * feats, axis=-2)
    cs2 = jnp.concatenate([jnp.zeros_like(cs2[..., :1, :]), cs2], axis=-2)
    t = jnp.arange(t_len)
    # Kaldi center=true: window centered at t, shifted to fit inside [0, T)
    start = jnp.clip(t - window // 2, 0, t_len - window)
    end = start + window
    n = float(window)
    sum_w = jnp.take_along_axis(cs, end[..., None], axis=-2) - jnp.take_along_axis(
        cs, start[..., None], axis=-2
    )
    mean = sum_w / n
    out = feats - mean
    if norm_vars:
        sum2 = jnp.take_along_axis(cs2, end[..., None], axis=-2) - jnp.take_along_axis(
            cs2, start[..., None], axis=-2
        )
        var = sum2 / n - mean * mean
        out = out / jnp.sqrt(jnp.maximum(var, eps))
    return out


def select_voiced_frames(feats: jax.Array, voiced: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stable-partition voiced frames to the front; returns (feats, new_mask).

    XLA-friendly replacement for Kaldi select-voiced-frames: instead of a
    dynamic-shape gather, reorder frames so voiced ones are a prefix and
    return a mask with the voiced count — downstream masked ops use the mask.
    """
    t_len = feats.shape[-2]
    order = jnp.argsort(
        jnp.where(voiced > 0.5, 0, 1) * t_len + jnp.arange(t_len), axis=-1
    )
    gathered = jnp.take_along_axis(feats, order[..., None], axis=-2)
    count = jnp.sum(voiced > 0.5, axis=-1, keepdims=True)
    new_mask = jnp.arange(t_len) < count
    return gathered, new_mask

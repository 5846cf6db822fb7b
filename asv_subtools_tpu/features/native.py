"""Optional native (C++) host feature backend via ctypes.

The host egs pipeline's feature stage is the measured bottleneck of
feature-mode training at scale (tools/egs_bench.py, PERF.md: the numpy
chain feeds ~0.19x of the chip's demand on the 4-core dev host). The
dependency-free C++ frontend (runtime/frontend/feature.cc, golden-matched
to the JAX/numpy implementations in tests/test_runtime_parity.py) computes
the same fbank/MFCC ~2.9x faster per core (measured r4: 94 -> 33 ms per
10 s utterance), cutting the cores needed to keep a chip fed by the same
factor.

Opt-in (`data.feat_backend: native` through the Launcher, or
`compute_feats(..., backend="native")`): the numpy backend stays the
default because the two agree at 2e-3 (different FFT/accumulation
order), not bit-exactly. Falls back to numpy automatically when the
shared library is absent or the options aren't expressible through the
C API (non-default window/dither/preemph).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LIB_TRIED = False
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime", "build", "libasvtpu_capi.so",
)


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.asvtpu_fbank.restype = ctypes.c_int
            lib.asvtpu_mfcc.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _frame_opts_supported(fo) -> bool:
    """The C API exposes num_bins/samp_freq and fixes the rest at the
    Kaldi defaults — only default-config frame options can route native."""
    return (
        abs(fo.dither) < 1e-12
        and abs(fo.preemph_coeff - 0.97) < 1e-9
        and fo.window_type == "povey"
        and fo.remove_dc_offset
        and fo.round_to_power_of_two
        and fo.snip_edges
        and abs(fo.frame_shift_ms - 10.0) < 1e-9
        and abs(fo.frame_length_ms - 25.0) < 1e-9
    )


def _mel_opts_supported(mo) -> bool:
    """The C API forwards only num_bins; low/high freq must be at the
    C++ defaults or the native output would silently differ."""
    return (
        abs(mo.low_freq - 20.0) < 1e-9
        and abs(mo.high_freq - 0.0) < 1e-9
    )


def native_fbank(wave: np.ndarray, opts) -> Optional[np.ndarray]:
    """[S] float32 -> [T, num_bins] via the C++ frontend, or None when the
    lib/options can't serve the request (caller falls back to numpy)."""
    lib = _lib()
    if lib is None:
        return None
    if (opts.use_energy or not _frame_opts_supported(opts.frame_opts)
            or not _mel_opts_supported(opts.mel_opts)):
        return None
    w = np.ascontiguousarray(np.asarray(wave, np.float32))
    nb = int(opts.mel_opts.num_bins)
    est_frames = len(w) // int(opts.frame_opts.samp_freq * 0.001 * 10) + 2
    out = np.zeros(est_frames * nb, np.float32)
    nf = lib.asvtpu_fbank(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(w), nb,
        ctypes.c_float(opts.frame_opts.samp_freq),
        0, int(opts.use_power), int(opts.use_log_fbank),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
    )
    if nf < 0:
        return None
    return out[: nf * nb].reshape(nf, nb).copy()


def native_mfcc(wave: np.ndarray, opts) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    if (not _frame_opts_supported(opts.frame_opts)
            or not _mel_opts_supported(opts.mel_opts)
            or abs(getattr(opts, "cepstral_lifter", 22.0) - 22.0) > 1e-9
            or getattr(opts, "energy_floor", 0.0) != 0.0):
        return None
    w = np.ascontiguousarray(np.asarray(wave, np.float32))
    nb, nc = int(opts.mel_opts.num_bins), int(opts.num_ceps)
    est_frames = len(w) // int(opts.frame_opts.samp_freq * 0.001 * 10) + 2
    out = np.zeros(est_frames * nc, np.float32)
    nf = lib.asvtpu_mfcc(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(w), nb, nc,
        ctypes.c_float(opts.frame_opts.samp_freq), int(opts.use_energy),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
    )
    if nf < 0:
        return None
    return out[: nf * nc].reshape(nf, nc).copy()

"""C++ runtime <-> JAX front-end parity via the ctypes C API.

Builds runtime/ with cmake+ninja if the shared library is missing, then
checks that the native fbank/MFCC/VAD agree with the JAX implementations —
the two front-ends must be interchangeable (SURVEY.md §7 bit-parity goal).
"""

import ctypes
import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNTIME = os.path.join(REPO, "runtime")
LIB = os.path.join(RUNTIME, "build", "libasvtpu_capi.so")


@pytest.fixture(scope="module")
def capi():
    if not os.path.exists(LIB):
        try:
            subprocess.run(
                ["cmake", "-B", "build", "-G", "Ninja"], cwd=RUNTIME, check=True,
                capture_output=True,
            )
            subprocess.run(
                ["ninja", "-C", "build", "asvtpu_capi"], cwd=RUNTIME, check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build native runtime: {e}")
    lib = ctypes.CDLL(LIB)
    lib.asvtpu_fbank.restype = ctypes.c_int
    lib.asvtpu_mfcc.restype = ctypes.c_int
    lib.asvtpu_vad.restype = ctypes.c_int
    lib.asvtpu_read_wav.restype = ctypes.c_int
    lib.asvtpu_spectrogram.restype = ctypes.c_int
    lib.asvtpu_plp.restype = ctypes.c_int
    lib.asvtpu_pitch.restype = ctypes.c_int
    lib.asvtpu_fbank_pitch.restype = ctypes.c_int
    return lib


def _f32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class TestParity:
    def test_fbank_matches_jax(self, capi):
        from asv_subtools_tpu.features import FbankOptions, MelOptions, compute_fbank

        rng = np.random.default_rng(0)
        wave = (rng.normal(size=8000) * 1000).astype(np.float32)
        num_bins = 40
        out = np.zeros(100 * num_bins, np.float32)
        nf = capi.asvtpu_fbank(
            _f32p(wave), len(wave), num_bins, ctypes.c_float(16000.0),
            0, 1, 1, _f32p(out), len(out),
        )
        assert nf > 0
        native = out[: nf * num_bins].reshape(nf, num_bins)
        opts = FbankOptions(mel_opts=MelOptions(num_bins=num_bins))
        ours = np.asarray(compute_fbank(jnp.asarray(wave), opts))
        assert ours.shape == native.shape
        np.testing.assert_allclose(native, ours, rtol=1e-3, atol=1e-3)

    def test_mfcc_matches_jax(self, capi):
        from asv_subtools_tpu.features import MfccOptions, MelOptions, compute_mfcc

        rng = np.random.default_rng(1)
        wave = (rng.normal(size=8000) * 1000).astype(np.float32)
        out = np.zeros(100 * 13, np.float32)
        nf = capi.asvtpu_mfcc(
            _f32p(wave), len(wave), 23, 13, ctypes.c_float(16000.0), 1,
            _f32p(out), len(out),
        )
        assert nf > 0
        native = out[: nf * 13].reshape(nf, 13)
        ours = np.asarray(compute_mfcc(jnp.asarray(wave), MfccOptions()))
        np.testing.assert_allclose(native, ours, rtol=2e-3, atol=2e-3)

    def test_spectrogram_matches_jax(self, capi):
        from asv_subtools_tpu.features import SpectrogramOptions
        from asv_subtools_tpu.features.functional import compute_spectrogram

        rng = np.random.default_rng(3)
        wave = (rng.normal(size=8000) * 1000).astype(np.float32)
        dim = 257  # 400-sample window padded to 512 -> 257 bins
        out = np.zeros(100 * dim, np.float32)
        nf = capi.asvtpu_spectrogram(
            _f32p(wave), len(wave), ctypes.c_float(16000.0), 1,
            _f32p(out), len(out),
        )
        assert nf > 0
        native = out[: nf * dim].reshape(nf, dim)
        ours = np.asarray(compute_spectrogram(jnp.asarray(wave), SpectrogramOptions()))
        assert ours.shape == native.shape
        np.testing.assert_allclose(native, ours, rtol=1e-3, atol=1e-3)

    def test_plp_matches_jax(self, capi):
        from asv_subtools_tpu.features import PlpOptions
        from asv_subtools_tpu.features.functional import compute_plp

        rng = np.random.default_rng(4)
        wave = (rng.normal(size=8000) * 1000).astype(np.float32)
        out = np.zeros(100 * 13, np.float32)
        nf = capi.asvtpu_plp(
            _f32p(wave), len(wave), 23, 13, 12, ctypes.c_float(16000.0), 1,
            _f32p(out), len(out),
        )
        assert nf > 0
        native = out[: nf * 13].reshape(nf, 13)
        ours = np.asarray(compute_plp(jnp.asarray(wave), PlpOptions()))
        np.testing.assert_allclose(native, ours, rtol=2e-3, atol=2e-3)

    def test_vad_matches_jax(self, capi):
        from asv_subtools_tpu.features import VadOptions, compute_vad_energy

        rng = np.random.default_rng(2)
        log_e = rng.normal(size=200).astype(np.float32) * 3 + 10
        out = np.zeros(200, np.uint8)
        capi.asvtpu_vad(
            _f32p(log_e), 200, ctypes.c_float(5.5), ctypes.c_float(0.5), 2,
            ctypes.c_float(0.6), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        ours = np.asarray(
            compute_vad_energy(jnp.asarray(log_e), VadOptions(frames_context=2))
        )
        np.testing.assert_array_equal(out, ours.astype(np.uint8))

    def test_pitch_matches_python(self, capi):
        # C++ PitchComputer vs the python implementation (both double
        # internally, same algorithm stage for stage) on a harmonic tone
        # with noise/silence transitions
        from asv_subtools_tpu.features.pitch import (
            PitchOptions, compute_and_process_pitch,
        )

        rng = np.random.default_rng(11)
        sr = 16000
        t = np.arange(sr) / sr
        wave = np.concatenate([
            (sum(np.sin(2 * np.pi * 137.0 * (h + 1) * t[: sr // 2])
                 / (h + 1) for h in range(3)) * 6000),
            rng.normal(size=sr // 2) * 500,
        ]).astype(np.float32)
        ours = compute_and_process_pitch(wave, PitchOptions())
        out = np.zeros(ours.size + 64, np.float32)
        nf = capi.asvtpu_pitch(
            _f32p(wave), len(wave), ctypes.c_float(16000.0),
            _f32p(out), len(out),
        )
        assert nf == ours.shape[0]
        native = out[: nf * 3].reshape(nf, 3)
        np.testing.assert_allclose(native, ours, rtol=1e-4, atol=1e-4)

    def test_fbank_pitch_matches_python(self, capi):
        # the fbank_pitch family end-to-end: [fbank(80) | pitch(3)]
        from asv_subtools_tpu.data import processor as P

        rng = np.random.default_rng(12)
        sr = 16000
        t = np.arange(sr // 2) / sr
        wave = (np.sin(2 * np.pi * 180.0 * t) * 7000 +
                rng.normal(size=len(t)) * 100).astype(np.float32)
        # cmvn=False: the native ComputeFbankPitch emits the raw
        # concatenated matrix; CMVN is the pipeline's separate concern
        stage = P.compute_feats(feat_type="fbank_pitch", cmvn=False)
        py = list(stage(iter([{"key": "u", "wav": wave,
                               "sample_rate": sr}])))[0]["feat"]
        dim = ctypes.c_int(0)
        out = np.zeros(py.size + 256, np.float32)
        nf = capi.asvtpu_fbank_pitch(
            _f32p(wave), len(wave), py.shape[1] - 3,
            ctypes.c_float(16000.0), _f32p(out), len(out),
            ctypes.byref(dim),
        )
        assert dim.value == py.shape[1]
        assert nf == py.shape[0]
        native = out[: nf * dim.value].reshape(nf, dim.value)
        # fbank columns at the established native-vs-jax tolerance,
        # pitch columns at the pitch parity tolerance
        np.testing.assert_allclose(native[:, :-3], py[:, :-3],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(native[:, -3:], py[:, -3:],
                                   rtol=1e-4, atol=1e-4)

    def test_wav_reader_matches_python(self, capi, tmp_path):
        from asv_subtools_tpu.io import read_wav, write_wav

        rng = np.random.default_rng(3)
        wav = (rng.normal(size=16000) * 5000).astype(np.float32)
        p = str(tmp_path / "t.wav")
        write_wav(p, wav, 16000)
        out = np.zeros(20000, np.float32)
        sr = ctypes.c_int(0)
        n = capi.asvtpu_read_wav(p.encode(), _f32p(out), len(out), ctypes.byref(sr))
        assert n == 16000 and sr.value == 16000
        py_wav, _ = read_wav(p)
        np.testing.assert_allclose(out[:n], py_wav, atol=1.0)

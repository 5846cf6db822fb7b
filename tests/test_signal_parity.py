"""Signal-processing parity vs the reference torch implementations
(pytorch/libs/egs/signal_processing.py, speechbrain-derived).

Head-to-head on random audio: de_silence frame selection, amplitude
computation (avg/peak, linear/dB), normalization/rescale, reverberate
(full impulse-response convolution + amplitude re-scale), notch-filter
kernels, and overlap_and_add.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from asv_subtools_tpu.data import signal as S


def _ref():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    try:
        import libs.egs.signal_processing as mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference signal_processing: {e}")
    return mod


def _wav(seed=0, n=16000):
    rng = np.random.default_rng(seed)
    # speech-ish: bursts of tone + silence gaps
    t = np.arange(n) / 16000.0
    sig = 0.3 * np.sin(2 * np.pi * 220 * t)
    env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(np.float64)
    return (sig * env + rng.normal(size=n) * 1e-3).astype(np.float32)


def test_de_silence():
    """Our de_silence keeps int16-scale waveforms (eng >= min_eng); the
    reference normalizes to +-1 and compares > min_eng/2^15 — same
    threshold on the same signal at different scales."""
    m = _ref()
    x = _wav() * 32768.0
    ref_out, ref_len = m.de_silence(
        torch.from_numpy((x / 32768.0).copy())[None, :], sr=16000,
        win_len=0.1, min_eng=50,
    )
    ours = S.de_silence(x, sample_rate=16000, win_len=0.1, min_eng=50.0)
    assert len(ours) == ref_len
    np.testing.assert_allclose(
        np.asarray(ours) / 32768.0, ref_out.numpy()[0], rtol=1e-6, atol=1e-9
    )


@pytest.mark.parametrize("amp_type,scale", [("avg", "linear"),
                                            ("peak", "linear"),
                                            ("avg", "dB")])
def test_compute_amplitude(amp_type, scale):
    m = _ref()
    x = _wav(1)
    ref = m.compute_amplitude(torch.from_numpy(x.copy())[None, :, None],
                              amp_type=amp_type, scale=scale)
    ours = S.compute_amplitude(x, amp_type=amp_type, scale=scale)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_reverberate():
    m = _ref()
    x = _wav(2, n=8000)
    rng = np.random.default_rng(3)
    rir = (rng.normal(size=400) * np.exp(-np.arange(400) / 60.0)).astype(
        np.float32
    )
    rir[0] = 1.0
    ref = m.reverberate(
        torch.from_numpy(x.copy())[None, :], torch.from_numpy(rir.copy())
    )
    ours = S.reverberate(x, rir)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy()[0], rtol=1e-4,
                               atol=1e-6)


def test_notch_filter():
    m = _ref()
    ref = m.notch_filter(0.25, filter_width=101, notch_width=0.05)
    ours = S.notch_filter(0.25, filter_width=101, notch_width=0.05)
    np.testing.assert_allclose(np.asarray(ours).ravel(),
                               ref.numpy().ravel(), rtol=1e-5, atol=1e-7)


def test_overlap_and_add():
    m = _ref()
    rng = np.random.default_rng(4)
    frames = rng.normal(size=(6, 128)).astype(np.float32)
    step = 64
    ref = m.overlap_and_add(torch.from_numpy(frames.copy()), step)
    ours = S.overlap_and_add(frames, step)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5,
                               atol=1e-6)

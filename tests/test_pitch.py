"""Pitch tracker tests on synthetic tones: F0 accuracy, octave stability,
voicing discrimination, fbank frame alignment."""

import numpy as np
import pytest

from asv_subtools_tpu.features.pitch import (
    PitchOptions,
    compute_and_process_pitch,
    compute_kaldi_pitch,
    nccf_to_pov,
)

SR = 16000


def tone(f0, seconds=1.0, sr=SR, harmonics=3):
    t = np.arange(int(sr * seconds)) / sr
    x = sum(np.sin(2 * np.pi * f0 * (h + 1) * t) / (h + 1) for h in range(harmonics))
    return (x * 8000).astype(np.float32)


class TestPitchTracking:
    @pytest.mark.parametrize("f0", [100.0, 150.0, 220.0, 300.0])
    def test_recovers_f0(self, f0):
        raw = compute_kaldi_pitch(tone(f0))
        assert raw.shape[1] == 2
        mid = raw[10:-10, 1]  # skip edges
        med = np.median(mid)
        assert abs(med - f0) / f0 < 0.05, f"f0 {f0}: got {med}"

    def test_octave_stability(self):
        """A steady tone must not octave-jump: pitch variance tiny."""
        raw = compute_kaldi_pitch(tone(120.0, seconds=2.0))
        mid = raw[10:-10, 1]
        assert np.std(mid) / np.mean(mid) < 0.05

    def test_voicing_discrimination(self):
        rng = np.random.default_rng(0)
        voiced = tone(150.0)
        unvoiced = (rng.normal(size=SR) * 3000).astype(np.float32)
        pov_v = nccf_to_pov(compute_kaldi_pitch(voiced)[10:-10, 0]).mean()
        pov_u = nccf_to_pov(compute_kaldi_pitch(unvoiced)[10:-10, 0]).mean()
        assert pov_v > 0.7
        assert pov_u < 0.4
        assert pov_v > pov_u + 0.4

    def test_frame_alignment_with_fbank(self):
        import jax.numpy as jnp

        from asv_subtools_tpu.features import FbankOptions, compute_fbank

        wave = tone(200.0, seconds=0.73)
        fb = np.asarray(compute_fbank(jnp.asarray(wave)))
        pf = compute_and_process_pitch(wave)
        assert pf.shape == (fb.shape[0], 3)
        combined = np.concatenate([fb, pf], axis=1)  # the fbank_pitch layout
        assert combined.shape[1] == fb.shape[1] + 3

    def test_processed_features_shape_and_norm(self):
        pf = compute_and_process_pitch(tone(140.0))
        assert pf.shape[1] == 3
        assert np.all(np.isfinite(pf))
        # normalized log pitch of a steady tone ~ 0 after mean subtraction
        assert abs(np.median(pf[20:-20, 1])) < 0.05

    def test_changing_pitch_tracks(self):
        """Glide 100->200 Hz: tracked pitch must increase monotonically-ish."""
        t = np.arange(SR) / SR
        f_inst = 100.0 + 100.0 * t
        phase = 2 * np.pi * np.cumsum(f_inst) / SR
        wave = (np.sin(phase) * 8000).astype(np.float32)
        raw = compute_kaldi_pitch(wave)
        mid = raw[10:-10, 1]
        assert mid[-1] > mid[0] + 50
        # delta-pitch feature positive on average for a rising glide
        pf = compute_and_process_pitch(wave)
        assert pf[10:-10, 2].mean() > 0

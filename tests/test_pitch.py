"""Pitch tracker tests: golden float64 loop-transcription gates on every
stage (NCCF, Viterbi, POV, post-processing) plus behavioral tests on
synthetic tones (F0 accuracy, octave stability, voicing discrimination,
fbank frame alignment)."""

import numpy as np
import pytest

from asv_subtools_tpu.features.pitch import (
    PitchOptions,
    _candidate_lags,
    _nccf_integer_lags,
    _nccf_to_pov_feature,
    _viterbi_lags,
    compute_and_process_pitch,
    compute_kaldi_pitch,
    lowpass_resample,
    nccf_to_pov,
    process_pitch,
    resample_nccf,
)

from golden_pitch import (
    golden_candidate_lags,
    golden_lowpass_resample,
    golden_nccf,
    golden_pov,
    golden_pov_feature,
    golden_process,
    golden_resample_nccf,
    golden_viterbi,
)

SR = 16000


def speechy_signal(seconds=0.6, sr=4000, seed=0):
    """Voiced tone segments + silence + noise at the NCCF working rate —
    exercises ballast, voicing transitions, and octave ties."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds / 3)) / sr
    seg_v = sum(np.sin(2 * np.pi * 130.0 * (h + 1) * t) / (h + 1) for h in range(3))
    seg_s = np.zeros_like(t)
    seg_n = rng.normal(size=len(t)) * 0.3
    return np.concatenate([seg_v * 0.8, seg_s, seg_n]).astype(np.float64)


class TestGoldenGates:
    def test_candidate_lags_match(self):
        opts = PitchOptions()
        ours = _candidate_lags(opts)
        gold = golden_candidate_lags(opts.min_f0, opts.max_f0, opts.delta_pitch)
        np.testing.assert_allclose(ours, gold, rtol=1e-12)

    def test_nccf_matches_golden(self):
        import math

        opts = PitchOptions()
        wave = speechy_signal()
        lags_sec = _candidate_lags(opts)
        first = int(math.floor(lags_sec[0] * opts.resample_freq))
        last = int(math.ceil(lags_sec[-1] * opts.resample_freq))
        lags = np.arange(first, last + 1)
        ours_b, ours_nb = _nccf_integer_lags(wave, opts, first, last)
        gold_b, gold_nb = golden_nccf(
            wave, lags, opts.resample_freq, opts.frame_shift_ms,
            opts.frame_length_ms, opts.nccf_ballast,
        )
        assert ours_b.shape == gold_b.shape and ours_b.shape[0] > 10
        np.testing.assert_allclose(ours_b, gold_b, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(ours_nb, gold_nb, rtol=1e-9, atol=1e-12)

    def test_lowpass_resample_matches_golden(self):
        opts = PitchOptions()
        rng = np.random.default_rng(7)
        wave = rng.normal(size=1600) * 1000.0
        ours = lowpass_resample(wave, opts.samp_freq, opts.resample_freq,
                                opts.lowpass_cutoff,
                                opts.lowpass_filter_width)
        gold = golden_lowpass_resample(wave, opts.samp_freq,
                                       opts.resample_freq,
                                       opts.lowpass_cutoff,
                                       opts.lowpass_filter_width)
        assert ours.shape == gold.shape
        np.testing.assert_allclose(ours, gold, rtol=1e-9, atol=1e-9)

    def test_lowpass_actually_lowpasses(self):
        """A 1.8 kHz tone (above the 1 kHz cutoff) must be strongly
        attenuated; a 300 Hz tone passes (tiered behavioral check)."""
        t = np.arange(3200) / 16000.0
        lo = np.sin(2 * np.pi * 300.0 * t)
        hi = np.sin(2 * np.pi * 1800.0 * t)
        opts = PitchOptions()
        out_lo = lowpass_resample(lo, 16000, 4000, opts.lowpass_cutoff, 1)
        out_hi = lowpass_resample(hi, 16000, 4000, opts.lowpass_cutoff, 1)
        mid = slice(100, -100)
        assert np.std(out_lo[mid]) > 5 * np.std(out_hi[mid])

    def test_resample_nccf_matches_golden(self):
        import math

        opts = PitchOptions()
        wave = speechy_signal(seed=3)
        lags_sec = _candidate_lags(opts)
        first = int(math.floor(lags_sec[0] * opts.resample_freq))
        last = int(math.ceil(lags_sec[-1] * opts.resample_freq))
        nccf_b, _ = _nccf_integer_lags(wave, opts, first, last)
        ours = resample_nccf(nccf_b, first, lags_sec, opts)
        for t in (0, nccf_b.shape[0] // 2, nccf_b.shape[0] - 1):
            gold = golden_resample_nccf(
                nccf_b[t], first, lags_sec, opts.resample_freq,
                opts.upsample_filter_width,
            )
            np.testing.assert_allclose(ours[t], gold, rtol=1e-9, atol=1e-12)

    def test_viterbi_matches_golden(self):
        import math

        opts = PitchOptions()
        wave = speechy_signal(seed=1)
        lags_sec = _candidate_lags(opts)
        first = int(math.floor(lags_sec[0] * opts.resample_freq))
        last = int(math.ceil(lags_sec[-1] * opts.resample_freq))
        nccf_int, _ = _nccf_integer_lags(wave, opts, first, last)
        nccf_b = resample_nccf(nccf_int, first, lags_sec, opts)
        ours = _viterbi_lags(nccf_b, lags_sec, opts)
        gold = golden_viterbi(
            nccf_b, lags_sec, opts.penalty_factor, opts.soft_min_f0
        )
        np.testing.assert_array_equal(ours, gold)

    def test_pov_functions_match_golden(self):
        nccf = np.linspace(-1.1, 1.0, 97)
        np.testing.assert_allclose(
            _nccf_to_pov_feature(nccf), golden_pov_feature(nccf), rtol=1e-12
        )
        np.testing.assert_allclose(
            nccf_to_pov(nccf), golden_pov(nccf), rtol=1e-12
        )

    def test_process_pitch_matches_golden(self):
        opts = PitchOptions()
        rng = np.random.default_rng(2)
        t = 200
        nccf = np.clip(rng.normal(0.5, 0.3, t), -1.0, 1.0)
        pitch = np.exp(rng.normal(np.log(150.0), 0.2, t))
        raw = np.stack([nccf, pitch], axis=1).astype(np.float64)
        ours = process_pitch(raw, opts)
        gold = golden_process(
            nccf, pitch, opts.pov_scale, opts.pitch_scale,
            opts.delta_pitch_scale, opts.normalization_left_context,
            opts.normalization_right_context, opts.delta_window,
        )
        np.testing.assert_allclose(ours, gold, rtol=1e-5, atol=1e-6)

    def test_online_normalization_matches_golden(self):
        """First-pass online mode: the normalization window truncates at
        the current frame (no right context, pitch-functions.h:78-86) —
        matches the golden online transcription and measurably differs
        from the offline output."""
        import dataclasses as dc

        opts = PitchOptions(simulate_first_pass_online=True)
        rng = np.random.default_rng(3)
        t = 160
        nccf = np.clip(rng.normal(0.5, 0.3, t), -1.0, 1.0)
        pitch = np.exp(rng.normal(np.log(150.0), 0.2, t))
        raw = np.stack([nccf, pitch], axis=1).astype(np.float64)
        ours = process_pitch(raw, opts)
        gold = golden_process(
            nccf, pitch, opts.pov_scale, opts.pitch_scale,
            opts.delta_pitch_scale, opts.normalization_left_context,
            opts.normalization_right_context, opts.delta_window,
            online=True,
        )
        np.testing.assert_allclose(ours, gold, rtol=1e-5, atol=1e-6)
        offline = process_pitch(
            raw, dc.replace(opts, simulate_first_pass_online=False)
        )
        assert np.abs(ours[:, 1] - offline[:, 1]).max() > 1e-3


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

    def test_fbank_pitch_preset_in_pipeline(self):
        """feat_type='fbank_pitch' yields [T, 80+3] features (reference
        makeFeatures.sh fbank_pitch config)."""
        from asv_subtools_tpu.data import processor as P
        from asv_subtools_tpu.features import FbankOptions

        wave = tone(180.0, seconds=0.5)
        stage = P.compute_feats(feat_type="fbank_pitch")
        out = list(stage(iter([{"key": "u1", "wav": wave, "sample_rate": SR}])))
        f = out[0]["feat"]
        assert f.shape[1] == FbankOptions().mel_opts.num_bins + 3
        assert np.all(np.isfinite(f))
        from asv_subtools_tpu.features import MfccOptions

        stage_m = P.compute_feats(feat_type="mfcc_pitch")
        out_m = list(stage_m(iter([{"key": "u1", "wav": wave, "sample_rate": SR}])))
        assert out_m[0]["feat"].shape[1] == MfccOptions().num_ceps + 3

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

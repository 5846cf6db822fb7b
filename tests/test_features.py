"""Feature front-end parity tests: JAX implementation vs float64 golden."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asv_subtools_tpu.features import (
    FbankOptions,
    FrameOptions,
    MelOptions,
    MfccOptions,
    SpectrogramOptions,
    VadOptions,
    cmvn_sliding,
    cmvn_utterance,
    compute_fbank,
    compute_mfcc,
    compute_spectrogram,
    compute_vad_energy,
    frame_signal,
    select_voiced_frames,
)

import golden_features as gold


def make_wave(rng, n=16000 * 2):
    # int16-scale samples like Kaldi expects
    return (rng.standard_normal(n) * 4000).astype(np.float32)


def test_frame_count():
    fo = FrameOptions()
    assert fo.window_shift == 160
    assert fo.window_size == 400
    assert fo.padded_window_size == 512
    assert fo.num_frames(16000) == 98
    assert fo.num_frames(399) == 0
    assert fo.num_frames(400) == 1
    no_snip = FrameOptions(snip_edges=False)
    assert no_snip.num_frames(16000) == 100


def test_frame_signal_matches_golden(rng):
    wave = make_wave(rng, 3 * 160 + 400 + 37)
    got = np.asarray(frame_signal(jnp.asarray(wave), FrameOptions()))
    want = gold.golden_frames(wave.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_frame_signal_no_snip(rng):
    wave = make_wave(rng, 16000)
    got = np.asarray(frame_signal(jnp.asarray(wave), FrameOptions(snip_edges=False)))
    want = gold.golden_frames(wave.astype(np.float64), snip_edges=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("fft_mode", ["gemm", "rfft"])
def test_fbank_matches_golden(rng, fft_mode):
    wave = make_wave(rng)
    opts = FbankOptions(mel_opts=MelOptions(num_bins=40))
    got = np.asarray(compute_fbank(jnp.asarray(wave), opts, fft_mode=fft_mode))
    want = gold.golden_fbank(wave.astype(np.float64), num_bins=40)
    assert got.shape == want.shape == (198, 40)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_fbank_energy_htk(rng):
    wave = make_wave(rng, 8000)
    opts = FbankOptions(use_energy=True, htk_compat=True, energy_floor=1.0)
    got = np.asarray(compute_fbank(jnp.asarray(wave), opts))
    want = gold.golden_fbank(
        wave.astype(np.float64), use_energy=True, htk_compat=True, energy_floor=1.0
    )
    assert got.shape == want.shape == (48, 24)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_fbank_batch_vmap(rng):
    waves = np.stack([make_wave(rng, 16000) for _ in range(4)])
    opts = FbankOptions(mel_opts=MelOptions(num_bins=40))
    batched = jax.vmap(lambda w: compute_fbank(w, opts))(jnp.asarray(waves))
    single = compute_fbank(jnp.asarray(waves[2]), opts)
    np.testing.assert_allclose(np.asarray(batched[2]), np.asarray(single), atol=5e-5)


def test_mfcc_matches_golden(rng):
    wave = make_wave(rng, 16000)
    opts = MfccOptions()
    got = np.asarray(compute_mfcc(jnp.asarray(wave), opts))
    want = gold.golden_mfcc(wave.astype(np.float64))
    assert got.shape == want.shape == (98, 13)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_spectrogram_shape_and_energy(rng):
    wave = make_wave(rng, 8000)
    opts = SpectrogramOptions()
    got = np.asarray(compute_spectrogram(jnp.asarray(wave), opts))
    assert got.shape == (48, 257)
    # column 0 is raw log energy of the DC-removed frame
    frames = gold.golden_frames(wave.astype(np.float64))
    x0 = frames[0] - frames[0].mean()
    np.testing.assert_allclose(got[0, 0], np.log(np.dot(x0, x0)), rtol=1e-4)


def test_vad_matches_golden(rng):
    log_e = rng.standard_normal(200) * 3 + 10
    for ctx in [0, 2]:
        opts = VadOptions(frames_context=ctx)
        got = np.asarray(
            compute_vad_energy(jnp.asarray(log_e, dtype=jnp.float32), opts)
        )
        want = gold.golden_vad(log_e, context=ctx)
        np.testing.assert_array_equal(got, want)


def test_vad_masked(rng):
    log_e = (rng.standard_normal(100) * 3 + 10).astype(np.float32)
    mask = np.arange(100) < 70
    got = np.asarray(
        compute_vad_energy(jnp.asarray(log_e), VadOptions(), mask=jnp.asarray(mask))
    )
    want_valid = gold.golden_vad(log_e[:70].astype(np.float64))
    np.testing.assert_array_equal(got[:70], want_valid)
    assert np.all(got[70:] == 0)


def test_cmvn_utterance(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    out = np.asarray(cmvn_utterance(jnp.asarray(x), norm_means=True, norm_vars=True))
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-3)


def test_cmvn_utterance_masked(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    mask = np.arange(50) < 30
    out = np.asarray(cmvn_utterance(jnp.asarray(x), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out[:30].mean(axis=0), 0, atol=1e-5)


def test_cmvn_sliding(rng):
    x = rng.standard_normal((400, 4)).astype(np.float32)
    out = np.asarray(cmvn_sliding(jnp.asarray(x), window=300))
    # frame 0: window = frames [0, 300)
    np.testing.assert_allclose(out[0], x[0] - x[:300].mean(axis=0), atol=1e-5)
    # middle frame t=200: centered window [50, 350)
    np.testing.assert_allclose(out[200], x[200] - x[50:350].mean(axis=0), atol=1e-5)
    # last frame: window = last 300 frames
    np.testing.assert_allclose(out[-1], x[-1] - x[100:].mean(axis=0), atol=1e-5)


def test_select_voiced_frames(rng):
    feats = rng.standard_normal((10, 4)).astype(np.float32)
    voiced = np.array([1, 0, 1, 1, 0, 0, 1, 0, 0, 1], dtype=np.float32)
    got, mask = select_voiced_frames(jnp.asarray(feats), jnp.asarray(voiced))
    got, mask = np.asarray(got), np.asarray(mask)
    assert mask.sum() == 5
    np.testing.assert_allclose(got[:5], feats[voiced.astype(bool)])


def test_fbank_jit_compiles(rng):
    wave = jnp.asarray(make_wave(rng, 16000))
    opts = FbankOptions(mel_opts=MelOptions(num_bins=80))
    f = jax.jit(lambda w: compute_fbank(w, opts))
    out = f(wave)
    assert out.shape == (98, 80)
    assert np.isfinite(np.asarray(out)).all()


def test_plp_matches_golden(rng):
    from asv_subtools_tpu.features import PlpOptions, compute_plp
    from golden_features import golden_plp

    wave = rng.normal(size=4000).astype(np.float32) * 1000
    opts = PlpOptions()
    ours = np.asarray(compute_plp(jnp.asarray(wave), opts))
    gold = golden_plp(wave)
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, rtol=2e-3, atol=2e-3)


def test_plp_durbin_solves_yule_walker(rng):
    """Durbin output must satisfy the Yule-Walker normal equations."""
    from asv_subtools_tpu.features.functional import _durbin
    from scipy.linalg import toeplitz

    # synthetic AR(4) autocorrelation
    sig = rng.normal(size=8000)
    for i in range(4, len(sig)):
        sig[i] += 0.6 * sig[i - 1] - 0.3 * sig[i - 2] + 0.1 * sig[i - 3]
    order = 6
    ac = np.array([np.dot(sig[: len(sig) - k], sig[k:]) for k in range(order + 1)])
    lpc, e = _durbin(jnp.asarray(ac, jnp.float32)[None, :], order)
    lpc = np.asarray(lpc)[0]
    # Yule-Walker: R @ a = r with prediction s[n] ~= sum a_k s[n-k];
    # Kaldi's Durbin stores the NEGATED prediction coefficients.
    a_ref = np.linalg.solve(toeplitz(ac[:order]), ac[1 : order + 1])
    np.testing.assert_allclose(lpc, -a_ref, rtol=2e-2, atol=2e-2)
    assert float(e[0]) > 0


def test_plp_energy_column(rng):
    from asv_subtools_tpu.features import PlpOptions, compute_plp

    wave = rng.normal(size=4000).astype(np.float32) * 1000
    with_e = np.asarray(compute_plp(jnp.asarray(wave), PlpOptions(use_energy=True)))
    no_e = np.asarray(compute_plp(jnp.asarray(wave), PlpOptions(use_energy=False)))
    assert not np.allclose(with_e[:, 0], no_e[:, 0])
    np.testing.assert_allclose(with_e[:, 1:], no_e[:, 1:], rtol=1e-5)


class TestKaldiConf:
    """options_from_kaldi_conf parses the reference's shipped conf/*.conf
    files unchanged (makeFeatures.sh feature configs)."""

    def test_sre_fbank_81(self):
        from asv_subtools_tpu.features import options_from_kaldi_conf

        o = options_from_kaldi_conf(
            "/root/reference/conf/sre-fbank-81.conf", "fbank"
        )
        assert o.frame_opts.samp_freq == 16000
        assert o.use_energy is True
        assert o.mel_opts.num_bins == 80
        assert o.mel_opts.low_freq == 40
        assert o.mel_opts.high_freq == -200
        assert o.frame_opts.dither == 0
        assert o.dim == 81

    def test_sre_mfcc_23_with_comments(self):
        from asv_subtools_tpu.features import options_from_kaldi_conf

        o = options_from_kaldi_conf(
            "/root/reference/conf/sre-mfcc-23.conf", "mfcc"
        )
        assert o.num_ceps == 23 and o.mel_opts.num_bins == 23
        assert o.mel_opts.high_freq == -200

    def test_vad_conf(self):
        from asv_subtools_tpu.features import options_from_kaldi_conf

        o = options_from_kaldi_conf("/root/reference/conf/vad-5.5.conf", "vad")
        assert o.energy_threshold == 5.5
        assert o.energy_mean_scale == 0.5

    def test_every_shipped_feature_conf_parses(self):
        import glob

        from asv_subtools_tpu.features import options_from_kaldi_conf

        mapping = {"fbank": "fbank", "mfcc": "mfcc", "plp": "plp",
                   "spectrogram": "spectrogram", "pitch": "pitch",
                   "vad": "vad"}
        parsed = 0
        for path in sorted(glob.glob("/root/reference/conf/*.conf")):
            name = path.rsplit("/", 1)[1]
            kind = next((v for k, v in mapping.items() if k in name), None)
            if kind is None:
                continue
            o = options_from_kaldi_conf(path, kind)
            assert o is not None, path
            parsed += 1
        assert parsed >= 8

    def test_unknown_option_raises(self, tmp_path):
        from asv_subtools_tpu.features import options_from_kaldi_conf

        p = tmp_path / "x.conf"
        p.write_text("--no-such-option=3\n")
        with pytest.raises(ValueError):
            options_from_kaldi_conf(str(p), "fbank")


class TestNumpyBackendDispatch:
    """features/functional.py:_backend — np.ndarray input runs pure numpy
    (fork-safe host pipeline workers), jax input runs jnp; both must agree."""

    def _wave(self, n=16000):
        return (np.random.default_rng(11).standard_normal(n) * 4000).astype(
            np.float32
        )

    def test_fbank_numpy_matches_jax(self):
        wave = self._wave()
        opts = FbankOptions()
        f_np = compute_fbank(wave, opts)
        assert isinstance(f_np, np.ndarray)  # never entered jax
        f_jx = np.asarray(compute_fbank(jnp.asarray(wave), opts))
        np.testing.assert_allclose(f_np, f_jx, rtol=2e-4, atol=2e-4)

    def test_fbank_numpy_gemm_mode(self):
        wave = self._wave()
        opts = FbankOptions()
        f_rfft = compute_fbank(wave, opts, fft_mode="rfft")
        f_gemm = compute_fbank(wave, opts, fft_mode="gemm")
        assert isinstance(f_gemm, np.ndarray)
        np.testing.assert_allclose(f_rfft, f_gemm, rtol=2e-3, atol=2e-3)

    def test_mfcc_numpy_matches_jax(self):
        wave = self._wave()
        opts = MfccOptions()
        f_np = compute_mfcc(wave, opts)
        assert isinstance(f_np, np.ndarray)
        f_jx = np.asarray(compute_mfcc(jnp.asarray(wave), opts))
        np.testing.assert_allclose(f_np, f_jx, rtol=2e-4, atol=2e-4)

    def test_mfcc_energy_htk_numpy(self):
        wave = self._wave()
        opts = MfccOptions()
        opts = type(opts)(**{**opts.__dict__, "use_energy": True})
        f_np = compute_mfcc(wave, opts)
        f_jx = np.asarray(compute_mfcc(jnp.asarray(wave), opts))
        np.testing.assert_allclose(f_np, f_jx, rtol=2e-4, atol=2e-4)

    def test_spectrogram_numpy_matches_jax(self):
        wave = self._wave()
        opts = SpectrogramOptions()
        f_np = compute_spectrogram(wave, opts)
        assert isinstance(f_np, np.ndarray)
        f_jx = np.asarray(compute_spectrogram(jnp.asarray(wave), opts))
        np.testing.assert_allclose(f_np, f_jx, rtol=2e-4, atol=2e-4)

    def test_cmvn_numpy_matches_jax(self):
        f = np.random.default_rng(12).standard_normal((50, 30)).astype(np.float32)
        out_np = cmvn_utterance(f, norm_vars=True)
        assert isinstance(out_np, np.ndarray)
        out_jx = np.asarray(cmvn_utterance(jnp.asarray(f), norm_vars=True))
        np.testing.assert_allclose(out_np, out_jx, rtol=1e-5, atol=1e-5)

    def test_jit_path_unaffected(self):
        wave = self._wave()
        f_jit = np.asarray(jax.jit(compute_fbank)(jnp.asarray(wave)))
        f_np = compute_fbank(wave)
        np.testing.assert_allclose(f_np, f_jit, rtol=2e-4, atol=2e-4)

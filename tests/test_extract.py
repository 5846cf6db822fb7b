"""Extraction service tests: bucketing, chunked long utts, ark output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asv_subtools_tpu.extract import ExtractConfig, Extractor, _bucket_for, _chunk
from asv_subtools_tpu.io import read_vec_flt_scp


def masked_mean_embed(x, mask):
    """Deterministic 'model': masked mean over time -> identity embedding."""
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class TestChunking:
    def test_short_passthrough(self):
        f = np.ones((100, 4), np.float32)
        chunks, w = _chunk(f, 200)
        assert len(chunks) == 1 and w == [1.0]

    def test_long_split_weights(self):
        f = np.arange(250 * 2, dtype=np.float32).reshape(250, 2)
        chunks, w = _chunk(f, 100)
        # 250 -> 3 splits of 83 + remainder chunk (length 83, weight 1)
        assert len(chunks) == 4
        assert all(c.shape[0] == 83 for c in chunks)
        assert pytest.approx(sum(w)) == 1.0
        assert w[-1] < w[0]

    def test_bucket_for(self):
        assert _bucket_for(100, (200, 400)) == 200
        assert _bucket_for(300, (200, 400)) == 400
        assert _bucket_for(999, (200, 400)) == 400


class TestExtractor:
    def _items(self, lengths, d=6, seed=0):
        rng = np.random.default_rng(seed)
        return [
            (f"utt{i}", rng.normal(size=(l, d)).astype(np.float32))
            for i, l in enumerate(lengths)
        ]

    def test_exactness_vs_direct(self):
        """Bucketed+padded extraction must equal per-utterance masked mean."""
        items = self._items([50, 120, 300, 77, 410])
        ex = Extractor(masked_mean_embed, ExtractConfig(buckets=(128, 512), default_batch=2))
        out = ex.extract_all(iter(items))
        assert set(out) == {f"utt{i}" for i in range(5)}
        for key, feats in items:
            np.testing.assert_allclose(
                out[key], feats.mean(axis=0), rtol=1e-5, atol=1e-5
            )

    def test_long_utt_chunked_average(self):
        items = self._items([1000])
        ex = Extractor(
            masked_mean_embed,
            ExtractConfig(buckets=(256,), max_chunk=256, default_batch=8),
        )
        out = ex.extract_all(iter(items))
        # frame-weighted average of chunk means ~ overall mean (chunks cover
        # all frames; remainder chunk overlaps, so only approximately)
        np.testing.assert_allclose(
            out["utt0"], items[0][1].mean(axis=0), atol=0.2
        )

    def test_ark_output(self, tmp_path):
        items = self._items([50, 80])
        ex = Extractor(masked_mean_embed, ExtractConfig(buckets=(128,), default_batch=4))
        ark = str(tmp_path / "xvector.ark")
        scp = str(tmp_path / "xvector.scp")
        stats = ex.extract_to_ark(iter(items), ark, scp)
        assert stats["utts"] == 2
        back = dict(read_vec_flt_scp(scp))
        np.testing.assert_allclose(back["utt0"], items[0][1].mean(0), rtol=1e-5)

    def test_real_model_extraction(self):
        """End-to-end with a tiny ECAPA backbone."""
        from asv_subtools_tpu.models import EcapaTdnn

        model = EcapaTdnn(channels=16, embd_dim=8, mfa_conv=24)
        rng = jax.random.PRNGKey(0)
        v = model.init({"params": rng}, jnp.ones((1, 50, 10)), train=False)
        ex = Extractor(
            lambda x, m: model.apply(v, x, mask=m, train=False),
            ExtractConfig(buckets=(64, 128), default_batch=4),
        )
        out = ex.extract_all(iter(self._items([30, 60, 100], d=10)))
        assert all(e.shape == (8,) for e in out.values())
        assert all(np.all(np.isfinite(e)) for e in out.values())


class TestWaveModeExtraction:
    def test_wave_mode_matches_feature_mode(self):
        """Wave-in extraction (on-device fbank) must match feeding
        precomputed features."""
        import jax

        from asv_subtools_tpu.extract import WAVE_BUCKETS, make_wave_embed_fn
        from asv_subtools_tpu.features import FbankOptions, cmvn_utterance, compute_fbank
        from asv_subtools_tpu.models import EcapaTdnn

        model = EcapaTdnn(channels=16, embd_dim=8, mfa_conv=24)
        rng = jax.random.PRNGKey(0)
        opts = FbankOptions()
        v = model.init({"params": rng}, jnp.ones((1, 50, 23)), train=False)

        def model_apply(x, mask):
            return model.apply(v, x, mask=mask, train=False)

        wave_embed = make_wave_embed_fn(model_apply, opts)
        ex = Extractor(wave_embed, ExtractConfig(buckets=(32000, 64000), default_batch=4))
        rng_np = np.random.default_rng(0)
        waves = [
            (f"u{i}", (rng_np.normal(size=n) * 1000).astype(np.float32))
            for i, n in enumerate([20000, 30000, 48000])
        ]
        out = ex.extract_all(iter(waves))
        assert set(out) == {"u0", "u1", "u2"}

        # reference: per-utt features on host -> feature-mode embed
        for key, wave in waves:
            feats = compute_fbank(jnp.asarray(wave)[None], opts, fft_mode="gemm")
            feats = cmvn_utterance(feats)
            direct = np.asarray(model_apply(feats, jnp.ones(feats.shape[:2], bool)))[0]
            cos = float(
                out[key] @ direct / (np.linalg.norm(out[key]) * np.linalg.norm(direct))
            )
            assert cos > 0.999, (key, cos)

"""Data pipeline + Kaldi I/O tests using synthetic wavs written to tmp."""

import os
import tarfile

import numpy as np
import pytest

from asv_subtools_tpu.data import (
    AddNoise,
    DropChunk,
    DropFreq,
    NoiseManifest,
    Prefetcher,
    SpeechAug,
    SpeedPerturb,
    WavEgs,
    WavEgsXvector,
    build_spk2int,
    de_silence,
    reverberate,
    spec_augment,
)
from asv_subtools_tpu.data import processor as P
from asv_subtools_tpu.io import (
    ArkScpWriter,
    read_mat,
    read_mat_ark,
    read_mat_scp,
    read_vec_flt_ark,
    read_wav,
    write_mat,
    write_vec_flt,
    write_wav,
)

SR = 16000


@pytest.fixture
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    utts = []
    for spk in range(3):
        for i in range(4):
            key = f"spk{spk}-utt{i}"
            dur = rng.uniform(1.0, 3.0)
            wav = rng.normal(size=int(SR * dur)).astype(np.float32) * 1000
            path = tmp_path / f"{key}.wav"
            write_wav(str(path), wav, SR)
            utts.append((key, str(path), f"spk{spk}"))
    wav_scp = tmp_path / "wav.scp"
    utt2spk = tmp_path / "utt2spk"
    with open(wav_scp, "w") as f:
        for k, p, _ in utts:
            f.write(f"{k} {p}\n")
    with open(utt2spk, "w") as f:
        for k, _, s in utts:
            f.write(f"{k} {s}\n")
    return tmp_path


class TestWavIO:
    def test_roundtrip(self, tmp_path):
        wav = (np.sin(np.arange(16000) * 0.01) * 10000).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, wav, SR)
        back, sr = read_wav(p)
        assert sr == SR
        np.testing.assert_allclose(back, np.round(wav), atol=1.0)


class TestKaldiIO:
    def test_mat_ark_scp_roundtrip(self, tmp_path):
        mats = {f"utt{i}": np.random.default_rng(i).normal(size=(20 + i, 8)).astype(np.float32) for i in range(3)}
        ark = str(tmp_path / "feats.ark")
        scp = str(tmp_path / "feats.scp")
        with ArkScpWriter(ark, scp) as w:
            for k, m in mats.items():
                w.write(k, m)
        back = dict(read_mat_ark(ark))
        assert set(back) == set(mats)
        for k in mats:
            np.testing.assert_array_equal(back[k], mats[k])
        back_scp = dict(read_mat_scp(scp))
        for k in mats:
            np.testing.assert_array_equal(back_scp[k], mats[k])

    def test_mat_range_read(self, tmp_path):
        m = np.arange(200, dtype=np.float32).reshape(20, 10)
        ark = str(tmp_path / "m.ark")
        scp = str(tmp_path / "m.scp")
        with ArkScpWriter(ark, scp) as w:
            w.write("u", m)
        rx = open(scp).read().split()[1]
        sliced = read_mat(rx, row_range=(5, 9))
        np.testing.assert_array_equal(sliced, m[5:9])

    def test_vec_roundtrip(self, tmp_path):
        ark = str(tmp_path / "v.ark")
        v1 = np.random.default_rng(0).normal(size=192).astype(np.float32)
        write_vec_flt(ark, v1, "e1")
        write_vec_flt(ark, v1 * 2, "e2")
        back = dict(read_vec_flt_ark(ark))
        np.testing.assert_array_equal(back["e1"], v1)
        np.testing.assert_array_equal(back["e2"], v1 * 2)


class TestSignal:
    def test_de_silence_removes_quiet(self):
        loud = np.ones(SR, np.float32) * 1000
        quiet = np.ones(SR, np.float32) * 1.0
        wav = np.concatenate([loud, quiet, loud])
        out = de_silence(wav, SR, min_eng=50)
        assert len(out) < len(wav)
        assert len(out) >= 2 * SR

    def test_reverberate_preserves_amplitude(self):
        rng = np.random.default_rng(1)
        wav = rng.normal(size=SR).astype(np.float32) * 1000
        rir = np.zeros(4000, np.float32)
        rir[100] = 1.0
        rir[2000] = 0.5
        out = reverberate(wav, rir)
        assert out.shape == wav.shape
        amp_ratio = np.abs(out).mean() / np.abs(wav).mean()
        assert 0.9 < amp_ratio < 1.1


class TestAugment:
    def _manifest(self, tmp_path):
        rng = np.random.default_rng(2)
        rows = ["ID,duration,wav,wav_format"]
        for i in range(3):
            p = tmp_path / f"noise{i}.wav"
            write_wav(str(p), rng.normal(size=SR).astype(np.float32) * 500, SR)
            rows.append(f"n{i},1.0,{p},wav")
        csv_path = tmp_path / "noise.csv"
        csv_path.write_text("\n".join(rows))
        return NoiseManifest.from_csv(str(csv_path))

    def test_add_noise_snr(self, tmp_path):
        man = self._manifest(tmp_path)
        rng = np.random.default_rng(3)
        wav = rng.normal(size=2 * SR).astype(np.float32) * 1000
        noisy = AddNoise(man, snr_low=10, snr_high=10)(wav, rng)
        assert noisy.shape == wav.shape
        noise = noisy - wav
        snr = 20 * np.log10(np.abs(wav).mean() / np.abs(noise).mean())
        assert 8 < snr < 12

    def test_speech_aug_random(self, tmp_path):
        man = self._manifest(tmp_path)
        aug = SpeechAug(
            [AddNoise(man), DropFreq(), DropChunk(), SpeedPerturb()],
            mode="random",
        )
        rng = np.random.default_rng(4)
        wav = rng.normal(size=SR).astype(np.float32) * 1000
        out = aug(wav, rng)
        assert np.all(np.isfinite(out))

    def test_spec_augment_zeroes(self):
        rng = np.random.default_rng(5)
        f = np.ones((100, 40), np.float32)
        out = spec_augment(f, rng, max_t=20, max_f=8)
        assert (out == 0).any()
        assert f.sum() > out.sum()

    def test_env_corrupt_chains_stages(self, tmp_path):
        """EnvCorrupt (speech_augment.py:1606) = reverb -> babble -> noise
        with per-stage probabilities; prob=1 must change the signal, prob=0
        must pass it through."""
        from asv_subtools_tpu.data.augment import EnvCorrupt

        man = self._manifest(tmp_path)
        rir = np.zeros(2000, np.float32)
        rir[0] = 1.0
        rir[800] = 0.4
        p = tmp_path / "rir.wav"
        write_wav(str(p), rir * 30000, SR)
        (tmp_path / "rir.csv").write_text(
            f"ID,duration,wav,wav_format\nr0,0.125,{p},wav")
        rirman = NoiseManifest.from_csv(str(tmp_path / "rir.csv"))

        rng = np.random.default_rng(6)
        wav = rng.normal(size=2 * SR).astype(np.float32) * 1000
        env = EnvCorrupt(reverb_manifest=rirman, noise_manifest=man,
                         babble_manifest=man, babble_speaker_count=3,
                         noise_snr_low=5, noise_snr_high=10)
        out = env(wav, rng)
        assert out.shape == wav.shape
        assert np.all(np.isfinite(out))
        assert not np.allclose(out, wav)
        off = EnvCorrupt(reverb_manifest=rirman, noise_manifest=man,
                         reverb_prob=0.0, noise_prob=0.0)
        assert np.array_equal(off(wav, rng), wav)

    def test_time_domain_specaug_keeps_shape(self):
        """TimeDomainSpecAugment (speech_augment.py:1728): speed perturb +
        drop_freq + drop_chunk, keep_shape pins the output length."""
        from asv_subtools_tpu.data.augment import TimeDomainSpecAugment

        rng = np.random.default_rng(7)
        wav = rng.normal(size=SR).astype(np.float32) * 1000
        tds = TimeDomainSpecAugment(
            speeds=(0.9,), drop_chunk_count_low=1, drop_chunk_count_high=2)
        out = tds(wav, rng)
        assert out.shape == wav.shape
        assert np.all(np.isfinite(out))
        assert (out == 0).any()  # drop_chunk zeroed a span
        # speed 0.9 stretches: keep_shape trims back; last samples real
        tds2 = TimeDomainSpecAugment(
            speeds=(1.1,), drop_freq_prob=0.0, drop_chunk_prob=0.0)
        out2 = tds2(wav, rng)
        assert out2.shape == wav.shape
        assert (out2[-100:] == 0).all()  # 1.1 = faster/shorter -> padded

    def test_speech_aug_config_composition_stages(self, tmp_path):
        from asv_subtools_tpu.data.augment import (
            EnvCorrupt,
            TimeDomainSpecAugment,
            speech_aug_from_config,
        )

        self._manifest(tmp_path)
        cfg = {
            "mode": "chain",
            "stages": [
                {"type": "env_corrupt",
                 "noise_csv": str(tmp_path / "noise.csv"),
                 "noise_snr_low": 5, "noise_snr_high": 15},
                {"type": "time_domain_specaug",
                 "speeds": [0.95, 1.0, 1.05]},
            ],
        }
        aug = speech_aug_from_config(cfg)
        assert isinstance(aug.stages[0], EnvCorrupt)
        assert isinstance(aug.stages[1], TimeDomainSpecAugment)
        rng = np.random.default_rng(8)
        wav = rng.normal(size=SR).astype(np.float32) * 1000
        out = aug(wav, rng)
        assert out.shape == wav.shape and np.all(np.isfinite(out))


class TestPipeline:
    def test_wav_egs_batches(self, wav_dir):
        spk2int = build_spk2int(str(wav_dir / "utt2spk"))
        assert len(spk2int) == 3
        egs = WavEgs(
            str(wav_dir / "wav.scp"),
            str(wav_dir / "utt2spk"),
            spk2int,
            chunk_seconds=1.0,
            batch_size=4,
            shuffle_buffer=10,
        )
        batches = list(egs)
        assert len(batches) == 3  # 12 utts / 4
        b = batches[0]
        assert b["x"].shape == (4, SR)
        assert b["y"].shape == (4,)
        assert b["mask"].all()  # fixed chunks: no padding
        assert set(b["y"].tolist()) <= {0, 1, 2}

    def test_parallel_workers_match_serial(self, wav_dir):
        """workers>1 fans the per-sample stages over a thread pool with
        ordered results — batches must be identical to workers=1."""
        spk2int = build_spk2int(str(wav_dir / "utt2spk"))
        kw = dict(chunk_seconds=0.5, batch_size=4, shuffle_buffer=8,
                  speed_perturb=True, num_spks=len(spk2int), spec_aug=True)
        a = WavEgs(str(wav_dir / "wav.scp"), str(wav_dir / "utt2spk"),
                   spk2int, workers=1, **kw)
        b = WavEgs(str(wav_dir / "wav.scp"), str(wav_dir / "utt2spk"),
                   spk2int, workers=4, **kw)
        a.set_epoch(1)
        b.set_epoch(1)
        ba, bb = list(a), list(b)
        assert len(ba) == len(bb) > 0
        for x, y in zip(ba, bb):
            assert x["keys"] == y["keys"]
            np.testing.assert_array_equal(x["y"], y["y"])
            np.testing.assert_allclose(x["x"], y["x"], atol=1e-6)

    def test_reiteration_labels_stable(self, wav_dir):
        """Iterating egs repeatedly must NOT re-apply in-place sample
        mutations: with speed_perturb label expansion, a second pass over
        shared entry dicts re-offsets already-offset labels past
        num_targets (on TPU the out-of-bounds CE gather is NaN and every
        step gets skipped — the bug that froze the voxceleb recipe run)."""
        spk2int = build_spk2int(str(wav_dir / "utt2spk"))
        n = len(spk2int)
        egs = WavEgs(
            str(wav_dir / "wav.scp"), str(wav_dir / "utt2spk"), spk2int,
            chunk_seconds=0.5, batch_size=12, shuffle_buffer=1,
            speed_perturb=True, num_spks=n,
        )
        egs.set_epoch(0)
        for it in range(3):  # same epoch: labels must be in range AND stable
            ys = np.concatenate([b["y"] for b in egs])
            assert ys.min() >= 0 and ys.max() < 3 * n, (it, ys.max())
            if it == 0:
                ys0 = ys
            else:
                np.testing.assert_array_equal(ys, ys0)

    def test_epoch_reshuffle_changes_order(self, wav_dir):
        spk2int = build_spk2int(str(wav_dir / "utt2spk"))
        egs = WavEgs(
            str(wav_dir / "wav.scp"), str(wav_dir / "utt2spk"), spk2int,
            chunk_seconds=0.5, batch_size=12, shuffle_buffer=1,
        )
        egs.set_epoch(0)
        keys0 = list(egs)[0]["keys"]
        egs.set_epoch(1)
        keys1 = list(egs)[0]["keys"]
        assert keys0 != keys1
        assert sorted(keys0) == sorted(keys1)

    def test_speed_perturb_label_offsets_by_speed_value(self):
        """Clean 1.0x must keep the base label regardless of its position in
        `speeds` (speech_augment.py:1280-1290: speed==100 -> offset 0)."""
        sr = 16000
        num_spks = 7
        for speeds in [(0.9, 1.0, 1.1), (1.0, 0.9, 1.1), (1.1, 0.9, 1.0)]:
            stage = P.speed_perturb_stage(
                speeds=speeds, expand_labels=True, num_spks=num_spks, seed=3
            )
            base_len = sr // 2
            samples = [
                {"key": f"u{i}", "wav": np.random.randn(base_len).astype(np.float32),
                 "sample_rate": sr, "label": 2}
                for i in range(60)
            ]
            seen = {}
            for s in stage(iter(samples)):
                # recover which speed was applied from the output length
                ratio = base_len / len(s["wav"])
                speed = min(speeds, key=lambda v: abs(v - ratio))
                seen.setdefault(speed, set()).add(s["label"])
            assert seen[1.0] == {2}, f"clean kept base label, speeds={speeds}"
            noncleans = [v for v in speeds if v != 1.0]
            expected = {2 + (k + 1) * num_spks for k in range(len(noncleans))}
            got = set().union(*(seen.get(v, set()) for v in noncleans))
            assert got <= expected and got, f"non-clean offsets wrong: {got}"

    def test_stage_rng_rerandomizes_per_epoch_and_is_stable(self):
        """Chunk positions must differ across epochs (reference re-seeds per
        epoch) and be identical across runs for the same epoch (crc32, not
        salted hash)."""
        sr = 16000
        wav = np.arange(sr * 2, dtype=np.float32)

        def chunks(epoch_val):
            ep = P.EpochState(epoch_val)
            stage = P.random_chunk(0.5, seed=7, epoch=ep)
            outs = list(stage(iter(
                [{"key": f"u{i}", "wav": wav.copy(), "sample_rate": sr}
                 for i in range(8)]
            )))
            return [int(o["wav"][0]) for o in outs]

        e0a, e0b, e1 = chunks(0), chunks(0), chunks(1)
        assert e0a == e0b  # reproducible
        assert e0a != e1  # re-randomized per epoch

    def test_rank_sharding_partitions(self, wav_dir):
        spk2int = build_spk2int(str(wav_dir / "utt2spk"))
        seen = []
        for rank in range(2):
            egs = WavEgs(
                str(wav_dir / "wav.scp"), str(wav_dir / "utt2spk"), spk2int,
                chunk_seconds=0.5, batch_size=12, shuffle_buffer=1,
                rank=rank, world_size=2, drop_last=False,
            )
            for b in egs:
                seen += b["keys"]
        assert len(seen) == 12 and len(set(seen)) == 12

    def test_extraction_pipeline(self, wav_dir):
        egs = WavEgsXvector(str(wav_dir / "wav.scp"))
        items = list(egs)
        assert len(items) == 12
        key, feat = items[0]
        from asv_subtools_tpu.features import FbankOptions

        assert feat.ndim == 2
        assert feat.shape[1] == FbankOptions().mel_opts.num_bins

    def test_bucketed_padding(self):
        samples = [
            {"key": f"u{i}", "feat": np.ones((l, 8), np.float32), "label": 0}
            for i, l in enumerate([50, 90, 130])
        ]
        batches = list(
            P.pad_batch(bucket_lengths=[64, 128, 256])(iter([samples]))
        )
        assert batches[0]["x"].shape == (3, 256, 8)
        assert batches[0]["mask"].sum() == 50 + 90 + 130

    def test_dynamic_batch_respects_budget(self):
        samples = [
            {"key": f"u{i}", "feat": np.ones((l, 4), np.float32), "label": 0}
            for i, l in enumerate([100, 100, 200, 400, 100])
        ]
        batches = list(P.dynamic_batch(max_frames_in_batch=400)(iter(samples)))
        for b in batches:
            longest = max(len(s["feat"]) for s in b)
            assert longest * len(b) <= 400

    def test_prefetcher_equivalent(self):
        data = list(range(100))
        assert list(Prefetcher(data, max_prefetch=8)) == data

    def test_prefetcher_propagates_errors(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            list(Prefetcher(gen()))

    def test_tar_shard_source(self, tmp_path):
        import io as _io

        from asv_subtools_tpu.io import write_wav as _ww

        wavp = tmp_path / "x.wav"
        _ww(str(wavp), np.ones(SR, np.float32) * 100, SR)
        shard = tmp_path / "shard0.tar"
        with tarfile.open(shard, "w") as tf:
            tf.add(str(wavp), arcname="utt1.wav")
            lbl = tmp_path / "utt1.spk"
            lbl.write_text("spk7")
            tf.add(str(lbl), arcname="utt1.spk")
        samples = list(P.Pipeline(P.tar_shard_source([str(shard)]), [P.parse_raw]))
        assert len(samples) == 1
        assert samples[0]["label"] == "spk7"
        assert len(samples[0]["wav"]) == SR


class TestOfflineEgs:
    @pytest.fixture
    def feats_dir(self, tmp_path):
        """Kaldi datadir with feature arks."""
        from asv_subtools_tpu.datadir import DataDir

        rng = np.random.default_rng(0)
        ark = str(tmp_path / "feats.ark")
        scp = str(tmp_path / "feats.scp")
        tables = {"feats.scp": {}, "utt2spk": {}, "utt2num_frames": {}}
        with ArkScpWriter(ark, scp) as w:
            for s in range(3):
                for i in range(3):
                    key = f"s{s}u{i}"
                    n = 250 + 50 * i
                    w.write(key, rng.normal(size=(n, 8)).astype(np.float32))
                    tables["utt2spk"][key] = f"spk{s}"
                    tables["utt2num_frames"][key] = str(n)
        for k, v in (dict(l.split(None, 1) for l in open(scp).read().splitlines())).items():
            tables["feats.scp"][k] = v
        return DataDir(tables)

    def test_speaker_balance_sampling(self, feats_dir):
        from asv_subtools_tpu.data import ChunkSamples

        cs = ChunkSamples(feats_dir, chunk_size=200, chunk_type="speaker_balance")
        chunks = cs.sample()
        assert chunks
        per_spk = {}
        for c in chunks:
            per_spk[c.label] = per_spk.get(c.label, 0) + 1
        counts = list(per_spk.values())
        assert max(counts) - min(counts) <= 1  # balanced
        for c in chunks:
            assert c.end - c.start == 200

    def test_sequential_with_overlap(self, feats_dir):
        from asv_subtools_tpu.data import ChunkSamples

        cs = ChunkSamples(feats_dir, chunk_size=200, chunk_type="sequential", overlap=0.5)
        chunks = cs.sample()
        starts = [c.start for c in chunks if c.utt == "s0u2"]  # 350 frames
        assert starts == [0, 100]  # step = 100 with 50% overlap

    def test_chunk_egs_batches_and_csv(self, feats_dir, tmp_path):
        from asv_subtools_tpu.data import ChunkEgs, ChunkSamples, read_chunk_csv

        cs = ChunkSamples(feats_dir, chunk_size=128)
        csv_path = str(tmp_path / "chunks.csv")
        cs.write_csv(csv_path)
        chunks = read_chunk_csv(csv_path)
        assert chunks
        egs = ChunkEgs(chunks, batch_size=4)
        batch = next(iter(egs))
        assert batch["x"].shape == (4, 128, 8)
        assert batch["y"].shape == (4,)
        # epoch reshuffle changes batch composition
        egs.set_epoch(1)
        batch2 = next(iter(egs))
        assert batch["keys"] != batch2["keys"] or not np.allclose(batch["x"], batch2["x"])


class TestShardWriterAndCsv:
    def test_write_and_read_tar_shards(self, tmp_path):
        import wave as wavemod

        from asv_subtools_tpu.data.processor import (
            Pipeline, parse_raw, tar_shard_source, write_tar_shards,
        )

        rng = np.random.default_rng(0)
        entries = []
        for i in range(5):
            pcm = (rng.normal(size=1600) * 3000).astype(np.int16)
            p = tmp_path / f"u{i}.wav"
            with wavemod.open(str(p), "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            entries.append((f"u{i}", str(p), f"spk{i % 2}"))

        shards = write_tar_shards(entries, str(tmp_path / "shards"),
                                  num_per_shard=2)
        assert len(shards) == 3  # 2+2+1
        out = list(Pipeline(tar_shard_source(shards), [parse_raw]))
        assert sorted(s["key"] for s in out) == [f"u{i}" for i in range(5)]
        assert all(s["label"] in ("spk0", "spk1") for s in out)
        assert all(s["wav"].shape == (1600,) for s in out)

    def test_prepare_speechaug_csv(self, tmp_path):
        import wave as wavemod

        from asv_subtools_tpu.data.augment import NoiseManifest, prepare_speechaug_csv

        sub = tmp_path / "musan" / "noise"
        sub.mkdir(parents=True)
        rng = np.random.default_rng(1)
        for i in range(3):
            pcm = (rng.normal(size=8000) * 3000).astype(np.int16)
            with wavemod.open(str(sub / f"n{i}.wav"), "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                w.writeframes(pcm.tobytes())
        csv_path = str(tmp_path / "csv" / "noise.csv")
        n = prepare_speechaug_csv(str(tmp_path / "musan"), csv_path)
        assert n == 3
        man = NoiseManifest.from_csv(csv_path)
        assert len(man.items) == 3
        assert abs(man.items[0][1] - 0.5) < 1e-6  # 8000/16000 s

    def test_utt2num_frames_from_vad(self, tmp_path):
        from asv_subtools_tpu.datadir import utt2num_frames_from_vad
        from asv_subtools_tpu.io.kaldi import ArkScpWriter

        with ArkScpWriter(str(tmp_path / "vad.ark"), str(tmp_path / "vad.scp"),
                          matrix=False) as w:
            w.write("u1", np.ones(37, np.float32))
            w.write("u2", np.zeros(11, np.float32))
        counts = utt2num_frames_from_vad(str(tmp_path / "vad.scp"))
        assert counts == {"u1": 37, "u2": 11}


class TestCutoutFactory:
    def test_cutout_zeroes_rectangle_only(self):
        from asv_subtools_tpu.data.augment import cutout

        rng = np.random.default_rng(0)
        feats = np.ones((100, 40), np.float32)
        out = cutout(feats, rng, frequency=0.5, frame=0.5, num_cut=1)
        zeros = out == 0.0
        # a cutout is a rectangle: zero rows/cols form contiguous runs and
        # the zero region is their outer product
        zr = np.where(zeros.any(axis=1))[0]
        zc = np.where(zeros.any(axis=0))[0]
        if zr.size:
            assert np.array_equal(zr, np.arange(zr[0], zr[-1] + 1))
            assert np.array_equal(zc, np.arange(zc[0], zc[-1] + 1))
            assert zeros.sum() == zr.size * zc.size
        assert not zeros.all(axis=0).any() and not zeros.all(axis=1).any() or (
            zr.size < 100 and zc.size < 40
        )
        # input untouched
        assert feats.min() == 1.0

    def test_specaugment_proportional_full_bands(self):
        from asv_subtools_tpu.data.augment import spec_augment_proportional

        rng = np.random.default_rng(3)
        feats = np.ones((50, 30), np.float32)
        out = spec_augment_proportional(
            feats, rng, frequency=0.4, frame=0.2, rows=1, cols=1,
            random_rows=False,
        )
        # any zeroed freq column is zero across ALL frames (band mask),
        # except where a time mask also lands
        zero_cols = (out == 0).all(axis=0)
        zero_rows = (out == 0).all(axis=1)
        assert zero_cols.sum() <= int(30 * 0.4)
        assert zero_rows.sum() <= int(50 * 0.2)
        # reference inverted_factor (augmentation.py:88-94): surviving
        # entries are rescaled by D/(D-f) after the frequency mask
        f = int(zero_cols.sum())
        if f and not zero_rows.any():
            surv = out[:, ~zero_cols]
            np.testing.assert_allclose(surv, 30.0 / (30.0 - f), rtol=1e-6)
        # both-or-nothing gating (reference :55): frame=0 -> untouched
        same = spec_augment_proportional(feats, rng, frequency=0.4,
                                         frame=0.0, rows=1, cols=1)
        assert (same == feats).all()

    def test_factory_dispatch(self):
        from asv_subtools_tpu.data.augment import get_augmentation

        assert get_augmentation(None) is None
        assert get_augmentation("") is None
        fn = get_augmentation("cutout", {"frequency": 0.3, "frame": 0.1})
        rng = np.random.default_rng(0)
        out = fn(np.ones((20, 10), np.float32), rng)
        assert out.shape == (20, 10)
        fn2 = get_augmentation("specaugment")
        assert fn2(np.ones((20, 10), np.float32), rng).shape == (20, 10)
        with pytest.raises(TypeError):
            get_augmentation("nope")
        # cutout with the factory default frame=0.0 fails loudly, like the
        # reference Cutout ctor assert (augmentation.py:127-128)
        bad = get_augmentation("cutout", {"frequency": 0.3})
        with pytest.raises(ValueError):
            bad(np.ones((20, 10), np.float32), rng)

    def test_chunk_egs_applies_aug(self, tmp_path):
        from asv_subtools_tpu.data.egs_offline import Chunk, ChunkEgs
        from asv_subtools_tpu.io.kaldi import ArkScpWriter

        mats = {f"u{i}": np.ones((40, 8), np.float32) for i in range(4)}
        ark = str(tmp_path / "feats.ark")
        scp = str(tmp_path / "feats.scp")
        with ArkScpWriter(ark, scp) as w:
            for k, m in mats.items():
                w.write(k, m)
        rx = dict(l.strip().split(None, 1) for l in open(scp))
        chunks = [Chunk(u, rx[u], 0, 40, i) for i, u in enumerate(sorted(mats))]
        egs = ChunkEgs(chunks, batch_size=4, drop_last=False,
                       aug="specaugment",
                       aug_params={"frequency": 0.5, "frame": 0.2,
                                   "rows": 1, "cols": 1,
                                   "random_rows": False})
        batch = next(iter(egs))
        assert (batch["x"] == 0).any(), "aug should have zeroed something"
        egs_clean = ChunkEgs(chunks, batch_size=4, drop_last=False)
        batch_clean = next(iter(egs_clean))
        assert not (batch_clean["x"] == 0).any()


def _mp_test_factory(cfg, worker_id=0, num_workers=1):
    """Module-level factory (picklable -> exercises the spawn path the
    Launcher uses in production via partial(_build_train_egs, cfg))."""
    from asv_subtools_tpu.data.dataset import _build_train_egs

    return _build_train_egs(cfg, worker_id=worker_id, num_workers=num_workers)


def _mp_raising_factory(worker_id=0, num_workers=1):
    def gen():
        yield {"x": np.zeros(2), "keys": ["a"]}
        raise ValueError("boom in worker")

    return gen()


def _mp_env_probe_factory(worker_id=0, num_workers=1):
    """Reports the worker's env so the chip-pinning contract is testable."""
    import os

    def gen():
        yield {
            "jax_platforms": os.environ.get("JAX_PLATFORMS"),
            "axon_gate": os.environ.get("PALLAS_AXON_POOL_IPS"),
            "keys": [f"w{worker_id}"],
        }

    return gen()


class TestMultiprocessLoader:
    def _factory(self, wav_dir, batch_size=2, context="spawn"):
        import functools

        from asv_subtools_tpu.data import MultiprocessLoader, build_spk2int

        spk2int = build_spk2int(str(wav_dir / "utt2spk"))
        cfg = dict(
            train_scp=str(wav_dir / "wav.scp"),
            train_u2s=str(wav_dir / "utt2spk"),
            spk2int=spk2int,
            chunk_seconds=0.5,
            batch_size=batch_size,
            compute_feat=False,
            shuffle_buffer=8,
        )
        make_egs = functools.partial(_mp_test_factory, cfg)
        return (
            MultiprocessLoader(make_egs, num_workers=2, context=context),
            make_egs,
        )

    def test_epoch_coverage_matches_single_process(self, wav_dir):
        """Across the persistent 2-worker SPAWN pool, one epoch yields
        exactly the utterances a single-process epoch yields (modulo batch
        order), and a second epoch works without respawn."""
        loader, make_egs = self._factory(wav_dir)
        try:
            def keys_of(batches):
                return sorted(k for b in batches for k in b["keys"])

            ref = keys_of(list(make_egs()))
            got = keys_of(list(loader))
            assert got == ref
            # second epoch through the SAME pool: reshuffled, same set
            loader.set_epoch(1)
            got2 = keys_of(list(loader))
            assert got2 == ref
        finally:
            loader.close()

    def test_epoch_reshuffle_changes_batch_composition(self, wav_dir):
        loader, _ = self._factory(wav_dir)
        try:
            first = [tuple(b["keys"]) for b in loader]
            loader.set_epoch(3)
            second = [tuple(b["keys"]) for b in loader]
            assert sorted(k for t in first for k in t) == \
                sorted(k for t in second for k in t)
            assert first != second  # per-epoch reshuffle reached workers
        finally:
            loader.close()

    def test_fork_context_with_closure(self, wav_dir):
        """context="fork" accepts closures (numpy-only parents)."""
        loader, make_egs = self._factory(wav_dir, context="fork")
        try:
            ref = sorted(k for b in make_egs() for k in b["keys"])
            got = sorted(k for b in loader for k in b["keys"])
            assert got == ref
        finally:
            loader.close()

    def test_worker_error_propagates(self, tmp_path):
        from asv_subtools_tpu.data import MultiprocessLoader

        loader = MultiprocessLoader(_mp_raising_factory, num_workers=2)
        try:
            with pytest.raises(RuntimeError, match="boom in worker"):
                list(loader)
        finally:
            loader.close()

    def test_abandoned_iterator_does_not_poison_later_epochs(self, wav_dir):
        """Regression (round-3 advisor, high): `next(iter(loader))`
        abandons a dispatch mid-flight; generation tagging must keep every
        LATER epoch iteration a complete, current-epoch pass rather than
        consuming the stale stream (epoch off-by-one, dup/missing keys)."""
        loader, make_egs = self._factory(wav_dir)
        try:
            def keys_of(batches):
                return sorted(k for b in batches for k in b["keys"])

            ref = keys_of(list(make_egs()))
            # abandon a dispatch the way the Launcher's old init probe did
            next(iter(loader))
            # epoch 0 after the abandonment: still exactly one full epoch
            assert keys_of(list(loader)) == ref
            # epoch composition must track set_epoch immediately (not lag
            # one behind on the stale dispatch)
            loader.set_epoch(5)
            direct = make_egs()
            direct.set_epoch(5)
            assert [sorted(b["keys"]) for b in loader] and \
                keys_of(list(loader)) == keys_of(list(direct))
        finally:
            loader.close()

    def test_workers_are_pinned_off_the_accelerator(self):
        """Regression (round 4): JAX_PLATFORMS=cpu alone does NOT pin a
        worker off the chip on accelerator images whose sitecustomize
        force-registers the backend (the axon register overrides
        jax_platforms at interpreter start; observed: a spawn worker that
        imported jax claimed the TPU). The pool must ALSO strip the
        sitecustomize gate env (PALLAS_AXON_POOL_IPS) from the workers'
        env, and restore the parent's env afterwards."""
        import os

        from asv_subtools_tpu.data import MultiprocessLoader

        os.environ["PALLAS_AXON_POOL_IPS"] = "198.51.100.1"  # pretend chip
        prev_jp = os.environ.get("JAX_PLATFORMS")
        try:
            loader = MultiprocessLoader(_mp_env_probe_factory, num_workers=2)
            try:
                batches = list(loader)
            finally:
                loader.close()
            assert len(batches) == 2
            for b in batches:
                assert b["jax_platforms"] == "cpu", b
                assert b["axon_gate"] is None, b
            # parent env restored
            assert os.environ.get("PALLAS_AXON_POOL_IPS") == "198.51.100.1"
            assert os.environ.get("JAX_PLATFORMS") == prev_jp
        finally:
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    def test_example_batch_probe_is_pool_free(self, wav_dir):
        """example_batch() (the Launcher's init probe) must not dispatch to
        the pool: afterwards a normal iteration is still a clean epoch."""
        loader, make_egs = self._factory(wav_dir)
        try:
            ex = loader.example_batch()
            assert "x" in ex and len(ex["keys"]) > 0
            assert loader._procs is None  # no pool was spun up
            ref = sorted(k for b in make_egs() for k in b["keys"])
            assert sorted(k for b in loader for k in b["keys"]) == ref
        finally:
            loader.close()


class TestNativeFeatureBackend:
    def test_native_matches_numpy_through_pipeline(self, wav_dir):
        """feat_backend='native' routes the C++ frontend with automatic
        numpy fallback; outputs agree with the numpy backend at the
        established native-vs-jax tolerance (2e-3)."""
        pytest.importorskip("ctypes")
        from asv_subtools_tpu.features.native import native_available

        if not native_available():
            pytest.skip("libasvtpu_capi.so not built")
        from asv_subtools_tpu.data import WavEgsXvector

        a = dict(iter(WavEgsXvector(str(wav_dir / "wav.scp"))))
        b = dict(iter(WavEgsXvector(str(wav_dir / "wav.scp"),
                                    feat_backend="native")))
        assert a.keys() == b.keys()
        for k in a:
            assert a[k].shape == b[k].shape
            np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-3)

    def test_unsupported_opts_fall_back(self):
        """Dithered options are not C-API-expressible: native returns
        None and the stage silently uses numpy."""
        from asv_subtools_tpu.features import FbankOptions, FrameOptions
        from asv_subtools_tpu.features.native import (
            native_available,
            native_fbank,
        )

        if not native_available():
            pytest.skip("libasvtpu_capi.so not built")
        opts = FbankOptions(frame_opts=FrameOptions(dither=1.0))
        assert native_fbank(np.zeros(16000, np.float32), opts) is None


def _mp_native_factory(cfg, worker_id=0, num_workers=1, probe=False):
    from asv_subtools_tpu.data.dataset import _build_train_egs

    return _build_train_egs(cfg, worker_id=worker_id,
                            num_workers=num_workers, probe=probe)


class TestNativeBackendInSpawnWorkers:
    def test_pool_parity_native_vs_numpy(self, wav_dir):
        """feat_backend='native' must load the ctypes lib inside SPAWN
        workers and agree with the numpy pool on every batch key set and
        feature shape (values at the native tolerance)."""
        import functools

        from asv_subtools_tpu.data import MultiprocessLoader, build_spk2int
        from asv_subtools_tpu.features.native import native_available

        if not native_available():
            pytest.skip("libasvtpu_capi.so not built")
        spk2int = build_spk2int(str(wav_dir / "utt2spk"))

        def batches(backend):
            cfg = dict(
                train_scp=str(wav_dir / "wav.scp"),
                train_u2s=str(wav_dir / "utt2spk"),
                spk2int=spk2int, chunk_seconds=0.5, batch_size=2,
                compute_feat=True, feat_backend=backend, shuffle_buffer=8,
            )
            loader = MultiprocessLoader(
                functools.partial(_mp_native_factory, cfg), num_workers=2)
            try:
                out = {k: b["x"][i] for b in loader
                       for i, k in enumerate(b["keys"])}
            finally:
                loader.close()
            return out

        a = batches("numpy")
        b = batches("native")
        assert a.keys() == b.keys()
        for k in a:
            assert a[k].shape == b[k].shape
            np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-3)

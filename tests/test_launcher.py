"""End-to-end launcher smoke test: synthetic speakers -> train -> extract
-> cosine score. The full framework slice on the 8-device CPU mesh.

Synthetic speakers are sinusoid mixtures with distinct fundamental
frequencies, so even a tiny model should learn to separate them.
"""

import numpy as np
import pytest

from asv_subtools_tpu.backend import compute_eer, cosine_score_matrix
from asv_subtools_tpu.io import read_vec_flt_scp, write_wav
from asv_subtools_tpu.launcher import Launcher
from asv_subtools_tpu.utils import assign_params_dict, split_params

SR = 16000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(7)
    lines_wav, lines_spk, eval_lines = [], [], []
    for spk in range(4):
        f0 = 80.0 + 60.0 * spk
        for i in range(6):
            key = f"s{spk}-u{i}"
            dur = rng.uniform(1.2, 2.2)
            t = np.arange(int(SR * dur)) / SR
            wav = sum(
                np.sin(2 * np.pi * f0 * (h + 1) * t + rng.uniform(0, 6.28)) / (h + 1)
                for h in range(4)
            )
            wav = (wav * 3000 + rng.normal(size=len(t)) * 100).astype(np.float32)
            p = root / f"{key}.wav"
            write_wav(str(p), wav, SR)
            if i < 4:
                lines_wav.append(f"{key} {p}")
                lines_spk.append(f"{key} spk{spk}")
            else:
                eval_lines.append(f"{key} {p}")
    (root / "wav.scp").write_text("\n".join(lines_wav) + "\n")
    (root / "utt2spk").write_text("\n".join(lines_spk) + "\n")
    (root / "eval.scp").write_text("\n".join(eval_lines) + "\n")
    return root


class TestParams:
    def test_assign_params(self):
        d = {"a": 1, "b": {"c": 2.0, "d": "x"}}
        out = assign_params_dict(d, {"b": {"c": 3}})
        assert out["b"]["c"] == 3.0 and isinstance(out["b"]["c"], float)
        assert out["a"] == 1
        with pytest.raises(ValueError):
            assign_params_dict(d, {"a": "wrong"})
        out2 = assign_params_dict(d, {"new": 5}, support_unknown=True)
        assert out2["new"] == 5

    def test_split_params(self):
        out = split_params({"opt.lr": 1, "x": 2, "opt.wd": 3})
        assert out == {"public": {"x": 2}, "opt": {"lr": 1, "wd": 3}}


class TestEndToEnd:
    def test_train_extract_score(self, corpus, tmp_path):
        params = {
            "exp_dir": str(tmp_path / "exp"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 1.0,
                "batch_size": 8,
                "shuffle_buffer": 16,
            },
            "model": {
                "name": "xvector",
                "params": {"num_frame_channels": 32, "embd_dim": 16},
            },
            "loss": {"name": "margin_softmax", "params": {"method": "am", "m": 0.1}},
            "train": {
                "epochs": 2,
                "optimizer": {"name": "adamW", "learning_rate": 5e-3},
                "lr_schedule": {"name": "constant", "base_lr": 5e-3},
                "compute_dtype": "float32",
                "report_interval": 1000,
            },
            "extract": {"buckets": [128, 256], "batch": 8},
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        assert launcher.num_targets == 4
        launcher.build_model()
        state = launcher.train(egs)
        assert state is not None

        out_prefix = str(tmp_path / "xvector")
        stats = launcher.extract(str(corpus / "eval.scp"), out_prefix, state)
        assert stats["utts"] == 8
        embs = dict(read_vec_flt_scp(out_prefix + ".scp"))
        keys = sorted(embs)
        mat = np.stack([embs[k] for k in keys])
        spks = [k.split("-")[0] for k in keys]
        scores = np.asarray(cosine_score_matrix(mat, mat))
        iu = np.triu_indices(len(keys), 1)
        labels = np.asarray(
            [[1 if a == b else 0 for b in spks] for a in spks]
        )[iu]
        eer, _ = compute_eer(scores[iu], labels)
        # 4 synthetic speakers with distinct f0s: must beat chance decisively
        assert eer < 0.35, f"end-to-end EER too high: {eer}"


class TestWaveModeTraining:
    def test_launcher_wave_input_trains(self, corpus, tmp_path):
        """data.compute_feat=False: host pipeline delivers raw waveforms,
        the jitted step runs fused fbank + CMVN + on-device SpecAugment.
        The TPU-first training default for new recipes."""
        params = {
            "exp_dir": str(tmp_path / "exp"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 1.0,
                "batch_size": 8,
                "shuffle_buffer": 16,
                "compute_feat": False,
                "spec_aug": True,
                "num_bins": 40,
            },
            "model": {
                "name": "xvector",
                "params": {"num_frame_channels": 40, "embd_dim": 16},
            },
            "loss": {"name": "softmax", "params": {}},
            "train": {
                "epochs": 2,
                "optimizer": {"name": "adamW", "learning_rate": 5e-3},
                "lr_schedule": {"name": "constant", "base_lr": 5e-3},
                "compute_dtype": "float32",
                "report_interval": 1000,
            },
            "extract": {"buckets": [128, 256], "batch": 8},
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        launcher.build_model()
        batch = next(iter(egs))
        assert batch["x"].ndim == 2  # raw waveforms, not features
        state = launcher.train(egs)
        assert state is not None
        stats = launcher.extract(str(corpus / "eval.scp"),
                                 str(tmp_path / "xv"), state)
        assert stats["utts"] == 8


class TestDeviceSpecAugment:
    def test_matches_host_semantics(self):
        import jax
        import jax.numpy as jnp

        from asv_subtools_tpu.train.trainer import device_spec_augment

        feats = jnp.ones((4, 120, 40), jnp.float32)
        out = np.asarray(device_spec_augment(
            feats, jax.random.PRNGKey(0), num_t_mask=2, num_f_mask=2,
            max_t=20, max_f=8,
        ))
        assert out.shape == (4, 120, 40)
        # masking only: values are 0 or untouched
        assert set(np.unique(out)) <= {0.0, 1.0}
        for b in range(4):
            tz = np.where((out[b] == 0).all(axis=1))[0]  # zeroed frames
            fz = np.where((out[b] == 0).all(axis=0))[0]  # zeroed channels
            assert 1 <= len(tz) <= 2 * 20
            assert 1 <= len(fz) <= 2 * 8
        # rows are independently masked
        assert any(not np.array_equal(out[0], out[b]) for b in range(1, 4))


class TestValidSplit:
    def test_valid_split_and_metrics(self, corpus, tmp_path):
        params = {
            "exp_dir": str(tmp_path / "exp2"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 0.5,
                "batch_size": 8,  # must divide the 8-device mesh
                "shuffle_buffer": 8,
                "valid_utts": 4,
            },
            "model": {"name": "xvector", "params": {"num_frame_channels": 16, "embd_dim": 8}},
            "loss": {"name": "softmax", "params": {}},
            "train": {
                "epochs": 1,
                "optimizer": {"name": "sgd", "learning_rate": 1e-2},
                "lr_schedule": {"name": "constant", "base_lr": 1e-2},
                "compute_dtype": "float32",
                "report_interval": 100,
            },
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        assert launcher.valid_egs is not None
        launcher.build_model()
        state = launcher.train(egs)
        # checkpoint sidecar carries valid metrics
        import yaml

        info = yaml.safe_load(
            open(tmp_path / "exp2" / "checkpoints" / "checkpoint_info" / "1.yaml")
        )
        assert "valid_loss" in info


class TestConfigPresets:
    def test_all_presets_build(self, corpus):
        """Every preset must construct its Launcher + model."""
        import glob

        from asv_subtools_tpu.utils import load_yaml

        presets = sorted(glob.glob("recipes/configs/*.yaml"))
        assert len(presets) >= 10
        for path in presets:
            cfg = load_yaml(path)
            cfg.setdefault("data", {})
            cfg["data"].update(
                {
                    "train_wav_scp": str(corpus / "wav.scp"),
                    "train_utt2spk": str(corpus / "utt2spk"),
                }
            )
            launcher = Launcher(cfg)
            launcher.build_egs()
            net = launcher.build_model()
            assert net is not None, path


class TestRecipePresetMerge:
    def test_preset_replaces_model_and_schedule(self, corpus):
        """recipes/voxceleb/run.py::apply_preset — presets must REPLACE
        model/loss/optimizer/lr_schedule (a recursive merge leaks ECAPA
        kwargs like `channels` into e.g. ResNetXvector: observed crash)."""
        import importlib.util

        from asv_subtools_tpu.utils import load_yaml

        spec = importlib.util.spec_from_file_location(
            "vox_run", "recipes/voxceleb/run.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        base = {
            "exp_dir": "exp/x",
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "batch_size": 8,
            },
            "model": {"name": "ecapa_tdnn",
                      "params": {"channels": 1024, "embd_dim": 192}},
            "loss": {"name": "margin_softmax_v1",
                     "params": {"method": "aam", "m": 0.2}},
            "train": {
                "epochs": 6,
                "optimizer": {"name": "adamW", "learning_rate": 1e-3},
                "lr_schedule": {"name": "cyclic", "base_lr": 1e-8,
                                "max_lr": 1e-3, "step_size_up": 15000},
            },
        }
        preset = load_yaml("recipes/configs/resnet34.yaml")
        merged = mod.apply_preset(base, preset)
        assert merged["model"]["name"] == "resnet_xvector"
        assert "channels" not in merged["model"]["params"]
        assert merged["train"]["lr_schedule"]["name"] == "warmR"
        assert "max_lr" not in merged["train"]["lr_schedule"]
        assert merged["train"]["optimizer"]["name"] == "sgd"
        # the merged dict must build through the Launcher
        launcher = Launcher(merged)
        launcher.build_egs()
        assert launcher.build_model() is not None


class TestWaveModeExtractStage:
    def test_extract_wave_mode(self, corpus, tmp_path):
        params = {
            "exp_dir": str(tmp_path / "exp3"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 0.5,
                "batch_size": 8,
                "shuffle_buffer": 8,
            },
            "model": {"name": "xvector", "params": {"num_frame_channels": 16, "embd_dim": 8}},
            "loss": {"name": "softmax", "params": {}},
            "train": {
                "epochs": 1,
                "optimizer": {"name": "sgd", "learning_rate": 1e-2},
                "lr_schedule": {"name": "constant", "base_lr": 1e-2},
                "compute_dtype": "float32",
                "report_interval": 100,
            },
            "extract": {"mode": "wave", "batch": 4, "workers": 2},
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        launcher.build_model()
        state = launcher.train(egs)
        stats = launcher.extract(
            str(corpus / "eval.scp"), str(tmp_path / "xv"), state
        )
        assert stats["utts"] == 8
        embs = dict(read_vec_flt_scp(str(tmp_path / "xv.scp")))
        assert len(embs) == 8
        assert all(np.all(np.isfinite(v)) for v in embs.values())


class TestGatherResults:
    def test_gather_results_from_epochs(self, tmp_path):
        """gather_results_from_epochs: per-epoch scoring loop with {epoch}
        substitution (gather_results_from_epochs.sh parity)."""
        from asv_subtools_tpu.io.kaldi import ArkScpWriter

        rng = np.random.default_rng(0)
        spk_means = rng.normal(size=(4, 16)) * 3

        def write_vecs(path_prefix, n_per_spk, noise):
            with ArkScpWriter(path_prefix + ".ark", path_prefix + ".scp", matrix=False) as w:
                for s in range(4):
                    for i in range(n_per_spk):
                        v = spk_means[s] + rng.normal(size=16) * noise
                        w.write(f"spk{s}-u{i}", v.astype(np.float32))

        trials = tmp_path / "trials"
        lines = []
        for s in range(4):
            lines.append(f"spk{s}-u0 spk{s}-u1 target")
            lines.append(f"spk{s}-u0 spk{(s + 1) % 4}-u1 nontarget")
        trials.write_text("\n".join(lines) + "\n")
        u2s = tmp_path / "utt2spk"
        u2s.write_text(
            "\n".join(f"spk{s}-u{i} spk{s}" for s in range(4) for i in range(4))
            + "\n"
        )
        write_vecs(str(tmp_path / "train"), 4, 0.5)
        # two "epochs" with different noise: epoch 2 should score better
        write_vecs(str(tmp_path / "eval_epoch1"), 2, 3.0)
        write_vecs(str(tmp_path / "eval_epoch2"), 2, 0.2)

        launcher = Launcher({"exp_dir": str(tmp_path / "exp")})
        results = launcher.gather_results_from_epochs(
            [1, 2],
            str(tmp_path / "train.scp"),
            str(u2s),
            str(tmp_path / "eval_epoch{epoch}.scp"),
            str(tmp_path / "eval_epoch{epoch}.scp"),
            str(trials),
            classifier="cosine",
        )
        assert set(results) == {1, 2}
        assert results[2]["eer"] <= results[1]["eer"]


class TestReducePSchedule:
    def test_reducep_trains_and_wires_plateau(self, corpus, tmp_path):
        """reduceP through the Launcher: constant base lr + host-side
        ReduceOnPlateau fed by valid loss (reference LRSchedulerWrapper
        'reduceP', lr_scheduler_online.py:89-117)."""
        params = {
            "exp_dir": str(tmp_path / "expP"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 0.5,
                "batch_size": 8,
                "shuffle_buffer": 8,
                "valid_utts": 4,
            },
            "model": {"name": "xvector",
                      "params": {"num_frame_channels": 16, "embd_dim": 8}},
            "loss": {"name": "softmax", "params": {}},
            "train": {
                "epochs": 1,
                "optimizer": {"name": "sgd", "learning_rate": 1e-2},
                "lr_schedule": {"name": "reduceP", "base_lr": 1e-2,
                                "factor": 0.5, "patience": 1},
                "compute_dtype": "float32",
                "report_interval": 100,
            },
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        launcher.build_model()
        state = launcher.train(egs)
        assert state is not None


class TestSpeechAugAndProcessLoader:
    def test_speech_aug_config_through_process_pool(self, corpus, tmp_path):
        """data.speech_aug (the reference's speech_aug yaml shape) and
        data.num_workers>1 (persistent process pool) drive a short train
        through the public Launcher API."""
        from asv_subtools_tpu.data.augment import prepare_speechaug_csv

        rng = np.random.default_rng(3)
        noise_dir = tmp_path / "noise"
        noise_dir.mkdir()
        for i in range(3):
            write_wav(str(noise_dir / f"n{i}.wav"),
                      (rng.normal(size=SR) * 800).astype(np.float32), SR)
        noise_csv = str(tmp_path / "noise.csv")
        assert prepare_speechaug_csv(str(noise_dir), noise_csv) == 3

        params = {
            "exp_dir": str(tmp_path / "exp"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 1.0,
                "batch_size": 8,
                "shuffle_buffer": 16,
                "num_workers": 2,
                "speech_aug": {
                    "mode": "random",
                    "clean_prob": 0.25,
                    "stages": [
                        {"type": "add_noise", "csv": noise_csv,
                         "snr_low": 5.0, "snr_high": 15.0},
                        {"type": "drop_freq"},
                    ],
                },
            },
            "model": {
                "name": "xvector",
                "params": {"num_frame_channels": 32, "embd_dim": 16},
            },
            "loss": {"name": "margin_softmax",
                     "params": {"method": "am", "m": 0.1}},
            "train": {
                "epochs": 2,
                "optimizer": {"name": "adamW", "learning_rate": 5e-3},
                "lr_schedule": {"name": "constant", "base_lr": 5e-3},
                "compute_dtype": "float32",
                "report_interval": 1000,
            },
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        from asv_subtools_tpu.data import MultiprocessLoader

        assert isinstance(egs, MultiprocessLoader)
        launcher.build_model()
        state = launcher.train(egs)
        assert state is not None
        assert int(np.asarray(state.step)) > 0

    def test_speech_aug_from_config_validation(self):
        from asv_subtools_tpu.data.augment import speech_aug_from_config

        assert speech_aug_from_config(None) is None
        assert speech_aug_from_config({}) is None
        with pytest.raises(TypeError, match="unknown speech_aug stage"):
            speech_aug_from_config({"stages": [{"type": "nope"}]})
        aug = speech_aug_from_config(
            {"mode": "chain", "stages": [{"type": "clip"},
                                         {"type": "drop_chunk"}]})
        out = aug(np.random.default_rng(0).normal(size=SR).astype(np.float32),
                  np.random.default_rng(1))
        assert out.shape == (SR,)


class TestOfflineEgsLauncher:
    """The classic offline chunk-egs path through the public Launcher API
    (parity: runSnowdarXvector.py family — preprocess_to_egs.sh egsdir ->
    BaseBunch.get_bunch_from_egsdir -> SimpleTrainer)."""

    @pytest.fixture(scope="class")
    def egs_dir(self, tmp_path_factory):
        from asv_subtools_tpu.data import prepare_egs_dir
        from asv_subtools_tpu.io.kaldi import ArkScpWriter, write_vec_int

        root = tmp_path_factory.mktemp("offline")
        datadir = root / "data"
        datadir.mkdir()
        rng = np.random.default_rng(17)
        u2s, u2f, ali_scp = [], [], []
        ali_ark = str(root / "ali.ark")
        with ArkScpWriter(str(root / "feats.ark"),
                          str(datadir / "feats.scp")) as w:
            for spk in range(4):
                mean = rng.normal(size=24) * 2.0
                for i in range(5):
                    key = f"s{spk}-u{i}"
                    n = int(rng.integers(220, 300))
                    feats = (mean + rng.normal(size=(n, 24))).astype(
                        np.float32)
                    w.write(key, feats)
                    u2s.append(f"{key} spk{spk}")
                    u2f.append(f"{key} {n}")
                    # frame phone labels (ali-to-phones int vectors)
                    off = write_vec_int(
                        ali_ark, rng.integers(0, 10, size=n), key)
                    ali_scp.append(f"{key} {ali_ark}:{off}")
        (datadir / "utt2spk").write_text("\n".join(u2s) + "\n")
        (datadir / "utt2num_frames").write_text("\n".join(u2f) + "\n")
        (root / "ali.scp").write_text("\n".join(ali_scp) + "\n")
        egs = root / "egs"
        feat_dim, num_targets = prepare_egs_dir(
            str(datadir), str(egs), chunk_size=100, valid_num_utts=4,
            valid_chunk_num=2,
        )
        assert (feat_dim, num_targets) == (24, 4)
        return egs

    def test_egsdir_layout(self, egs_dir):
        from asv_subtools_tpu.data import get_info_from_egsdir, read_chunk_csv

        feat_dim, num_targets, train_csv, valid_csv = get_info_from_egsdir(
            str(egs_dir))
        assert (feat_dim, num_targets) == (24, 4)
        train = read_chunk_csv(train_csv)
        valid = read_chunk_csv(valid_csv)
        assert len(train) > 0 and len(valid) > 0
        # valid chunks: sequential, capped at 2/utt, disjoint from train utts
        from collections import Counter
        per_utt = Counter(c.utt for c in valid)
        assert max(per_utt.values()) <= 2
        assert not set(per_utt) & {c.utt for c in train}
        assert all(c.end - c.start == 100 for c in train + valid)

    def _params(self, egs_dir, tmp_path, extra_data=None):
        data = {
            "egs_type": "offline",
            "egs_dir": str(egs_dir),
            "batch_size": 8,
        }
        data.update(extra_data or {})
        return {
            "exp_dir": str(tmp_path / "exp"),
            "data": data,
            "model": {"name": "xvector",
                      "params": {"num_frame_channels": 24, "embd_dim": 16}},
            "loss": {"name": "margin_softmax",
                     "params": {"method": "am", "m": 0.1}},
            "train": {
                "epochs": 2,
                "optimizer": {"name": "adamW", "learning_rate": 5e-3},
                "lr_schedule": {"name": "constant", "base_lr": 5e-3},
                "compute_dtype": "float32",
                "report_interval": 1000,
            },
        }

    def test_offline_train_with_valid(self, egs_dir, tmp_path):
        launcher = Launcher(self._params(egs_dir, tmp_path,
                                         {"aug": "specaugment"}))
        egs = launcher.build_egs()
        from asv_subtools_tpu.data import ChunkEgs

        assert isinstance(egs, ChunkEgs)
        assert launcher.num_targets == 4
        assert launcher.valid_egs is not None
        launcher.build_model()
        state = launcher.train(egs)
        assert int(np.asarray(state.step)) > 0

    def test_offline_train_process_pool(self, egs_dir, tmp_path):
        launcher = Launcher(self._params(egs_dir, tmp_path,
                                         {"num_workers": 2}))
        egs = launcher.build_egs()
        from asv_subtools_tpu.data import MultiprocessLoader

        assert isinstance(egs, MultiprocessLoader)
        launcher.build_model()
        state = launcher.train(egs)
        assert int(np.asarray(state.step)) > 0

    def test_offline_sam_train(self, egs_dir, tmp_path):
        """train.sam routes the two-pass SAM step through the Launcher
        (reference runSnowdarXvectorSAM family)."""
        params = self._params(egs_dir, tmp_path)
        params["train"]["sam"] = {"rho": 0.05}
        launcher = Launcher(params)
        egs = launcher.build_egs()
        launcher.build_model()
        state = launcher.train(egs)
        assert int(np.asarray(state.step)) > 0

    def test_offline_multitask_train(self, egs_dir, tmp_path):
        """data.ali_scp -> ChunkEgsMultiTask dual-label egs + the
        MultiTaskNet speaker+phone heads, end to end through the Launcher
        (reference trainer_mt / egs_multi_task.py path)."""
        params = self._params(egs_dir, tmp_path)
        params["data"]["ali_scp"] = str(egs_dir.parent / "ali.scp")
        params["model"] = {
            "name": "multi_task_xvector",
            "params": {"num_frame_channels": 24, "embd_dim": 16,
                       "num_phones": 10, "mt_alpha": 0.3},
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        from asv_subtools_tpu.data import ChunkEgsMultiTask

        assert isinstance(egs, ChunkEgsMultiTask)
        batch = next(iter(egs))
        assert batch["phone_y"].shape == batch["x"].shape[:2]
        launcher.build_model()
        state = launcher.train(egs)
        assert int(np.asarray(state.step)) > 0

    def test_offline_fd_train_and_extract(self, egs_dir, tmp_path):
        """fd_xvector + data.aux_utt2label -> FD-AL two-optimizer
        alternation through the Launcher (the reference's FD launcher +
        trainer_fd.GanDalAttTrainer workflow)."""
        # aux class per utt (e.g. noise/domain type): 3 classes
        aux_path = tmp_path / "utt2aux"
        from asv_subtools_tpu.data import read_chunk_csv

        utts = sorted({c.utt for c in read_chunk_csv(
            str(egs_dir / "train.egs.csv"))} |
            {c.utt for c in read_chunk_csv(str(egs_dir / "valid.egs.csv"))})
        aux_path.write_text(
            "\n".join(f"{u} {i % 3}" for i, u in enumerate(utts)) + "\n")

        params = self._params(egs_dir, tmp_path)
        params["data"]["aux_utt2label"] = str(aux_path)
        params["model"] = {
            "name": "fd_xvector",
            "params": {"num_frame_channels": 24, "embd_dim": 16,
                       "num_aux_targets": 3},
        }
        params["loss"] = {"name": "softmax", "params": {}}
        params["train"]["fd"] = {"cycle": 4, "adv_steps": 2,
                                 "aux_weight": 0.2, "adv_weight": 0.1}
        launcher = Launcher(params)
        egs = launcher.build_egs()
        batch = next(iter(egs))
        assert "aux_y" in batch and batch["aux_y"].shape == batch["y"].shape
        launcher.build_model()
        from asv_subtools_tpu.train.fd import FDSpeakerNet

        assert isinstance(launcher.net, FDSpeakerNet)
        state = launcher.train(egs)
        assert int(np.asarray(state.step)) > 0
        assert isinstance(state.opt_state, tuple)  # (main, adversary)

    def test_find_lr_through_launcher(self, egs_dir, tmp_path):
        """Launcher.find_lr: the reference launchers' run_lr_finder flag."""
        launcher = Launcher(self._params(egs_dir, tmp_path))
        egs = launcher.build_egs()
        launcher.build_model()
        out = launcher.find_lr(egs, start_lr=1e-6, end_lr=5.0, num_steps=20)
        assert len(out["lrs"]) > 5
        assert np.all(np.isfinite(out["losses"]))


class TestFeatTypeSelection:
    def test_mfcc_pitch_through_launcher_egs(self, corpus, tmp_path):
        """data.feat_type selects the makeFeatures.sh family (here
        mfcc_pitch: 23 ceps + 3 pitch dims) through the public API."""
        params = {
            "exp_dir": str(tmp_path / "exp"),
            "data": {
                "train_wav_scp": str(corpus / "wav.scp"),
                "train_utt2spk": str(corpus / "utt2spk"),
                "chunk_seconds": 0.6,
                "batch_size": 4,
                "shuffle_buffer": 8,
                "feat_type": "mfcc_pitch",
            },
            "model": {"name": "xvector",
                      "params": {"num_frame_channels": 16, "embd_dim": 8}},
            "loss": {"name": "softmax", "params": {}},
        }
        launcher = Launcher(params)
        egs = launcher.build_egs()
        batch = next(iter(egs))
        assert batch["x"].shape[-1] == 13 + 3  # default num_ceps + pitch


class TestEcapaRoadmapPreset:
    def test_two_phase_roadmap_end_to_end(self, corpus, tmp_path):
        """The voxcelebSRC roadmap chain (reference README.md:62-76) as
        shipped presets, scaled down: phase 1 trains ECAPA with AAM +
        top-k adaptive margin + sub-center + MQMHA pooling; phase 2
        (ecapa_roadmap_lm.yaml semantics) transfer-loads everything but
        the classifier from the phase-1 checkpoint and finetunes with a
        larger margin, longer chunks, constant low LR."""
        import os

        from asv_subtools_tpu.utils.params import load_yaml

        base = load_yaml("recipes/configs/ecapa_roadmap.yaml")
        lm = load_yaml("recipes/configs/ecapa_roadmap_lm.yaml")
        # the presets carry production scale; shrink uniformly
        tiny_model = {"name": "ecapa_tdnn",
                      "params": dict(base["model"]["params"],
                                     channels=32, embd_dim=16, mfa_conv=48)}
        common_data = {
            "train_wav_scp": str(corpus / "wav.scp"),
            "train_utt2spk": str(corpus / "utt2spk"),
            "batch_size": 8,
            "shuffle_buffer": 8,
            "chunk_seconds": 0.6,
        }
        p1 = {
            "exp_dir": str(tmp_path / "exp_roadmap"),
            "data": common_data,
            "model": tiny_model,
            # topk must not exceed the tiny corpus's 4 classes
            "loss": {"name": base["loss"]["name"],
                     "params": dict(base["loss"]["params"], topk=3)},
            "train": {
                "epochs": 2,
                "optimizer": {"name": "adamW", "learning_rate": 2e-3},
                "lr_schedule": {"name": "1cycle", "max_lr": 2e-3,
                                "total_steps": 24},
                "margin_warm": dict(base["train"]["margin_warm"],
                                    epoch_iter=3),
                "report_interval": 100,
            },
        }
        l1 = Launcher(p1)
        egs1 = l1.build_egs()
        l1.build_model()
        # the preset's loss tricks are live: sub-center + topk
        assert l1.params["loss"]["params"]["sub_k"] == 2
        assert l1.params["loss"]["params"]["adapt_method"] == "topk"
        state1 = l1.train(egs1)
        ckpt = os.path.join(p1["exp_dir"], "checkpoints", "2.params")
        assert os.path.exists(ckpt)

        p2 = {
            "exp_dir": str(tmp_path / "exp_roadmap_lm"),
            "data": dict(common_data, chunk_seconds=1.0),
            "model": tiny_model,
            "loss": {"name": lm["loss"]["name"],
                     "params": dict(lm["loss"]["params"], topk=3)},
            "train": {
                "epochs": 1,
                "optimizer": {"name": "adamW", "learning_rate": 2e-5},
                "lr_schedule": {"name": "constant", "base_lr": 2e-5},
                "transfer": {"from": ckpt, "exclude": ["loss"]},
                "report_interval": 100,
            },
        }
        l2 = Launcher(p2)
        egs2 = l2.build_egs()
        l2.build_model()
        assert l2.params["loss"]["params"]["m"] == 0.5  # enlarged margin
        state2 = l2.train(egs2)

        # the transfer actually carried the phase-1 backbone: the trained
        # phase-2 params start from (and stay near, at lr 2e-5) phase 1,
        # while a fresh init would differ at O(0.1)
        import jax

        flat1 = jax.tree_util.tree_leaves(
            jax.device_get(state1.params["backbone"]))
        flat2 = jax.tree_util.tree_leaves(
            jax.device_get(state2.params["backbone"]))
        max_drift = max(
            float(np.abs(np.asarray(x) - np.asarray(y)).max())
            for x, y in zip(flat1, flat2)
        )
        assert max_drift < 5e-3, max_drift  # finetune at lr 2e-5
        # extraction works on the finetuned model (mqmha pooling path)
        stats = l2.extract(str(corpus / "eval.scp"),
                           str(tmp_path / "xv_lm"), state2)
        assert stats["utts"] == 8


class TestModelWarmupWiring:
    def test_model_warmup_steps_reaches_the_train_step(self, corpus, tmp_path):
        """Regression (r4): train.model_warmup_steps was silently dropped
        by the Launcher — the reference transformer path depends on the
        encoder layer-bypass warmup (trainer_online.py:227). With a huge
        warmup the early-step encoder blends alpha~0.1 of each block; the
        trained params must therefore DIFFER from a warmup-off run on the
        identical seed/data."""
        import jax

        def run(warmup_steps):
            params = {
                "exp_dir": str(tmp_path / f"exp_w{warmup_steps}"),
                "data": {
                    "train_wav_scp": str(corpus / "wav.scp"),
                    "train_utt2spk": str(corpus / "utt2spk"),
                    "chunk_seconds": 0.6, "batch_size": 8,
                    "shuffle_buffer": 8, "num_bins": 40,
                },
                "model": {"name": "conformer_xvector",
                          "params": {"attention_dim": 32,
                                     "attention_heads": 2,
                                     "num_blocks": 1, "linear_units": 64,
                                     "embd_dim": 16}},
                "loss": {"name": "softmax", "params": {}},
                "train": {"epochs": 1,
                          "optimizer": {"name": "adamW",
                                        "learning_rate": 1e-3},
                          "lr_schedule": {"name": "constant",
                                          "base_lr": 1e-3},
                          "model_warmup_steps": warmup_steps,
                          "report_interval": 100},
            }
            l = Launcher(params)
            egs = l.build_egs()
            l.build_model()
            state = l.train(egs)
            return jax.device_get(state.params)

        p_warm = run(100000)  # alpha ~0.1 for the whole short run
        p_off = run(0)
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree_util.tree_leaves(p_warm),
                            jax.tree_util.tree_leaves(p_off))
        ]
        assert max(diffs) > 1e-4, (
            "model_warmup_steps had no effect on training"
        )

"""Tests: datadir utilities, classifiers (SVM/LR/GMM), fusion, multi-task
models, LR finder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asv_subtools_tpu.backend import (
    DiagGmm,
    compute_eer,
    gmm_lid_scores,
    greedy_fusion,
    lda_fusion,
    logistic_fusion,
    train_diag_gmm,
    train_logistic_regression,
    train_svm,
    weight_fusion,
)
from asv_subtools_tpu.datadir import DataDir, generate_trials
from asv_subtools_tpu.models import (
    FDXvector,
    MultiTaskXvector,
    fd_adversarial_loss,
    phone_frame_loss,
)

KEY = jax.random.PRNGKey(0)


@pytest.fixture
def datadir():
    tables = {
        "wav.scp": {f"s{s}-u{i}": f"/x/{s}_{i}.wav" for s in range(4) for i in range(5)},
        "utt2spk": {f"s{s}-u{i}": f"spk{s}" for s in range(4) for i in range(5)},
        "utt2num_frames": {
            f"s{s}-u{i}": str(100 + 100 * i) for s in range(4) for i in range(5)
        },
    }
    return DataDir(tables)


class TestDataDir:
    def test_roundtrip(self, datadir, tmp_path):
        datadir.write(str(tmp_path / "data"))
        back = DataDir.read(str(tmp_path / "data"))
        assert back.utts == datadir.utts
        assert back.speakers == ["spk0", "spk1", "spk2", "spk3"]
        assert (tmp_path / "data" / "spk2utt").exists()

    def test_filter_and_remove(self, datadir):
        kept = datadir.filter_speakers(["spk0", "spk1"])
        assert len(kept) == 10 and kept.speakers == ["spk0", "spk1"]
        removed = datadir.remove_utts(["s0-u0"])
        assert len(removed) == 19

    def test_prefix(self, datadir):
        p = datadir.add_prefix("noise-")
        assert all(u.startswith("noise-") for u in p.utts)
        assert all(s.startswith("noise-") for s in p.speakers)

    def test_subset(self, datadir):
        assert len(datadir.subset(num_utts=7)) == 7
        assert len(datadir.subset(num_spks=2).speakers) == 2
        per = datadir.subset(num_utts=2, per_spk=True)
        assert len(per) == 8

    def test_split_by_length(self, datadir):
        short, long_ = datadir.split_by_length(300)
        assert len(short) + len(long_) == 20
        assert all(int(datadir.tables["utt2num_frames"][u]) < 300 for u in short.utts)

    def test_split_and_combine(self, datadir):
        parts = datadir.split(3)
        assert sum(len(p) for p in parts) == 20
        combined = parts[0].combine(parts[1]).combine(parts[2])
        assert sorted(combined.utts) == sorted(datadir.utts)

    def test_valid_split(self, datadir):
        train, valid = datadir.valid_split(num_utts=4, min_per_spk=2)
        assert len(valid) == 4 and len(train) == 16
        for s, us in train.spk2utt().items():
            assert len(us) >= 2

    def test_generate_trials(self, datadir):
        trials = generate_trials(datadir, num_targets_per_spk=3, num_nontargets_per_utt=2)
        u2s = datadir.utt2spk()
        for a, b, t in trials:
            assert (u2s[a] == u2s[b]) == bool(t)


class TestClassifiers:
    def _blobs(self, seed=0, n=100, c=3, d=8):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(c, d)) * 4
        y = np.repeat(np.arange(c), n)
        x = centers[y] + rng.normal(size=(c * n, d))
        return x, y

    def test_svm_and_lr(self):
        x, y = self._blobs()
        for train in (train_svm, train_logistic_regression):
            clf = train(x, y)
            acc = (clf.predict(x) == y).mean()
            assert acc > 0.95
            assert clf.scores(x).shape == (len(x), 3)

    def test_gmm_em_recovers_components(self):
        rng = np.random.default_rng(1)
        x = np.concatenate(
            [rng.normal(-3, 0.5, (200, 2)), rng.normal(3, 0.5, (200, 2))]
        )
        gmm = train_diag_gmm(x, num_components=2, num_iters=30)
        means = np.sort(gmm.means[:, 0])
        np.testing.assert_allclose(means, [-3, 3], atol=0.3)
        ll = gmm.log_likelihood(x)
        assert np.all(np.isfinite(ll))

    def test_gmm_lid(self):
        rng = np.random.default_rng(2)
        gmms = {}
        evals, labels = [], []
        for i, lang in enumerate(["en", "zh"]):
            data = rng.normal(4 * i, 1.0, (150, 4))
            gmms[lang] = train_diag_gmm(data, num_components=4)
            evals.append(rng.normal(4 * i, 1.0, (50, 4)))
            labels += [i] * 50
        scores, langs = gmm_lid_scores(gmms, np.concatenate(evals))
        pred = np.argmax(scores, axis=1)
        assert (pred == np.asarray(labels)).mean() > 0.95


class TestFusion:
    def _systems(self, seed=3):
        rng = np.random.default_rng(seed)
        n = 2000
        labels = (rng.uniform(size=n) < 0.3).astype(int)
        # two noisy views of the truth + one junk system
        s1 = labels * 2.0 + rng.normal(size=n)
        s2 = labels * 1.5 + rng.normal(size=n) * 1.2
        junk = rng.normal(size=n)
        return [s1, s2, junk], labels

    def test_weight_fusion(self):
        (s1, s2, junk), labels = self._systems()
        fused = weight_fusion([s1, s2], [0.5, 0.5])
        e_f, _ = compute_eer(fused, labels)
        e_1, _ = compute_eer(s1, labels)
        assert e_f < e_1

    @pytest.mark.parametrize("fn", [lda_fusion, logistic_fusion, greedy_fusion])
    def test_trained_fusions_beat_best_single(self, fn):
        systems, labels = self._systems()
        w, fused = fn(systems, labels)
        e_f, _ = compute_eer(fused, labels)
        best_single = min(compute_eer(s, labels)[0] for s in systems)
        assert e_f <= best_single + 0.005
        # junk system gets (near-)zero weight
        assert abs(np.asarray(w, float)[2]) < 0.5 * max(abs(np.asarray(w, float)[0]), 1e-9)


class TestMultiTask:
    def test_multitask_forward_and_losses(self):
        from asv_subtools_tpu.models import MultiTaskNet

        net = MultiTaskNet(
            backbone=MultiTaskXvector(num_frame_channels=16, embd_dim=8),
            num_targets=5, num_phones=10,
        )
        x = jax.random.normal(KEY, (2, 30, 12))
        mask = jnp.arange(30)[None, :] < jnp.array([30, 20])[:, None]
        targets = {
            "spk": jnp.zeros((2,), jnp.int32),
            # includes an out-of-range label: must be clamped, not NaN
            "phone": jnp.full((2, 30), 11, jnp.int32),
        }
        v = net.init({"params": KEY}, x, targets, mask=mask, train=False)
        loss, logits, emb = net.apply(v, x, targets, mask=mask, train=False)
        assert emb.shape == (2, 8)
        assert logits.shape == (2, 5)
        assert np.isfinite(float(loss))
        # phone_frame_loss directly: masked mean + clamping
        pl = jax.random.normal(KEY, (2, 30, 10))
        pt = jnp.zeros((2, 30), jnp.int32)
        assert np.isfinite(float(phone_frame_loss(pl, pt, mask)))

    def test_multitask_egs_through_trainer(self, tmp_path):
        """ChunkEgsMultiTask dual-label batches drive Trainer.run_epoch and
        validate() end-to-end: phone_y folds into dict targets {spk, phone}
        (trainer_mt semantics) and validation reports speaker metrics."""
        import optax

        from asv_subtools_tpu.data import ChunkEgsMultiTask
        from asv_subtools_tpu.data.egs_offline import Chunk
        from asv_subtools_tpu.io import ArkScpWriter
        from asv_subtools_tpu.models import MultiTaskNet
        from asv_subtools_tpu.train.trainer import (
            Trainer,
            TrainStepConfig,
        )

        rng = np.random.default_rng(0)
        feat_ark = str(tmp_path / "feats.ark")
        feat_scp = str(tmp_path / "feats.scp")
        ali_ark = str(tmp_path / "ali.ark")
        ali_scp = str(tmp_path / "ali.scp")
        n_utts, T, D, n_ph = 16, 60, 12, 7
        with ArkScpWriter(feat_ark, feat_scp) as wf, \
                ArkScpWriter(ali_ark, ali_scp) as wa:
            for i in range(n_utts):
                wf.write(f"u{i}", rng.normal(size=(T, D)).astype(np.float32))
                wa.write(
                    f"u{i}",
                    rng.integers(0, n_ph, size=(T, 1)).astype(np.float32),
                )
        feat_rx = dict(l.split(None, 1) for l in open(feat_scp).read().splitlines())
        ali_rx = dict(l.split(None, 1) for l in open(ali_scp).read().splitlines())
        chunks = [Chunk(f"u{i}", feat_rx[f"u{i}"], 0, 40, i % 4)
                  for i in range(n_utts)]
        egs = ChunkEgsMultiTask(chunks, ali_rx, batch_size=8)
        batch0 = next(iter(egs))
        assert batch0["phone_y"].shape == (8, 40)

        net = MultiTaskNet(
            backbone=MultiTaskXvector(num_frame_channels=16, embd_dim=8),
            num_targets=4, num_phones=n_ph,
        )
        trainer = Trainer(
            net, optax.sgd(0.05),
            config=TrainStepConfig(
                compute_dtype=jnp.float32, max_change=1e4
            ),
        )
        state = trainer.init_state(
            jax.random.PRNGKey(0),
            {"x": batch0["x"],
             "y": {"spk": batch0["y"], "phone": batch0["phone_y"]}},
        )
        state, metrics = trainer.run_epoch(
            state, egs, jax.random.PRNGKey(1), epoch=0
        )
        assert np.isfinite(metrics["loss"])
        val = trainer.validate(state, iter(egs))
        assert np.isfinite(val["loss"]) and 0.0 <= val["accuracy"] <= 1.0

    def test_fd_adversarial(self):
        model = FDXvector(num_frame_channels=16, embd_dim=8)
        x = jax.random.normal(KEY, (2, 30, 12))
        v = model.init({"params": KEY}, x, train=False)
        spk, content = model.apply(v, x, train=False)
        assert spk.shape == content.shape == (2, 8)
        adv = fd_adversarial_loss(spk, content)
        assert 0.0 <= float(adv) <= 1.0


class TestLrFinder:
    def test_sweep_finds_reasonable_lr(self):
        from asv_subtools_tpu.models import SpeakerNet, Xvector
        from asv_subtools_tpu.train import (
            TrainStepConfig,
            get_optimizer,
            init_train_state,
            make_train_step,
            run_lr_finder,
        )

        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=8),
            loss_name="softmax",
            loss_params={},
            num_targets=4,
        )
        tx = get_optimizer("sgd", learning_rate=1.0)  # lr_scale IS the lr
        step = jax.jit(
            make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32)),
            static_argnames=(),
        )

        def step_fn(state, batch, rng, lr):
            return step(state, batch, rng, 1.0, 0.0, lr)

        rng = np.random.default_rng(0)
        batches = [
            {
                "x": jnp.asarray(rng.normal(size=(8, 20, 8)), jnp.float32),
                "y": jnp.asarray(rng.integers(0, 4, 8)),
            }
            for _ in range(40)
        ]
        state = init_train_state(net, KEY, batches[0], tx)
        out = run_lr_finder(
            step_fn, state, iter(batches), KEY, start_lr=1e-6, end_lr=10.0,
            num_steps=40,
        )
        assert len(out["lrs"]) > 10
        assert out["suggested_lr"] is None or 1e-6 <= out["suggested_lr"] <= 10.0


class TestSmallComponents:
    def test_gru_important_multi_chunksep(self):
        import jax.numpy as jnp
        from asv_subtools_tpu import nn as annex2

        x = jax.random.normal(KEY, (2, 10, 8))
        for mod, shape in [
            (annex2.GruAffine(6), (2, 10, 6)),
            (annex2.ImportantScale(), (2, 10, 8)),
            (annex2.MultiAffine(6), (2, 10, 6)),
            (annex2.ChunkSeparationAffine(6), (2, 10, 6)),
        ]:
            v = mod.init({"params": KEY}, x)
            y = mod.apply(v, x)
            assert y.shape == shape, type(mod)
            assert np.all(np.isfinite(np.asarray(y)))


class TestFigures:
    def test_det_and_dist_plots(self, tmp_path):
        from asv_subtools_tpu.backend import det_curve_points, plot_det, plot_score_distribution

        rng = np.random.default_rng(0)
        scores = np.concatenate([rng.normal(2, 1, 500), rng.normal(0, 1, 500)])
        labels = np.concatenate([np.ones(500), np.zeros(500)])
        x, y = det_curve_points(scores, labels)
        assert len(x) == len(y) > 0
        p = plot_det([("sys", scores, labels)], str(tmp_path / "det.png"))
        if p:  # matplotlib present
            import os
            assert os.path.getsize(p) > 0
        plot_score_distribution(scores, labels, str(tmp_path / "dist.png"))


class TestCavgUnknown:
    def test_unknown_counts_as_nontarget(self):
        from asv_subtools_tpu.backend import compute_cavg

        pairs = [(0, 0, 1.0)] * 5 + [(0, -1, 1.0)] * 5  # unknowns accepted by lang 0
        _, c_known = compute_cavg(pairs, 2, unknown_as_nontarget=False)
        _, c_unknown = compute_cavg(pairs, 2, unknown_as_nontarget=True)
        assert c_unknown > c_known  # false alarms on unknowns now penalized


class TestMixupTrainStep:
    def test_mixup_step_trains(self):
        import jax.numpy as jnp
        from asv_subtools_tpu.models import SpeakerNet, Xvector
        from asv_subtools_tpu.train import (
            TrainStepConfig, get_optimizer, init_train_state, make_train_step,
        )

        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=8),
            loss_name="softmax", loss_params={}, num_targets=4,
        )
        tx = get_optimizer("sgd", learning_rate=1e-2)
        step = jax.jit(make_train_step(net, tx, config=TrainStepConfig(
            compute_dtype=jnp.float32, mixup_alpha=0.5)))
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.normal(size=(8, 20, 8)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 4, 8)),
        }
        state = init_train_state(net, KEY, batch, tx)

        def eval_loss(st):
            loss, _, _ = net.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                batch["x"], batch["y"], train=False,
            )
            return float(loss)

        before = eval_loss(state)
        k = KEY
        for _ in range(20):
            k, s = jax.random.split(k)
            state, m = step(state, batch, s)
        # mixup per-step losses are stochastic (lam varies); judge on the
        # deterministic eval loss instead
        assert np.isfinite(float(m["loss"]))
        assert eval_loss(state) < before


class TestMmiGmm:
    def test_mmi_improves_discrimination(self):
        from asv_subtools_tpu.backend.classifiers import (
            gmm_lid_scores,
            train_diag_gmm,
            train_diag_gmm_mmi,
        )

        rng = np.random.default_rng(0)
        # overlapping classes: ML GMMs confusable, MMI should sharpen
        x0 = rng.normal(0.0, 1.0, (300, 4))
        x1 = rng.normal(1.2, 1.0, (300, 4))
        x = np.concatenate([x0, x1])
        y = np.concatenate([np.zeros(300, int), np.ones(300, int)])
        gmms = {
            "a": train_diag_gmm(x0, num_components=2, num_iters=15),
            "b": train_diag_gmm(x1, num_components=2, num_iters=15),
        }
        scores_ml, _ = gmm_lid_scores(gmms, x)
        acc_ml = ((scores_ml.argmax(1) == y).mean())
        mmi = train_diag_gmm_mmi(gmms, x, y, num_iters=4)
        scores_mmi, _ = gmm_lid_scores({k: mmi[k] for k in mmi}, x)
        acc_mmi = (scores_mmi.argmax(1) == y).mean()
        assert np.all(np.isfinite(scores_mmi))
        assert acc_mmi >= acc_ml - 0.01  # at worst equal, typically better


class TestFeatsOps:
    def test_paste_concat_select_cut(self):
        from asv_subtools_tpu.datadir import (
            concat_sp_feats, cut_utt_random, paste_feats, select_feats,
            split_enroll_test_by_trials,
        )

        rng = np.random.default_rng(0)
        fb = {f"u{i}": rng.normal(size=(50 + i, 4)).astype(np.float32) for i in range(3)}
        pit = {f"u{i}": rng.normal(size=(50 + i, 2)).astype(np.float32) for i in range(3)}
        pasted = paste_feats([fb, pit])
        assert pasted["u0"].shape == (50, 6)
        sel = select_feats(pasted, [0, 5])
        assert sel["u1"].shape == (51, 2)
        cat = concat_sp_feats(fb, {"u0": "a", "u1": "a", "u2": "b"})
        assert cat["a"].shape[0] == 50 + 51
        cut = cut_utt_random(fb, 40)
        assert all(v.shape[0] <= 40 for v in cut.values())

    def test_split_by_trials(self, datadir):
        from asv_subtools_tpu.datadir import generate_trials, split_enroll_test_by_trials

        trials = generate_trials(datadir, 2, 2)
        enr, tst = split_enroll_test_by_trials(datadir, trials)
        assert len(enr) > 0 and len(tst) > 0


class TestScoreTables:
    def test_table_roundtrip(self):
        from asv_subtools_tpu.backend.trials import (
            Trials, scores_to_table, table_to_scores,
        )

        tr = Trials(["e1", "e1", "e2"], ["t1", "t2", "t2"], None)
        scores = np.asarray([0.5, -0.2, 0.9])
        ek, tk, table = scores_to_table(tr, scores)
        assert np.isnan(table).sum() == 1  # (e2, t1) missing
        tr2, s2 = table_to_scores(ek, tk, table)
        assert len(s2) == 3 and set(s2.round(2)) == {0.5, -0.2, 0.9}

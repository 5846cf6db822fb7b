"""Back-end tests: synthetic end-to-end SV experiment + unit numerics.

Synthetic data follows the PLDA generative model (speaker mean ~ N(0, B),
utterance ~ N(speaker, W)), so a correct PLDA implementation must separate
targets from nontargets far better than chance and beat plain cosine when
within-class covariance is anisotropic.
"""

import numpy as np
import pytest

from asv_subtools_tpu.backend import (
    Plda,
    PldaStats,
    Trials,
    TwoCovPlda,
    ZCAWhitening,
    adapt_plda_cip,
    adapt_plda_coral,
    adapt_plda_coral_plus,
    adapt_plda_lip,
    adapt_plda_unsupervised,
    apply_lda,
    asnorm,
    compute_cavg,
    compute_eer,
    compute_min_dcf,
    compute_min_tdcf,
    cosine_score_matrix,
    estimate_plda,
    global_mean,
    length_norm,
    snorm,
    speaker_means,
    train_lda,
)


def synth_data(rng, n_spk=40, n_utt=10, dim=16, within_scale=None):
    """PLDA generative model data. Returns (vectors, spk_ids)."""
    if within_scale is None:
        within_scale = np.linspace(0.2, 2.0, dim)
    spk_means = rng.normal(size=(n_spk, dim)) * 1.5
    ids = np.repeat(np.arange(n_spk), n_utt)
    noise = rng.normal(size=(n_spk * n_utt, dim)) * np.sqrt(within_scale)
    return spk_means[ids] + noise, ids


class TestTransforms:
    def test_speaker_means(self):
        rng = np.random.default_rng(0)
        x, ids = synth_data(rng, n_spk=5, n_utt=4)
        means, counts = speaker_means(x, ids)
        assert means.shape == (5, 16)
        np.testing.assert_allclose(counts, 4.0)
        np.testing.assert_allclose(means[2], x[ids == 2].mean(0), rtol=1e-5)

    def test_length_norm(self):
        x = np.random.default_rng(0).normal(size=(7, 16))
        y = length_norm(x)
        np.testing.assert_allclose(np.linalg.norm(y, axis=1), np.sqrt(16), rtol=1e-5)

    def test_lda_improves_separation(self):
        rng = np.random.default_rng(1)
        x, ids = synth_data(rng)
        t = train_lda(x, ids, lda_dim=8)
        assert t.shape == (16, 8)
        proj = apply_lda(x, t, mean=global_mean(x))
        # Fisher ratio in projected space should be higher than raw average
        def fisher(v, ids):
            m, _ = speaker_means(v, ids)
            gm = v.mean(0)
            between = np.var(m - gm, axis=0).sum()
            within = np.mean([np.var(v[ids == s], axis=0).sum() for s in np.unique(ids)])
            return between / within

        assert fisher(proj, ids) > fisher(x, ids)

    def test_zca_whitening_unit_cov(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(500, 8)) @ rng.normal(size=(8, 8))
        z = ZCAWhitening().fit(x)
        w = z.transform(x)
        cov = np.cov(w.T)
        np.testing.assert_allclose(cov, np.eye(8), atol=0.15)


class TestMetrics:
    def test_eer_perfect_and_chance(self):
        s = np.array([1.0, 0.9, 0.8, 0.1, 0.05, 0.0])
        l = np.array([1, 1, 1, 0, 0, 0])
        eer, _ = compute_eer(s, l)
        assert eer == pytest.approx(0.0, abs=1e-9)
        rng = np.random.default_rng(3)
        s = rng.normal(size=20000)
        l = (np.arange(20000) % 2 == 0).astype(int)
        eer, _ = compute_eer(s, l)
        assert eer == pytest.approx(0.5, abs=0.02)

    def test_eer_overlapping_gaussians(self):
        """EER of equal-variance Gaussians at d' separation = Phi(-d'/2)."""
        rng = np.random.default_rng(4)
        n = 100000
        tar = rng.normal(2.0, 1.0, n)
        non = rng.normal(0.0, 1.0, n)
        scores = np.concatenate([tar, non])
        labels = np.concatenate([np.ones(n), np.zeros(n)])
        eer, thr = compute_eer(scores, labels)
        from math import erf, sqrt

        expected = 0.5 * (1 + erf(-1.0 / sqrt(2)))  # Phi(-1) ~ 0.1587
        assert eer == pytest.approx(expected, abs=0.01)
        assert thr == pytest.approx(1.0, abs=0.05)

    def test_min_dcf_bounds(self):
        rng = np.random.default_rng(5)
        tar = rng.normal(2.0, 1.0, 5000)
        non = rng.normal(0.0, 1.0, 5000)
        scores = np.concatenate([tar, non])
        labels = np.concatenate([np.ones(5000), np.zeros(5000)])
        dcf, _ = compute_min_dcf(scores, labels, p_target=0.01)
        assert 0.0 < dcf < 1.0

    def test_cavg_separable(self):
        # 3 langs, perfectly separable scores
        pairs = []
        for lang in range(3):
            for true in range(3):
                for _ in range(10):
                    pairs.append((lang, true, 1.0 if lang == true else -1.0))
        _, min_cavg = compute_cavg(pairs, 3)
        assert min_cavg == pytest.approx(0.0, abs=1e-9)

    def test_min_tdcf_runs(self):
        rng = np.random.default_rng(6)
        asv_s = np.concatenate([rng.normal(2, 1, 500), rng.normal(0, 1, 500), rng.normal(-1, 1, 500)])
        asv_l = np.concatenate([np.ones(500), np.zeros(500), -np.ones(500)])
        cm_s = np.concatenate([rng.normal(1.5, 1, 500), rng.normal(-1.5, 1, 500)])
        cm_l = np.concatenate([np.ones(500), np.zeros(500)])
        t = compute_min_tdcf(asv_s, asv_l, cm_s, cm_l)
        assert 0.0 <= t < 1.0


class TestPlda:
    N_ENROLL = 100
    N_NON = 200

    def _experiment(self, seed=7):
        rng = np.random.default_rng(seed)
        train_x, train_ids = synth_data(rng, n_spk=80, n_utt=12)
        # disjoint eval speakers
        ne, nn = self.N_ENROLL, self.N_NON
        enroll_means = rng.normal(size=(ne, 16)) * 1.5
        within = np.linspace(0.2, 2.0, 16)
        enroll = enroll_means + rng.normal(size=(ne, 16)) * np.sqrt(within)
        test_target = enroll_means + rng.normal(size=(ne, 16)) * np.sqrt(within)
        test_nontarget = rng.normal(size=(nn, 16)) * 1.5 + rng.normal(
            size=(nn, 16)
        ) * np.sqrt(within)
        return train_x, train_ids, enroll, test_target, test_nontarget

    def test_em_recovers_structure_and_scores(self):
        train_x, train_ids, enroll, tt, tn = self._experiment()
        stats = PldaStats.from_vectors(train_x, train_ids)
        plda = estimate_plda(stats, num_em_iters=10)
        assert plda.psi.shape == (16,)
        assert np.all(plda.psi > 0)
        # within-class covariance in transformed space ~ identity:
        # transform @ within @ transform.T = I by construction of training data
        test = np.concatenate([tt, tn])
        llr = (
            plda.llr_matrix(
                plda.transform_vectors(enroll), plda.transform_vectors(test)
            )
        )
        ne, nn = self.N_ENROLL, self.N_NON
        labels = np.zeros((ne, ne + nn), int)
        labels[np.arange(ne), np.arange(ne)] = 1
        eer, _ = compute_eer(llr.ravel(), labels.ravel())
        assert eer < 0.06, f"PLDA EER too high: {eer}"

    def test_plda_beats_cosine_on_anisotropic(self):
        train_x, train_ids, enroll, tt, tn = self._experiment(seed=8)
        stats = PldaStats.from_vectors(train_x, train_ids)
        plda = estimate_plda(stats)
        test = np.concatenate([tt, tn])
        ne, nn = self.N_ENROLL, self.N_NON
        labels = np.zeros((ne, ne + nn), int)
        labels[np.arange(ne), np.arange(ne)] = 1
        llr = plda.llr_matrix(
            plda.transform_vectors(enroll), plda.transform_vectors(test)
        )
        cos = np.asarray(cosine_score_matrix(enroll, test))
        eer_plda, _ = compute_eer(llr.ravel(), labels.ravel())
        eer_cos, _ = compute_eer(cos.ravel(), labels.ravel())
        assert eer_plda <= eer_cos + 0.01

    def test_llr_matrix_matches_pairwise(self):
        """Vectorized matrix must equal the reference's per-pair formula."""
        rng = np.random.default_rng(9)
        plda = Plda(
            mean=rng.normal(size=8),
            transform=rng.normal(size=(8, 8)),
            psi=np.abs(rng.normal(size=8)) + 0.5,
        )
        e = plda.transform_vectors(rng.normal(size=(4, 8)))
        t = plda.transform_vectors(rng.normal(size=(5, 8)))
        mat = plda.llr_matrix(e, t)

        # per-pair scalar computation (plda_base.py:109-136)
        def pair_llr(ev, tv, n=1.0):
            psi = plda.psi
            mean = n * psi / (n * psi + 1.0) * ev
            var = 1.0 + psi / (n * psi + 1.0)
            logdet = np.sum(np.log(var))
            g = -0.5 * (logdet + 8 * 1.8378770664093454 + np.sum((tv - mean) ** 2 / var))
            var0 = psi + 1.0
            n0 = -0.5 * (np.sum(np.log(var0)) + 8 * 1.8378770664093454 + np.sum(tv**2 / var0))
            return g - n0

        for i in range(4):
            for j in range(5):
                assert mat[i, j] == pytest.approx(pair_llr(e[i], t[j]), rel=1e-4)

    def test_multi_enroll_counts(self):
        rng = np.random.default_rng(10)
        plda = Plda(
            mean=np.zeros(8),
            transform=np.eye(8),
            psi=np.ones(8),
        )
        e = plda.transform_vectors(rng.normal(size=(3, 8)), num_examples=np.array([1, 3, 5]))
        assert np.all(np.isfinite(e))
        mat = plda.llr_matrix(e, e[:2], enroll_counts=np.array([1, 3, 5]))
        assert mat.shape == (3, 2)


class TestScoreNorm:
    def test_snorm_centers_impostor_scores(self):
        rng = np.random.default_rng(11)
        raw = rng.normal(size=(10, 20))
        ec = rng.normal(size=(10, 100))
        tc = rng.normal(size=(20, 100))
        out = snorm(raw, ec, tc)
        assert out.shape == raw.shape
        assert abs(out.mean()) < 0.5

    def test_asnorm_topn_selects_hardest(self):
        rng = np.random.default_rng(12)
        raw = rng.normal(size=(4, 6))
        ec = rng.normal(size=(4, 50))
        tc = rng.normal(size=(6, 50))
        out_all = asnorm(raw, ec, tc, top_n=50)
        out_top = asnorm(raw, ec, tc, top_n=10)
        np.testing.assert_allclose(out_all, snorm(raw, ec, tc), rtol=1e-6)
        assert not np.allclose(out_all, out_top)
        # top-N uses larger cohort scores -> larger means -> lower normed
        assert out_top.mean() < out_all.mean()

    def test_asnorm_cross_select_shapes(self):
        rng = np.random.default_rng(13)
        raw = rng.normal(size=(4, 6))
        ec = rng.normal(size=(4, 50))
        tc = rng.normal(size=(6, 50))
        out = asnorm(raw, ec, tc, top_n=10, cross_select=True)
        assert out.shape == (4, 6)
        assert np.all(np.isfinite(out))

    def test_asnorm_improves_shifted_eer(self):
        """AS-norm should fix a per-enroll score shift that hurts pooled EER."""
        rng = np.random.default_rng(14)
        e, t, c = 20, 40, 200
        shift = rng.normal(size=(e, 1)) * 3.0
        labels = np.zeros((e, t), int)
        labels[np.arange(e), np.arange(e)] = 1
        raw = rng.normal(size=(e, t)) + labels * 4.0 + shift
        ec = rng.normal(size=(e, c)) + shift
        tc = rng.normal(size=(t, c))
        eer_raw, _ = compute_eer(raw.ravel(), labels.ravel())
        out = asnorm(raw, ec, tc, top_n=100)
        eer_norm, _ = compute_eer(out.ravel(), labels.ravel())
        assert eer_norm < eer_raw


class TestAdaptation:
    def _plda_and_domain(self, seed=15):
        rng = np.random.default_rng(seed)
        x, ids = synth_data(rng, n_spk=60, n_utt=10)
        plda = estimate_plda(PldaStats.from_vectors(x, ids))
        # shifted/scaled new domain
        adapt = rng.normal(size=(300, 16)) * 2.0 + 1.5
        return plda, adapt, rng

    def test_unsupervised_adapts_mean(self):
        plda, adapt, _ = self._plda_and_domain()
        new = adapt_plda_unsupervised(plda, adapt)
        np.testing.assert_allclose(new.mean, adapt.mean(0), rtol=1e-6)
        assert np.all(np.isfinite(new.transform))
        assert np.all(new.psi > 0)

    def test_coral_family(self):
        plda, adapt, rng = self._plda_and_domain(16)
        two = TwoCovPlda.from_scoring_form(plda)
        # round trip
        back = two.to_scoring_form()
        np.testing.assert_allclose(np.sort(back.psi), np.sort(plda.psi), rtol=1e-5)

        coral = adapt_plda_coral(two, adapt)
        assert np.all(np.isfinite(coral.within_var))
        plus = adapt_plda_coral_plus(two, adapt)
        lip = adapt_plda_lip(two, coral, interpolation_weight=0.7)
        cip = adapt_plda_cip(two, coral, adapt, interpolation_weight=0.7)
        for m in (coral, plus, lip, cip):
            scoring = m.to_scoring_form()
            assert np.all(scoring.psi > 0)


class TestTrials:
    def test_roundtrip(self, tmp_path):
        tr = Trials(["e1", "e1", "e2"], ["t1", "t2", "t1"], [1, 0, 0])
        p = str(tmp_path / "trials")
        tr.write(p)
        tr2 = Trials.read(p)
        assert tr2.enroll_keys == tr.enroll_keys
        np.testing.assert_array_equal(tr2.labels, tr.labels)
        mat = np.arange(6).reshape(2, 3).astype(float)
        scores = tr2.select_scores(mat, {"e1": 0, "e2": 1}, {"t1": 0, "t2": 1})
        np.testing.assert_allclose(scores, [0.0, 1.0, 3.0])


class TestScoreSetsPipeline:
    def test_full_pipeline_chains(self):
        """submean-lda-whiten-norm + plda + asnorm end-to-end on synthetic
        generative-model data; EER must beat plain cosine on raw vectors."""
        from asv_subtools_tpu.backend import ScoreConfig, ScoreSets, Trials

        rng = np.random.default_rng(42)
        train_x, train_ids = synth_data(rng, n_spk=80, n_utt=12, dim=24)
        within = np.linspace(0.2, 2.0, 24)
        em = rng.normal(size=(40, 24)) * 1.5
        enroll = {f"e{i}": em[i] + rng.normal(size=24) * np.sqrt(within) for i in range(40)}
        test = {}
        labels, e_keys, t_keys = [], [], []
        for i in range(40):
            test[f"t{i}"] = em[i] + rng.normal(size=24) * np.sqrt(within)
        for i in range(80):
            test[f"n{i}"] = rng.normal(size=24) * 1.5 + rng.normal(size=24) * np.sqrt(within)
        for i in range(40):
            for key in list(test):
                e_keys.append(f"e{i}")
                t_keys.append(key)
                labels.append(1 if key == f"t{i}" else 0)
        trials = Trials(e_keys, t_keys, labels)
        cohort = rng.normal(size=(200, 24)) * 1.5

        cfg = ScoreConfig(
            process="submean-lda-norm", classifier="plda", lda_dim=16,
            score_norm="asnorm", top_n=100,
        )
        pipe = ScoreSets(cfg).fit(train_x, train_ids)
        out = pipe.run(enroll, test, trials, cohort=cohort)
        assert out["eer"] < 0.10, out

        raw_cos = ScoreSets(ScoreConfig(process="", classifier="cosine")).fit(
            train_x, train_ids
        )
        out_cos = raw_cos.run(enroll, test, trials)
        assert out["eer"] <= out_cos["eer"] + 0.02

    def test_aplda_runs(self):
        from asv_subtools_tpu.backend import ScoreConfig, ScoreSets, Trials

        rng = np.random.default_rng(43)
        train_x, train_ids = synth_data(rng, n_spk=40, n_utt=8, dim=12)
        adapt = rng.normal(size=(100, 12)) + 1.0
        cfg = ScoreConfig(process="submean-norm", classifier="aplda")
        pipe = ScoreSets(cfg).fit(train_x, train_ids, adapt_vectors=adapt)
        e = {f"e{i}": rng.normal(size=12) for i in range(5)}
        t = {f"t{i}": rng.normal(size=12) for i in range(5)}
        trials = Trials(
            [f"e{i}" for i in range(5)], [f"t{i}" for i in range(5)], [1, 0, 1, 0, 1]
        )
        out = pipe.run(e, t, trials)
        assert "num_trials" in out


class TestPldaSerialization:
    def test_kaldi_text_roundtrip(self, tmp_path):
        from asv_subtools_tpu.backend import (
            read_kaldi_plda_text,
            write_kaldi_plda_text,
        )

        rng = np.random.default_rng(0)
        plda = Plda(
            mean=rng.normal(size=6),
            transform=rng.normal(size=(6, 6)),
            psi=np.abs(rng.normal(size=6)) + 0.1,
        )
        p = str(tmp_path / "plda.txt")
        write_kaldi_plda_text(plda, p)
        back = read_kaldi_plda_text(p)
        np.testing.assert_allclose(back.mean, plda.mean, rtol=1e-6)
        np.testing.assert_allclose(back.transform, plda.transform, rtol=1e-6)
        np.testing.assert_allclose(back.psi, plda.psi, rtol=1e-6)

    def test_two_cov_ark_roundtrip(self, tmp_path):
        from asv_subtools_tpu.backend import read_two_cov_ark, write_two_cov_ark

        rng = np.random.default_rng(1)
        mean = rng.normal(size=5)
        a = rng.normal(size=(5, 5))
        within = a @ a.T + np.eye(5)
        b = rng.normal(size=(5, 5))
        between = b @ b.T
        p = str(tmp_path / "plda.ark")
        write_two_cov_ark(mean, within, between, p)
        m2, w2, b2 = read_two_cov_ark(p)
        np.testing.assert_allclose(m2, mean, rtol=1e-6)
        np.testing.assert_allclose(w2, within, rtol=1e-6)
        np.testing.assert_allclose(b2, between, rtol=1e-6)


class TestAsnormDevice:
    def test_matches_host_asnorm(self):
        from asv_subtools_tpu.backend import asnorm, asnorm_device

        rng = np.random.default_rng(2)
        raw = rng.normal(size=(6, 9))
        ec = rng.normal(size=(6, 64))
        tc = rng.normal(size=(9, 64))
        host = asnorm(raw, ec, tc, top_n=16)
        dev = np.asarray(asnorm_device(raw, ec, tc, top_n=16))
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


class TestPldaDevice:
    def test_device_llr_matches_numpy(self):
        from asv_subtools_tpu.backend.plda import llr_matrix_device

        rng = np.random.default_rng(0)
        plda = Plda(
            mean=rng.normal(size=8),
            transform=rng.normal(size=(8, 8)),
            psi=np.abs(rng.normal(size=8)) + 0.5,
        )
        e = plda.transform_vectors(rng.normal(size=(6, 8)))
        t = plda.transform_vectors(rng.normal(size=(9, 8)))
        host = plda.llr_matrix(e, t)
        dev = np.asarray(llr_matrix_device(plda, e, t))
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


class TestScoreSetsClassClassifiers:
    """scoreSets.sh's svm/lr/gmm dispatch (the LID path): per-class models
    trained on the ENROLL set, trials scored against class names."""

    def _data(self, seed=0, n_class=4, per_class=30, d=16):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(n_class, d)) * 3.0
        enroll, labels, test, t_labels = {}, {}, {}, {}
        trials_rows = []
        for c in range(n_class):
            for i in range(per_class):
                k = f"c{c}_e{i}"
                enroll[k] = (centers[c] + rng.normal(size=d)).astype(np.float32)
                labels[k] = f"lang{c}"
            for i in range(6):
                k = f"c{c}_t{i}"
                test[k] = (centers[c] + rng.normal(size=d)).astype(np.float32)
                t_labels[k] = f"lang{c}"
        for tk, tc in t_labels.items():
            for c in range(n_class):
                trials_rows.append((f"lang{c}", tk, tc == f"lang{c}"))
        return enroll, labels, test, trials_rows

    @pytest.mark.parametrize("clf", ["lr", "svm", "gmm"])
    def test_class_classifier_separates(self, clf):
        from asv_subtools_tpu.backend import ScoreConfig, ScoreSets
        from asv_subtools_tpu.backend.pipeline import Trials

        enroll, labels, test, rows = self._data()
        trials = Trials(
            enroll_keys=[r[0] for r in rows],
            test_keys=[r[1] for r in rows],
            labels=np.asarray([r[2] for r in rows], int),
        )
        cfg = ScoreConfig(process="norm", classifier=clf,
                          gmm_components=4)
        pipe = ScoreSets(cfg)
        # transforms fit on the pooled enroll vectors
        x = np.stack(list(enroll.values()))
        ids = np.asarray([labels[k] for k in enroll])
        pipe.fit(x, ids)
        out = pipe.run(enroll, test, trials, enroll_labels=labels)
        assert out["eer"] < 0.1, (clf, out)

    def test_score_norm_rejected_for_class_classifier(self):
        from asv_subtools_tpu.backend import ScoreConfig, ScoreSets
        from asv_subtools_tpu.backend.pipeline import Trials

        enroll, labels, test, rows = self._data()
        trials = Trials(
            enroll_keys=[r[0] for r in rows],
            test_keys=[r[1] for r in rows],
            labels=np.asarray([r[2] for r in rows], int),
        )
        pipe = ScoreSets(ScoreConfig(process="norm", classifier="lr",
                                     score_norm="snorm"))
        pipe.fit(np.stack(list(enroll.values())),
                 np.asarray([labels[k] for k in enroll]))
        with pytest.raises(ValueError):
            pipe.run(enroll, test, trials, cohort=np.zeros((5, 16)),
                     enroll_labels=labels)


class TestPcaWhitening:
    def test_rotation_decorrelates(self):
        from asv_subtools_tpu.backend import PCAWhitening

        rng = np.random.default_rng(0)
        a = rng.normal(size=(2000, 8)) @ rng.normal(size=(8, 8))
        p = PCAWhitening().fit(a)
        y = p.transform(a)
        cov = np.cov(y.T)
        off = cov - np.diag(np.diag(cov))
        assert np.abs(off).max() < 1e-6 * np.abs(np.diag(cov)).max()
        # variance NOT normalized by default (est-pca defaults)
        assert np.diag(cov).max() / np.diag(cov).min() > 2.0

    def test_whitening_unit_variance(self):
        from asv_subtools_tpu.backend import PCAWhitening

        rng = np.random.default_rng(1)
        a = rng.normal(size=(2000, 6)) @ rng.normal(size=(6, 6))
        p = PCAWhitening(normalize_variance=True).fit(a)
        y = p.transform(a)
        np.testing.assert_allclose(np.cov(y.T), np.eye(6), atol=5e-2)

    def test_dim_reduction_and_pipeline_step(self):
        from asv_subtools_tpu.backend import PCAWhitening, ScoreConfig, ScoreSets

        rng = np.random.default_rng(2)
        a = rng.normal(size=(500, 16)).astype(np.float32)
        p = PCAWhitening(dim=4).fit(a)
        assert p.transform(a).shape == (500, 4)
        pipe = ScoreSets(ScoreConfig(process="submean-pcawhiten-norm",
                                     lda_dim=8))
        pipe.fit(a, np.arange(500) % 10)
        out = pipe.transform(a[:3])
        assert out.shape == (3, 8)

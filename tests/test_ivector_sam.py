"""Tests: i-vector subsystem and SAM train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asv_subtools_tpu.backend import compute_eer, cosine_score_matrix
from asv_subtools_tpu.backend.ivector import (
    collect_stats,
    train_ivector_extractor,
    train_ubm,
)

KEY = jax.random.PRNGKey(0)


class TestIvector:
    def test_ivector_separates_speakers(self):
        """Generate frames from a total-variability model; the trained
        extractor's i-vectors must separate speakers by cosine."""
        rng = np.random.default_rng(0)
        d, r_true = 8, 4
        # true speaker latent per speaker, frames = latent shift + noise
        n_spk, utt_per_spk = 10, 6
        proj = rng.normal(size=(r_true, d))
        utts, spk_ids = [], []
        for s in range(n_spk):
            w = rng.normal(size=r_true)
            for u in range(utt_per_spk):
                t = rng.integers(80, 150)
                frames = w @ proj + rng.normal(size=(t, d))
                utts.append(frames)
                spk_ids.append(s)
        ubm = train_ubm(np.concatenate(utts), num_components=8, num_iters=10)
        stats = collect_stats(ubm, utts)
        extractor = train_ivector_extractor(ubm, stats, ivector_dim=8, num_iters=5)
        ivecs = extractor.extract(stats)
        assert ivecs.shape == (len(utts), 8)
        scores = np.asarray(cosine_score_matrix(ivecs, ivecs))
        iu = np.triu_indices(len(utts), 1)
        same = (np.asarray(spk_ids)[:, None] == np.asarray(spk_ids)[None, :])[iu]
        eer, _ = compute_eer(scores[iu], same.astype(int))
        assert eer < 0.25, f"i-vector EER {eer}"

    def test_extract_from_frames_matches_stats_path(self):
        rng = np.random.default_rng(1)
        utts = [rng.normal(size=(50, 6)) for _ in range(5)]
        ubm = train_ubm(np.concatenate(utts), num_components=4, num_iters=5)
        stats = collect_stats(ubm, utts)
        ex = train_ivector_extractor(ubm, stats, ivector_dim=4, num_iters=3)
        a = ex.extract(stats)
        b = ex.extract_from_frames(utts)
        np.testing.assert_allclose(a, b, rtol=1e-8)


class TestSam:
    def test_sam_step_trains(self):
        from asv_subtools_tpu.models import SpeakerNet, Xvector
        from asv_subtools_tpu.train import (
            TrainStepConfig,
            get_optimizer,
            init_train_state,
        )
        from asv_subtools_tpu.train.sam import make_sam_train_step

        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=8),
            loss_name="margin_softmax",
            loss_params={"method": "am", "m": 0.1},
            num_targets=4,
        )
        tx = get_optimizer("sgd", learning_rate=1e-2)
        step = jax.jit(
            make_sam_train_step(
                net, tx, rho=0.05,
                config=TrainStepConfig(compute_dtype=jnp.float32),
            )
        )
        rng = np.random.default_rng(2)
        batch = {
            "x": jnp.asarray(rng.normal(size=(8, 20, 8)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 4, 8)),
        }
        state = init_train_state(net, KEY, batch, tx)
        losses = []
        k = KEY
        for _ in range(25):
            k, sub = jax.random.split(k)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] - 0.3
        assert np.isfinite(float(m["sam_loss"]))

    def test_sam_adaptive_variant(self):
        from asv_subtools_tpu.models import SpeakerNet, Xvector
        from asv_subtools_tpu.train import (
            TrainStepConfig,
            get_optimizer,
            init_train_state,
        )
        from asv_subtools_tpu.train.sam import make_sam_train_step

        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=8),
            loss_name="softmax", loss_params={}, num_targets=4,
        )
        tx = get_optimizer("sgd", learning_rate=1e-2)
        step = jax.jit(
            make_sam_train_step(
                net, tx, rho=0.05, adaptive=True,
                config=TrainStepConfig(compute_dtype=jnp.float32),
            )
        )
        rng = np.random.default_rng(3)
        batch = {
            "x": jnp.asarray(rng.normal(size=(4, 20, 8)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 4, 4)),
        }
        state = init_train_state(net, KEY, batch, tx)
        state, m = step(state, batch, KEY)
        assert np.isfinite(float(m["loss"]))


class TestFdTrainer:
    def test_fd_alternating_step(self):
        from asv_subtools_tpu.models.multitask import FDXvector
        from asv_subtools_tpu.train import TrainStepConfig, get_optimizer
        from asv_subtools_tpu.train.fd import (
            FDSpeakerNet,
            init_fd_state,
            make_fd_train_step,
        )

        net = FDSpeakerNet(
            backbone=FDXvector(num_frame_channels=16, embd_dim=8),
            num_targets=4, num_aux_targets=3,
            loss_name="softmax", loss_params={},
        )
        tx_main = get_optimizer("sgd", learning_rate=1e-2)
        tx_adv = get_optimizer("sgd", learning_rate=1e-2)
        step = jax.jit(make_fd_train_step(
            net, tx_main, tx_adv, cycle=4, adv_steps=2,
            config=TrainStepConfig(compute_dtype=jnp.float32),
        ))
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.normal(size=(8, 20, 8)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 4, 8)),
            "aux_y": jnp.asarray(rng.integers(0, 3, 8)),
        }
        state = init_fd_state(net, KEY, batch, tx_main, tx_adv)
        # reference partition (trainer_fd.py:393-415): ONLY the DAL
        # projections alternate; the att gate trains in the MAIN phase
        gate_before = np.asarray(
            state.params["backbone"]["att_fc2"]["kernel"]
        ).copy()
        dal_before = np.asarray(state.params["dal"]["w_id"]["kernel"]).copy()
        speaker_before = np.asarray(
            state.params["backbone"]["tdnn7_affine"]["kernel"]
        ).copy()
        # steps 0,1 are the adversary phase (cycle=4, adv_steps=2)
        k = KEY
        for _ in range(2):
            k, s = jax.random.split(k)
            state, m = step(state, batch, s)
            assert float(m["phase_adv"]) == 1.0
        gate_mid = np.asarray(state.params["backbone"]["att_fc2"]["kernel"])
        dal_mid = np.asarray(state.params["dal"]["w_id"]["kernel"])
        speaker_mid = np.asarray(state.params["backbone"]["tdnn7_affine"]["kernel"])
        assert not np.allclose(dal_mid, dal_before)  # DAL projections moved
        np.testing.assert_array_equal(gate_mid, gate_before)  # gate frozen
        np.testing.assert_array_equal(speaker_mid, speaker_before)  # main frozen
        # steps 2,3: main phase
        for _ in range(2):
            k, s = jax.random.split(k)
            state, m = step(state, batch, s)
            assert float(m["phase_adv"]) == 0.0
        speaker_after = np.asarray(state.params["backbone"]["tdnn7_affine"]["kernel"])
        gate_after = np.asarray(state.params["backbone"]["att_fc2"]["kernel"])
        dal_after = np.asarray(state.params["dal"]["w_id"]["kernel"])
        assert not np.allclose(speaker_after, speaker_mid)  # main moved
        assert not np.allclose(gate_after, gate_mid)  # gate trains in main
        np.testing.assert_array_equal(dal_after, dal_mid)  # adversary frozen


class TestClassicChain:
    def test_ubm_ivector_plda_chain(self):
        """The classic system end-to-end: UBM -> i-vectors -> PLDA -> EER
        (the kaldi/runIvector.sh pipeline as array programs)."""
        from asv_subtools_tpu.backend import PldaStats, estimate_plda
        from asv_subtools_tpu.backend.ivector import (
            collect_stats, train_ivector_extractor, train_ubm,
        )

        rng = np.random.default_rng(0)
        d, r_true, n_spk, upk = 10, 5, 16, 8
        proj = rng.normal(size=(r_true, d))
        utts, ids = [], []
        for s in range(n_spk):
            w = rng.normal(size=r_true)
            for _ in range(upk):
                t = rng.integers(60, 120)
                utts.append(w @ proj + rng.normal(size=(t, d)))
                ids.append(s)
        ubm = train_ubm(np.concatenate(utts), num_components=8, num_iters=8)
        stats = collect_stats(ubm, utts)
        ext = train_ivector_extractor(ubm, stats, ivector_dim=8, num_iters=4)
        ivecs = ext.extract(stats)
        ids = np.asarray(ids)

        # split: first 5 utts/spk train PLDA, rest eval
        train_sel = np.concatenate([np.arange(upk * s, upk * s + 5) for s in range(n_spk)])
        eval_sel = np.setdiff1d(np.arange(len(utts)), train_sel)
        plda = estimate_plda(
            PldaStats.from_vectors(ivecs[train_sel], ids[train_sel]), num_em_iters=5
        )
        ev = plda.transform_vectors(ivecs[eval_sel])
        llr = plda.llr_matrix(ev, ev)
        iu = np.triu_indices(len(eval_sel), 1)
        same = (ids[eval_sel][:, None] == ids[eval_sel][None, :])[iu].astype(int)
        eer, _ = compute_eer(llr[iu], same)
        assert eer < 0.30, f"classic chain EER {eer}"


class TestKaldiIvectorExtractorIO:
    """Kaldi `final.ie` binary model I/O (round 4): reference/Kaldi-trained
    total-variability models load directly; extraction uses the FULL
    per-component inverse covariances (our compact trainer is diagonal)."""

    def _rand_model(self, rng, k=4, d=6, r=3):
        from asv_subtools_tpu.backend import KaldiIvectorExtractor

        m = rng.normal(size=(k, d, r))
        s = rng.normal(size=(k, d, d))
        sigma_inv = np.einsum("kde,kfe->kdf", s, s) + 2 * np.eye(d)[None]
        return KaldiIvectorExtractor(
            m=m, sigma_inv=sigma_inv,
            w_vec=rng.dirichlet(np.ones(k)),
            prior_offset=rng.uniform(5.0, 15.0),
        )

    def test_binary_roundtrip(self, tmp_path):
        from asv_subtools_tpu.backend import (
            read_kaldi_ivector_extractor,
            write_kaldi_ivector_extractor,
        )

        rng = np.random.default_rng(0)
        model = self._rand_model(rng)
        p = str(tmp_path / "final.ie")
        write_kaldi_ivector_extractor(model, p)
        got = read_kaldi_ivector_extractor(p)
        np.testing.assert_array_equal(got.m, model.m)
        np.testing.assert_allclose(got.sigma_inv, model.sigma_inv,
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(got.w_vec, model.w_vec)
        assert got.prior_offset == model.prior_offset

    def test_golden_binary_layout(self, tmp_path):
        """Independent struct.pack construction of the Kaldi layout (never
        the writer under test) must read back exactly."""
        import struct

        from asv_subtools_tpu.backend import read_kaldi_ivector_extractor

        rng = np.random.default_rng(1)
        k, d, r = 2, 3, 2
        m = rng.normal(size=(k, d, r))
        sp = []
        for _ in range(k):
            a = rng.normal(size=(d, d))
            sp.append(a @ a.T + 2 * np.eye(d))
        w_vec = rng.dirichlet(np.ones(k))
        offset = 7.25

        def mat(x):
            return (b"DM " + b"\x04" + struct.pack("<i", x.shape[0])
                    + b"\x04" + struct.pack("<i", x.shape[1])
                    + np.asarray(x, "<f8").tobytes())

        buf = b"\x00B<IvectorExtractor> <w> " + mat(np.zeros((0, 0)))
        buf += b"<w_vec> DV " + b"\x04" + struct.pack("<i", k)
        buf += np.asarray(w_vec, "<f8").tobytes()
        buf += b"<M> " + b"\x04" + struct.pack("<i", k)
        for mk in m:
            buf += mat(mk)
        buf += b"<SigmaInv> "
        for s in sp:
            buf += b"DP " + b"\x04" + struct.pack("<i", d)
            buf += np.concatenate(
                [s[i, : i + 1] for i in range(d)]
            ).astype("<f8").tobytes()
        buf += b"<IvectorOffset> " + bytes([8]) + struct.pack("<d", offset)
        buf += b"</IvectorExtractor> "
        p = tmp_path / "golden.ie"
        p.write_bytes(buf)
        got = read_kaldi_ivector_extractor(str(p))
        np.testing.assert_array_equal(got.m, m)
        np.testing.assert_allclose(got.sigma_inv, np.stack(sp), atol=0)
        assert got.prior_offset == offset

    def test_extraction_matches_explicit_loop(self):
        """Batched einsum posterior vs a per-utterance loop transcription
        of GetIvectorDistribution (quadratic/linear + prior offset)."""
        from asv_subtools_tpu.backend.ivector import BaumWelchStats

        rng = np.random.default_rng(2)
        model = self._rand_model(rng)
        k, d, r = model.m.shape
        u = 5
        n = rng.uniform(0.5, 30.0, size=(u, k))
        f = rng.normal(size=(u, k, d)) * 3
        got = model.extract(BaumWelchStats(n, f))
        for i in range(u):
            quad = np.eye(r)
            lin = np.zeros(r)
            for c in range(k):
                ti = model.sigma_inv[c] @ model.m[c]
                quad += n[i, c] * model.m[c].T @ ti
                lin += ti.T @ f[i, c]
            lin[0] += model.prior_offset
            want = np.linalg.solve(quad, lin)
            want[0] -= model.prior_offset
            np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-10)


class TestSamPlateauScale:
    def test_lr_scale_scales_the_update_not_the_grads(self):
        """Regression (r4): SAM multiplied the plateau lr_scale into the
        gradients, which Adam-family optimizers are invariant to — the
        reduceP+SAM combination silently no-opped. The scale must act on
        the post-optimizer UPDATE: halving it must halve the param delta."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from asv_subtools_tpu.models import Xvector
        from asv_subtools_tpu.models.framework import SpeakerNet
        from asv_subtools_tpu.train.sam import make_sam_train_step
        from asv_subtools_tpu.train.trainer import (
            TrainState,
            TrainStepConfig,
            init_train_state,
        )

        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=8),
            loss_name="softmax", loss_params={}, num_targets=4,
        )
        tx = optax.adamw(1e-2)
        step = jax.jit(make_sam_train_step(
            net, tx, config=TrainStepConfig(compute_dtype=jnp.float32,
                                            skip_nonfinite=False),
        ))
        rng = jax.random.PRNGKey(0)
        batch = {
            "x": jnp.asarray(np.random.default_rng(0).normal(
                size=(8, 20, 8)), jnp.float32),
            "y": jnp.asarray(np.arange(8) % 4, jnp.int32),
        }
        state0 = init_train_state(net, rng, batch, tx)

        def delta(lr_scale):
            s, _ = step(state0, batch, rng, 1.0, 0.0,
                        jnp.asarray(lr_scale, jnp.float32))
            return jax.tree_util.tree_map(
                lambda a, b: np.asarray(a) - np.asarray(b),
                jax.device_get(s.params), jax.device_get(state0.params),
            )

        d1 = delta(1.0)
        dh = delta(0.5)
        n1 = float(np.sqrt(sum(
            float((x**2).sum()) for x in jax.tree_util.tree_leaves(d1))))
        nh = float(np.sqrt(sum(
            float((x**2).sum()) for x in jax.tree_util.tree_leaves(dh))))
        assert abs(nh / n1 - 0.5) < 1e-3, (n1, nh)

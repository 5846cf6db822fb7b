"""Training engine tests on a virtual 8-device CPU mesh.

Covers: optimizer factory, LR schedules, jitted SPMD train step over the
mesh (loss decreases, SyncBN-by-construction), grad accumulation
equivalence, non-finite skip, checkpoint round-trip, transfer load.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.models import SpeakerNet, Xvector
from asv_subtools_tpu.parallel import make_mesh, replicate, shard_batch
from asv_subtools_tpu.train import (
    ReduceOnPlateau,
    TrainState,
    TrainStepConfig,
    Trainer,
    get_lr_schedule,
    get_optimizer,
    init_train_state,
    load_checkpoint,
    load_transfer,
    make_train_step,
    save_checkpoint,
)

KEY = jax.random.PRNGKey(0)


def tiny_net(num_targets=8):
    return SpeakerNet(
        backbone=Xvector(num_frame_channels=16, embd_dim=16),
        loss_name="margin_softmax",
        loss_params={"method": "am", "m": 0.2},
        num_targets=num_targets,
    )


def batch_of(b=8, t=24, d=8, c=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, c, size=b)),
    }


class TestOptim:
    @pytest.mark.parametrize(
        "name", ["sgd", "sgdw", "adam", "adamW", "ralamb", "adamod", "novograd"]
    )
    def test_optimizers_step(self, name):
        tx = get_optimizer(name, learning_rate=1e-2)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).sum()) > 0

    def test_lookahead_and_gc(self):
        tx = get_optimizer("adamW", learning_rate=1e-2, lookahead=True, gc=True)
        params = {"w": jnp.ones((4, 4))}
        state = tx.init(params)
        g = {"w": jnp.full((4, 4), 0.5)}
        for _ in range(6):
            updates, state = tx.update(g, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        assert np.all(np.isfinite(np.asarray(params["w"])))


class TestSchedules:
    def test_warm_restarts_restarts(self):
        s = get_lr_schedule("warmR", base_lr=1.0, t_0=10, eta_min=0.0)
        assert float(s(0)) == pytest.approx(1.0)
        assert float(s(5)) == pytest.approx(0.5, abs=1e-6)
        assert float(s(10)) == pytest.approx(1.0)  # restart

    def test_cyclic_triangular(self):
        s = get_lr_schedule("cyclic", base_lr=0.0, max_lr=1.0, step_size_up=10, mode="triangular2")
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(10)) == pytest.approx(1.0)
        assert float(s(30)) == pytest.approx(0.5)  # second cycle halved

    def test_noam_peak(self):
        s = get_lr_schedule("noam", base_lr=1.0, model_dim=256, warmup_steps=100)
        lrs = [float(s(i)) for i in [1, 50, 100, 200]]
        assert lrs[2] == max(lrs)

    def test_plateau(self):
        p = ReduceOnPlateau(factor=0.5, patience=1)
        assert not p.update(1.0)
        assert not p.update(1.0)  # bad 1
        assert p.update(1.0)  # bad 2 -> reduce
        assert p.scale == 0.5


class TestTrainStep:
    def test_loss_decreases_on_mesh(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-2)
        step = make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32))
        batch = batch_of()
        state = init_train_state(net, KEY, batch, tx)
        state = replicate(mesh, state)
        jstep = jax.jit(step)
        sbatch = shard_batch(mesh, batch)
        losses = []
        rng = KEY
        for i in range(30):
            rng, sub = jax.random.split(rng)
            state, m = jstep(state, sbatch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] - 0.5, losses[::10]
        assert int(jax.device_get(state.step)) == 30

    def test_accum_grad_matches_full_batch(self):
        net = tiny_net()
        tx = get_optimizer("sgd", learning_rate=1e-2, weight_decay=0.0)
        cfg_full = TrainStepConfig(compute_dtype=jnp.float32, accum_grad=1)
        cfg_acc = TrainStepConfig(compute_dtype=jnp.float32, accum_grad=4)
        batch = batch_of(b=8)
        s0 = init_train_state(net, KEY, batch, tx)
        st_full, m1 = jax.jit(make_train_step(net, tx, config=cfg_full))(
            s0, batch, KEY
        )
        st_acc, m2 = jax.jit(make_train_step(net, tx, config=cfg_acc))(
            s0, batch, KEY
        )
        # BatchNorm sees microbatches in the accum path, so only check the
        # optimizer-visible result loosely: finite + close loss
        assert np.isfinite(m2["loss"])
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), st_full.params, st_acc.params
        )
        assert max(jax.tree_util.tree_leaves(d)) < 0.05

    def test_remat_matches_no_remat(self):
        """remat='dots'/'full' recompute the forward for the backward; the
        optimization step must match the stored-activations path (tiny
        reassociation drift only)."""
        net = tiny_net()
        tx = get_optimizer("sgd", learning_rate=1e-2, weight_decay=0.0)
        batch = batch_of(b=8)
        s0 = init_train_state(net, KEY, batch, tx)
        ref, _ = jax.jit(
            make_train_step(net, tx, config=TrainStepConfig(
                compute_dtype=jnp.float32))
        )(s0, batch, KEY)
        for policy in ("dots", "dots_batch", "full"):
            st, m = jax.jit(
                make_train_step(net, tx, config=TrainStepConfig(
                    compute_dtype=jnp.float32, remat=policy))
            )(s0, batch, KEY)
            assert np.isfinite(m["loss"])
            d = jax.tree_util.tree_map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))),
                ref.params, st.params,
            )
            assert max(jax.tree_util.tree_leaves(d)) < 1e-4, policy

    def test_plateau_lr_scale_shrinks_adam_step(self):
        """lr_scale must scale the applied update even for Adam (which is
        invariant to gradient scaling) — advisor r1 medium finding."""
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-2)
        step = jax.jit(
            make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32))
        )
        batch = batch_of()
        s0 = init_train_state(net, KEY, batch, tx)
        s_full, _ = step(s0, batch, KEY, 1.0, 0.0, 1.0)
        s_half, _ = step(s0, batch, KEY, 1.0, 0.0, 0.5)

        def delta(a, b):
            return max(
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(
                        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b
                    )
                )
            )

        d_full = delta(s_full.params, s0.params)
        d_half = delta(s_half.params, s0.params)
        assert d_half < d_full * 0.75, (d_full, d_half)

    def test_nonfinite_grads_skipped(self):
        net = tiny_net()
        tx = get_optimizer("sgd", learning_rate=1e-2)
        step = jax.jit(make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32)))
        batch = batch_of()
        state = init_train_state(net, KEY, batch, tx)
        bad = dict(batch)
        bad["x"] = batch["x"].at[0, 0, 0].set(jnp.nan)
        new_state, m = step(state, bad, KEY)
        assert float(m["skipped"]) == 1.0
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
        )
        assert max(jax.tree_util.tree_leaves(diff)) == 0.0

    def test_trainer_partition_rules_shards_classifier(self):
        """Model-axis path through the PUBLIC Trainer API: classifier rows
        sharded over model=2, loss decreases, adam moments follow the
        param sharding (VERDICT r1 #5)."""
        from asv_subtools_tpu.parallel import classifier_partition_rules
        from asv_subtools_tpu.parallel.mesh import MODEL_AXIS

        mesh = make_mesh(num_data=4, num_model=2)
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-2)
        trainer = Trainer(
            net, tx,
            config=TrainStepConfig(compute_dtype=jnp.float32),
            mesh=mesh,
            partition_rules=classifier_partition_rules,
        )
        batch = batch_of()
        state = trainer.init_state(KEY, batch)
        w = state.params["loss"]["weight"]
        assert w.sharding.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
        # adam mu/nu for the classifier follow the same sharding
        mu_leaves = [
            x for x in jax.tree_util.tree_leaves(state.opt_state)
            if getattr(x, "shape", None) == w.shape
        ]
        assert mu_leaves and all(
            x.sharding.spec == w.sharding.spec for x in mu_leaves
        )
        rng = KEY
        losses = []
        for _ in range(10):
            rng, sub = jax.random.split(rng)
            b = shard_batch(mesh, batch)
            state, m = trainer._train_step_nomask(
                state, b, sub,
                jnp.asarray(1.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(1.0, jnp.float32),
            )
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] - 0.3, losses

    def test_trainer_epoch_runs(self, tmp_path):
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-3)
        trainer = Trainer(
            net, tx,
            config=TrainStepConfig(compute_dtype=jnp.float32),
            report_interval=2,
        )
        batch = batch_of()
        state = trainer.init_state(KEY, batch)
        data = [batch_of(seed=i) for i in range(4)]
        state, metrics = trainer.run_epoch(state, iter(data), KEY, epoch=0)
        assert np.isfinite(metrics["loss"])
        v = trainer.validate(state, [batch_of(seed=99)])
        assert np.isfinite(v["loss"])


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-3)
        batch = batch_of()
        state = init_train_state(net, KEY, batch, tx)
        step = jax.jit(make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32)))
        state, _ = step(state, batch, KEY)
        path = save_checkpoint(str(tmp_path), state, 1, info={"lr": 1e-3})
        assert os.path.exists(path)
        assert os.path.islink(os.path.join(tmp_path, "final.params"))

        fresh = init_train_state(net, jax.random.PRNGKey(1), batch, tx)
        restored = load_checkpoint(path, fresh, restore_optimizer=True)
        same = jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            restored.params, state.params,
        )
        assert all(jax.tree_util.tree_leaves(same))
        assert int(jax.device_get(restored.step)) == 1

    def test_transfer_excludes_loss(self, tmp_path):
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-3)
        batch = batch_of()
        state = init_train_state(net, KEY, batch, tx)
        path = save_checkpoint(str(tmp_path), state, "x")
        net2 = tiny_net(num_targets=20)  # new classifier size
        s2 = init_train_state(net2, jax.random.PRNGKey(5), batch_of(c=20), tx)
        merged = load_transfer(s2.params, path, exclude=["loss"])
        np.testing.assert_allclose(
            np.asarray(merged["backbone"]["tdnn1"]["affine"]["conv"]["kernel"]),
            np.asarray(state.params["backbone"]["tdnn1"]["affine"]["conv"]["kernel"]),
        )
        assert merged["loss"]["weight"].shape[0] == 20


class TestWeightDecayMask:
    def test_biases_not_decayed(self):
        from asv_subtools_tpu.train import get_optimizer

        tx = get_optimizer(
            "adamW", learning_rate=0.0, weight_decay=0.1, decay_kernels_only=True
        )
        params = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        updates, _ = tx.update(grads, state, params)
        # lr=0 -> updates are 0 everywhere; run with lr>0 to see decay
        tx2 = get_optimizer(
            "sgd", learning_rate=1.0, weight_decay=0.1, momentum=0.0,
            decay_kernels_only=True,
        )
        s2 = tx2.init(params)
        u2, _ = tx2.update(grads, s2, params)
        assert float(jnp.abs(u2["w"]).max()) > 0  # kernel decayed
        assert float(jnp.abs(u2["b"]).max()) == 0  # bias untouched


class TestParallelMapper:
    def test_ordered_and_filters_none(self):
        from asv_subtools_tpu.data.dataset import ParallelMapper

        out = list(
            ParallelMapper(
                lambda i: None if i % 3 == 0 else i * 2, range(30), workers=4
            )
        )
        assert out == [i * 2 for i in range(30) if i % 3 != 0]


class TestMixedPrecision:
    def test_bf16_step_converges(self):
        """True mixed precision (bf16 params in forward, f32 master copy)
        must still train."""
        net = tiny_net()
        tx = get_optimizer("adamW", learning_rate=1e-2)
        step = jax.jit(
            make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.bfloat16))
        )
        batch = batch_of()
        state = init_train_state(net, KEY, batch, tx)
        # master params stay f32
        assert all(
            p.dtype == jnp.float32
            for p in jax.tree_util.tree_leaves(state.params)
        )
        losses = []
        rng = KEY
        for _ in range(30):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] - 0.5, losses[::10]
        assert all(
            p.dtype == jnp.float32
            for p in jax.tree_util.tree_leaves(state.params)
        )


class TestWaveInputTraining:
    def test_wave_train_step_converges(self):
        """Raw waveforms in, fused fbank inside the jitted step."""
        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=16),
            loss_name="softmax", loss_params={}, num_targets=4,
        )
        tx = get_optimizer("adamW", learning_rate=3e-3)
        step = jax.jit(
            make_train_step(
                net, tx,
                config=TrainStepConfig(compute_dtype=jnp.float32, wave_input=True),
            )
        )
        rng = np.random.default_rng(0)
        # 4 synthetic "speakers" = distinct tones
        b = 8
        t = np.arange(16000) / 16000.0
        waves, labels = [], []
        for i in range(b):
            spk = i % 4
            f0 = 100.0 + 80.0 * spk
            waves.append(
                (np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6)) * 3000
                 + rng.normal(size=len(t)) * 50).astype(np.float32)
            )
            labels.append(spk)
        batch = {"x": jnp.asarray(np.stack(waves)), "y": jnp.asarray(labels)}
        state = init_train_state(
            net, KEY,
            {"x": jnp.zeros((b, 98, 23)), "y": batch["y"]}, tx,
        )
        losses = []
        k = KEY
        for _ in range(25):
            k, s = jax.random.split(k)
            state, m = step(state, batch, s)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] - 0.4, losses[::8]


class TestFsdp:
    """ZeRO-3-style FSDP through the public Trainer API (beyond the
    reference, SURVEY §2.7): large params + adam moments sharded over the
    DATA axis, numerics identical to the replicated run."""

    def _run(self, partition_rules, steps=6, mesh=None, opt="adamW"):
        mesh = mesh or make_mesh(num_data=8, num_model=1)
        net = tiny_net()
        tx = get_optimizer(opt, learning_rate=1e-2)
        trainer = Trainer(
            net, tx,
            config=TrainStepConfig(compute_dtype=jnp.float32),
            mesh=mesh,
            partition_rules=partition_rules,
        )
        batch = batch_of()
        state = trainer.init_state(KEY, batch)
        rng = KEY
        losses = []
        for i in range(steps):
            rng, sub = jax.random.split(rng)
            b = shard_batch(mesh, batch_of(seed=i))
            state, m = trainer._train_step_nomask(
                state, b, sub,
                jnp.asarray(1.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(1.0, jnp.float32),
            )
            losses.append(float(m["loss"]))
        return state, losses

    def test_fsdp_shards_params_and_moments(self):
        from asv_subtools_tpu.parallel import make_fsdp_rules
        from asv_subtools_tpu.parallel.mesh import DATA_AXIS

        mesh = make_mesh(num_data=8, num_model=1)
        rules = make_fsdp_rules(mesh, min_size=64)
        state, losses = self._run(rules, mesh=mesh)
        sharded = [
            (jax.tree_util.keystr(path), x)
            for path, x in jax.tree_util.tree_flatten_with_path(state.params)[0]
            if any(ax is not None for ax in x.sharding.spec)
        ]
        assert sharded, "no param got sharded"
        for name, x in sharded:
            assert DATA_AXIS in [a for a in x.sharding.spec if a], name
        # adam moments of a sharded param share its sharding
        w = dict(sharded)[next(iter(dict(sharded)))]
        mu_like = [
            x for x in jax.tree_util.tree_leaves(state.opt_state)
            if getattr(x, "shape", None) == w.shape
        ]
        assert mu_like and all(
            x.sharding.spec == w.sharding.spec for x in mu_like
        )
        assert losses[-1] < losses[0], losses

    def test_fsdp_matches_replicated_numerics(self):
        from asv_subtools_tpu.parallel import make_fsdp_rules

        mesh = make_mesh(num_data=8, num_model=1)
        # SGD: updates are linear in the gradients, so the only FSDP-vs-
        # replicated difference is f32 reassociation from the grad
        # reduce-scatter's reduction order (adam's rsqrt near v~0 would
        # amplify single-LSB grad differences into visible param noise)
        state_f, losses_f = self._run(make_fsdp_rules(mesh, min_size=64),
                                      mesh=mesh, opt="sgd")
        state_r, losses_r = self._run(None, opt="sgd")
        # rtol 3e-4: the at-use gather constraint (round 4) moves the
        # gradient reduction to the constraint's transpose (reduce-scatter
        # semantics), changing the f32 summation order vs the replicated
        # run — pure reassociation noise that compounds over the 6 steps
        np.testing.assert_allclose(losses_f, losses_r, rtol=3e-4)
        p_f = jax.device_get(state_f.params)
        p_r = jax.device_get(state_r.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5),
            p_f, p_r,
        )

    def test_fsdp_composes_with_model_axis(self):
        from asv_subtools_tpu.parallel import make_fsdp_rules
        from asv_subtools_tpu.parallel.mesh import MODEL_AXIS

        mesh = make_mesh(num_data=4, num_model=2)
        rules = make_fsdp_rules(mesh, min_size=64, classifier_model_axis=True)
        state, losses = self._run(rules, mesh=mesh)
        w = state.params["loss"]["weight"]
        assert w.sharding.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
        assert losses[-1] < losses[0]


class TestOcsoftmaxTraining:
    def test_ocsoftmax_trains_through_speakernet(self):
        """OCSoftmax (anti-spoof one-class loss) through the standard
        SpeakerNet/train-step machinery: loss decreases and bona-fide /
        spoof center-cosines move toward their reference-convention sides
        (bona fide BELOW r_real, spoof ABOVE r_fake — loss.py:763-765)."""
        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=16),
            loss_name="ocsoftmax",
            loss_params={"r_real": 0.9, "r_fake": 0.2, "alpha": 20.0},
            num_targets=2,
        )
        tx = get_optimizer("adamW", learning_rate=5e-3)
        step = jax.jit(
            make_train_step(net, tx, config=TrainStepConfig(
                compute_dtype=jnp.float32))
        )
        rng = np.random.default_rng(0)
        # separable classes: bona fide vs spoofed (offset) inputs
        xb = rng.normal(size=(8, 24, 8)).astype(np.float32)
        xs = xb + 2.0 * rng.normal(size=(1, 1, 8)).astype(np.float32)
        x = jnp.asarray(np.concatenate([xb, xs]))
        y = jnp.asarray([1] * 8 + [0] * 8)
        batch = {"x": x, "y": y}
        state = init_train_state(net, KEY, batch, tx)
        losses = []
        k = KEY
        for _ in range(40):
            k, sub = jax.random.split(k)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] - 0.1, (losses[0], losses[-1])
        # scores: cos(emb, center); bona fide low, spoof high
        emb = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, None, method=net.embed,
        )
        e = np.array(emb, np.float32)
        c = np.array(state.params["loss"]["center"], np.float32)[0]
        e /= np.linalg.norm(e, axis=-1, keepdims=True) + 1e-9
        c /= np.linalg.norm(c) + 1e-9
        s = e @ c
        assert s[:8].mean() < s[8:].mean()


class TestReporter:
    def test_csv_roundtrip_and_grab(self, tmp_path):
        from asv_subtools_tpu.train.reporter import (
            Reporter,
            grab_metric,
            read_report_csv,
        )

        rep = Reporter(log_dir=str(tmp_path), print_interval=10**9)
        for e in range(2):
            for i in range(3):
                rep.update(epoch=e, iteration=e * 3 + i,
                           train_loss=float(10 - e * 3 - i), accuracy=0.5)
        rep.close()
        path = os.path.join(str(tmp_path), "train.csv")
        cols = read_report_csv(path)
        assert cols["train_loss"] == [10.0, 9.0, 8.0, 7.0, 6.0, 5.0]
        # grabLossValue.sh parity: one metric's trajectory, per-epoch filter
        assert grab_metric(path, "train_loss", epoch=1) == [7.0, 6.0, 5.0]
        with pytest.raises(KeyError):
            grab_metric(path, "nope")


class TestFsdpCheckpointResume:
    def test_sharded_save_resume_matches_uninterrupted(self, tmp_path):
        """Checkpoint/resume of a SHARDED training state (FSDP over the
        data axis): save after 2 steps, restore into a fresh trainer's
        sharded template (load_checkpoint re-places each leaf with the
        template's NamedSharding — no replicated blow-up), continue 2
        more steps, and match the uninterrupted 4-step run exactly."""
        from asv_subtools_tpu.parallel import make_fsdp_rules, make_mesh, shard_batch

        mesh = make_mesh(num_data=8, num_model=1)
        rules = make_fsdp_rules(mesh, min_size=64)

        def make_trainer():
            net = tiny_net()
            tx = get_optimizer("adamW", learning_rate=1e-2)
            return Trainer(
                net, tx,
                config=TrainStepConfig(compute_dtype=jnp.float32),
                mesh=mesh, partition_rules=rules,
            )

        # fixed per-step rngs so the resumed run replays steps 2-3 exactly
        rngs, r = [], KEY
        for _ in range(4):
            r, sub = jax.random.split(r)
            rngs.append(sub)

        def steps(trainer, state, lo, hi):
            for i in range(lo, hi):
                b = shard_batch(mesh, batch_of(seed=i))
                state, m = trainer._train_step_nomask(
                    state, b, rngs[i],
                    jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32),
                    jnp.asarray(1.0, jnp.float32),
                )
            return state

        t1 = make_trainer()
        s_full = steps(t1, t1.init_state(KEY, batch_of()), 0, 4)

        t2 = make_trainer()
        s_half = steps(t2, t2.init_state(KEY, batch_of()), 0, 2)
        path = save_checkpoint(str(tmp_path), s_half, "mid")

        t3 = make_trainer()
        template = t3.init_state(jax.random.PRNGKey(99), batch_of())
        restored = load_checkpoint(path, template, restore_optimizer=True)
        # the restore must land SHARDED (not replicated)
        n_sharded = sum(
            1 for x in jax.tree_util.tree_leaves(restored.params)
            if any(ax is not None for ax in getattr(x.sharding, "spec", ()))
        )
        assert n_sharded > 0, "restored params lost their sharding"
        assert int(jax.device_get(restored.step)) == 2
        s_resumed = steps(t3, restored, 2, 4)

        for (path_k, a), b in zip(
            jax.tree_util.tree_leaves_with_path(s_full.params),
            jax.tree_util.tree_leaves(s_resumed.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                err_msg=f"resume mismatch at {jax.tree_util.keystr(path_k)}",
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_full.batch_stats),
            jax.tree_util.tree_leaves(s_resumed.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

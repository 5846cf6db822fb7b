"""NaN dump/replay, profiling utilities, launcher score stage."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asv_subtools_tpu.models import SpeakerNet, Xvector
from asv_subtools_tpu.train import (
    TrainStepConfig,
    Trainer,
    get_optimizer,
    init_train_state,
    make_train_step,
)
from asv_subtools_tpu.train.debug import dump_nan_batch, load_nan_batch, replay_nan_batch
from asv_subtools_tpu.utils.profiling import benchmark, flops_estimate, param_count

KEY = jax.random.PRNGKey(0)


def tiny_net():
    return SpeakerNet(
        backbone=Xvector(num_frame_channels=16, embd_dim=8),
        loss_name="softmax", loss_params={}, num_targets=4,
    )


class TestNanDebug:
    def test_dump_and_replay_localizes_nan(self, tmp_path):
        net = tiny_net()
        tx = get_optimizer("sgd", learning_rate=1e-2)
        batch = {
            "x": jnp.ones((4, 20, 8)),
            "y": jnp.zeros(4, jnp.int32),
        }
        state = init_train_state(net, KEY, batch, tx)
        bad = dict(batch)
        bad["x"] = batch["x"].at[0, 0, 0].set(jnp.nan)
        step = jax.jit(make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32)))
        state2, metrics = step(state, bad, KEY)
        assert float(metrics["skipped"]) == 1.0
        path = dump_nan_batch(str(tmp_path), state, bad, metrics)
        assert os.path.exists(path)
        report = replay_nan_batch(path, net)
        assert report["x_finite"] is False  # localized: the input was bad
        assert report["params_finite"] is True
        assert report["loss_finite"] is False

    def test_trainer_dumps_on_skip(self, tmp_path):
        net = tiny_net()
        tx = get_optimizer("sgd", learning_rate=1e-2)
        trainer = Trainer(
            net, tx, config=TrainStepConfig(compute_dtype=jnp.float32),
            nan_debug_dir=str(tmp_path / "nan"),
            report_interval=100,
        )
        batch = {
            "x": jnp.full((8, 20, 8), jnp.nan),
            "y": jnp.zeros(8, jnp.int32),
        }
        state = trainer.init_state(KEY, batch)
        state, _ = trainer.run_epoch(state, iter([batch]), KEY)
        dumps = os.listdir(tmp_path / "nan")
        assert len(dumps) == 1


class TestProfiling:
    def test_flops_estimate_matmul(self):
        a = jnp.ones((64, 128))
        b = jnp.ones((128, 256))
        cost = flops_estimate(lambda x, y: x @ y, a, b)
        # 2*M*N*K flops
        assert cost["flops"] == pytest.approx(2 * 64 * 128 * 256, rel=0.1)

    def test_benchmark_runs(self):
        a = jnp.ones((128, 128))
        f = jax.jit(lambda x: x @ x)
        stats = benchmark(f, a, iters=3, warmup=1)
        assert stats["seconds_per_call"] > 0

    def test_param_count(self):
        net = tiny_net()
        v = net.init(
            {"params": KEY, "dropout": KEY}, jnp.ones((1, 20, 8)),
            jnp.zeros(1, jnp.int32), train=False,
        )
        counts = param_count(v["params"])
        assert counts["total"] > 0
        assert "backbone" in counts and "loss" in counts


class TestLauncherScore:
    def test_score_stage(self, tmp_path):
        from asv_subtools_tpu.io import ArkScpWriter
        from asv_subtools_tpu.launcher import Launcher

        rng = np.random.default_rng(0)
        spk_means = rng.normal(size=(6, 16)) * 3
        # train vectors
        with ArkScpWriter(str(tmp_path / "tr.ark"), str(tmp_path / "tr.scp"), matrix=False) as w:
            with open(tmp_path / "utt2spk", "w") as f:
                for s in range(6):
                    for i in range(10):
                        v = (spk_means[s] + rng.normal(size=16)).astype(np.float32)
                        w.write(f"s{s}u{i}", v)
                        f.write(f"s{s}u{i} spk{s}\n")
        # enroll/test from 2 held-out speakers
        em = rng.normal(size=(2, 16)) * 3
        with ArkScpWriter(str(tmp_path / "e.ark"), str(tmp_path / "e.scp"), matrix=False) as w:
            for i in range(2):
                w.write(f"e{i}", (em[i] + rng.normal(size=16)).astype(np.float32))
        with ArkScpWriter(str(tmp_path / "t.ark"), str(tmp_path / "t.scp"), matrix=False) as w:
            for i in range(2):
                w.write(f"t{i}", (em[i] + rng.normal(size=16)).astype(np.float32))
        with open(tmp_path / "trials", "w") as f:
            for i in range(2):
                for j in range(2):
                    f.write(f"e{i} t{j} {'target' if i == j else 'nontarget'}\n")

        launcher = Launcher({"exp_dir": str(tmp_path / "exp")})
        out = launcher.score(
            str(tmp_path / "tr.scp"), str(tmp_path / "utt2spk"),
            str(tmp_path / "e.scp"), str(tmp_path / "t.scp"),
            str(tmp_path / "trials"),
        )
        assert out["num_trials"] == 4
        assert out["eer"] <= 0.5

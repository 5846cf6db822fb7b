"""K-step INTEGRATED training-loop parity vs the reference stack (VERDICT r3 #2).

One-step/plain-SGD parity (test_train_parity.py) cannot catch interaction
bugs between the loop-level subsystems. This harness runs 10 optimizer
steps through the REAL Trainer loop (Trainer.run_epoch — the code path the
Launcher drives) with everything active at once:

  AdamW (decoupled wd)        + cyclic LR stepped per optimizer step
  + MarginWarm offset/lambda  + gradient accumulation (accum_grad=2)
  + BN running-stat updates   + max_change clipping (engages mid-run)

against a faithful transcription of the reference loop
(trainer_online.py:218-327 train_one_batch: loss/accum backward per
microbatch -> clip_grad_norm_ -> optimizer.step() -> scheduler.step();
:470-494 run: model.step_iter(epoch, cur_step) per batch with the
max(1e-3, lambda) clamp of ecapa_tdnn_xvector.py:524-527; CyclicLR via
lr_scheduler_online.py:81-87), in FLOAT64, then compares every parameter
and BN running stat leaf-by-leaf.

Microbatch correspondence: our step consumes ONE host batch of B=8 and
scans accum_grad=2 microbatches of 4 inside the jitted step; the
reference consumes 2 loader batches per optimizer step — fed here the
same 4-row slices in the same order, so BN running stats see identical
microbatch sequences.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from asv_subtools_tpu.convert import (
    convert_ecapa_state_dict,
    convert_resnet_state_dict,
)
from asv_subtools_tpu.models import EcapaTdnn, ResNetXvector
from asv_subtools_tpu.models.framework import SpeakerNet
from asv_subtools_tpu.nn.loss import MarginWarm
from asv_subtools_tpu.train import get_lr_schedule, get_optimizer
from asv_subtools_tpu.train.trainer import (
    TrainState,
    TrainStepConfig,
    Trainer,
)

from test_train_parity import (  # noqa: E402  (shared harness helpers)
    MARGIN,
    N_TARGETS,
    _assert_tree_close,
    _load_ref_module,
    _margin_loss_tree,
    _to_f64,
)

K_STEPS = 10
ACCUM = 2
BATCH = 8  # per optimizer step; microbatch = BATCH // ACCUM
BASE_LR, MAX_LR = 1e-3, 6e-3
STEP_UP, STEP_DOWN = 3, 3  # 10 steps cross a full triangular2 cycle
WEIGHT_DECAY = 0.01
# MarginWarm over epoch_iter=4: steps 0 (init), 1-3 (warm ramp),
# 4+ (fixed) — all three phases inside the 10-step run
MW_CFG = dict(start_epoch=1, end_epoch=2, offset_margin=-0.15,
              init_lambda=0.0)
MW_EPOCH_ITER = 4


def _torch_loop(ref, xs, ys, max_change, forward_fn=None,
                base_lr=None, max_lr=None, k_steps=K_STEPS):
    """Faithful reference loop (see module docstring for the file:line
    map). Returns the per-step clipped grad norms (to certify the clip
    actually engaged) and per-step mean micro losses."""
    import sys

    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    import libs.nnet.loss as ref_loss_mod

    base_lr = BASE_LR if base_lr is None else base_lr
    max_lr = MAX_LR if max_lr is None else max_lr
    ref.train()
    opt = torch.optim.AdamW(
        ref.parameters(), lr=base_lr, weight_decay=WEIGHT_DECAY
    )
    sched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr, max_lr, step_size_up=STEP_UP,
        step_size_down=STEP_DOWN, mode="triangular2", cycle_momentum=False,
    )
    mw = ref_loss_mod.MarginWarm(**MW_CFG)
    mw.update_step_range(MW_EPOCH_ITER, overwrite=True)
    fwd = forward_fn or ref.forward
    mb = BATCH // ACCUM
    gnorms, losses = [], []
    for k in range(k_steps):
        offset, lam = mw.step(k)
        lam = max(1e-3, lam)  # step_iter clamp (ecapa_tdnn_xvector.py:526)
        ref.loss.step(lam, offset)
        opt.zero_grad()
        step_loss = 0.0
        for m in range(ACCUM):
            x = torch.from_numpy(
                np.ascontiguousarray(
                    np.transpose(xs[k][m * mb:(m + 1) * mb], (0, 2, 1))
                )
            ).double()
            y = torch.from_numpy(ys[k][m * mb:(m + 1) * mb])
            loss = ref.get_loss(fwd(x), y) / ACCUM
            loss.backward()
            step_loss += float(loss.detach()) * ACCUM
        gnorm = torch.nn.utils.clip_grad_norm_(ref.parameters(), max_change)
        gnorms.append(float(gnorm))
        losses.append(step_loss / ACCUM)
        opt.step()
        sched.step()
    return gnorms, losses


def _jax_loop(net, params, batch_stats, xs, ys, max_change,
              base_lr=None, max_lr=None, k_steps=K_STEPS):
    """The REAL Trainer loop: run_epoch over K host batches with the full
    production config (cyclic AdamW schedule, MarginWarm, accum, clip)."""
    with jax.enable_x64():
        params = _to_f64(params)
        batch_stats = _to_f64(batch_stats)
        schedule = get_lr_schedule(
            "cyclic",
            base_lr=BASE_LR if base_lr is None else base_lr,
            max_lr=MAX_LR if max_lr is None else max_lr,
            step_size_up=STEP_UP, step_size_down=STEP_DOWN,
            mode="triangular2",
        )
        tx = get_optimizer(
            "adamW", learning_rate=schedule, weight_decay=WEIGHT_DECAY
        )
        trainer = Trainer(
            net, tx,
            lr_schedule=schedule,
            config=TrainStepConfig(
                max_change=max_change, accum_grad=ACCUM,
                compute_dtype=jnp.float64, skip_nonfinite=False,
            ),
            margin_warm=MarginWarm(**MW_CFG, epoch_iter=MW_EPOCH_ITER),
            report_interval=10_000,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )
        batches = [
            {"x": jnp.asarray(xs[k], jnp.float64),
             "y": jnp.asarray(ys[k], jnp.int32)}
            for k in range(k_steps)
        ]
        state, metrics = trainer.run_epoch(
            state, iter(batches), jax.random.PRNGKey(0), epoch=0
        )
        state = jax.device_get(state)
    assert int(state.step) == k_steps
    return state, metrics


def _run_loop_parity(ref, net, convert_fn, xs, ys, max_change,
                     forward_fn=None, rtol=2e-5, atol=1e-7,
                     base_lr=None, max_lr=None, k_steps=K_STEPS,
                     require_unclipped=True):
    # rtol 2e-5 (vs 1e-6 in the one-step tests): the state-dict converters
    # emit f32 leaves, so the torch-side reference values carry ~1e-7
    # relative quantization, and our cyclic schedule computes the lr in
    # f32; Adam's rsqrt normalization amplifies both over the 10 steps to
    # ~5e-6 observed — far below the 1e-3+ scale of any semantic bug this
    # test exists to catch (wrong step count, missing clamp, lr off by
    # one, BN stat misflow).
    ref.double()
    # quantize the torch weights to f32-representable values: the
    # converters emit f32 leaves, so without this the two trajectories
    # START 1e-7 apart and a chaotic configuration amplifies that seed
    # noise, not semantics
    with torch.no_grad():
        for p in ref.parameters():
            p.data = p.data.float().double()
        for b in ref.buffers():
            if b.is_floating_point():
                b.data = b.data.float().double()
    params_bb, stats_bb = convert_fn(ref.state_dict())
    params = {"backbone": params_bb, **_margin_loss_tree(ref.state_dict())}
    batch_stats = {"backbone": stats_bb}

    state, metrics = _jax_loop(net, params, batch_stats, xs, ys, max_change,
                               base_lr=base_lr, max_lr=max_lr,
                               k_steps=k_steps)
    gnorms, ref_losses = _torch_loop(
        ref, xs, ys, max_change, forward_fn=forward_fn,
        base_lr=base_lr, max_lr=max_lr, k_steps=k_steps,
    )

    # the clip must ENGAGE on some steps and NOT on others, or the test
    # never certifies both branches of the interaction
    assert any(g > max_change for g in gnorms), (gnorms, "clip never engaged")
    if require_unclipped:
        assert any(g <= max_change for g in gnorms), (gnorms,
                                                      "clip always on")

    # epoch-mean loss (run_epoch reports the mean of per-step means).
    # rtol 1e-4: the margin loss (s=30 exponentials) amplifies the ~5e-6
    # param-trajectory noise 10-100x into the loss value; this check
    # exists to catch gross metric bugs (unit errors, off-by-accum),
    # which are >1e-2
    np.testing.assert_allclose(
        metrics["loss"], float(np.mean(ref_losses)), rtol=1e-4
    )

    params_bb2, stats_bb2 = convert_fn(ref.state_dict())
    _assert_tree_close(
        state.params["backbone"], params_bb2, rtol, atol,
        f"{k_steps}-step param"
    )
    heads = {k: v for k, v in state.params.items() if k != "backbone"}
    _assert_tree_close(
        heads, _margin_loss_tree(ref.state_dict()), rtol, atol,
        f"{k_steps}-step loss param",
    )
    _assert_tree_close(
        state.batch_stats["backbone"], stats_bb2, rtol, atol,
        f"{k_steps}-step bn stat"
    )


def _batches(rng, feat, t_frames):
    xs = [rng.normal(size=(BATCH, t_frames, feat)).astype(np.float32)
          for _ in range(K_STEPS)]
    ys = [rng.integers(0, N_TARGETS, size=BATCH).astype(np.int64)
          for _ in range(K_STEPS)]
    return xs, ys


class TestEcapaLoopParity:
    def test_ten_steps_integrated(self):
        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/ecapa_tdnn_xvector.py",
            "ecapa_loop_ref",
        )
        torch.manual_seed(0)
        feat, channels, embd, mfa = 30, 64, 16, 96
        ref = ref_mod.ECAPA_TDNN(
            feat, N_TARGETS, training=True,
            ecapa_params={"channels": channels, "embd_dim": embd,
                          "mfa_conv": mfa},
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        net = SpeakerNet(
            backbone=EcapaTdnn(channels=channels, embd_dim=embd,
                               mfa_conv=mfa),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        xs, ys = _batches(np.random.default_rng(0), feat, 80)
        # max_change sits inside the observed grad-norm range (unclipped
        # probe: 270-524) so the clip engages on SOME steps only — both
        # branches of the interaction are exercised (asserted below)
        _run_loop_parity(ref, net, convert_ecapa_state_dict, xs, ys,
                         max_change=340.0)


class TestResnetLoopParity:
    def test_ten_steps_integrated(self):
        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/resnet_xvector.py",
            "resnet_loop_ref",
        )
        torch.manual_seed(0)
        feat = 24
        ref = ref_mod.ResNetXvector(
            feat, N_TARGETS, training=True,
            resnet_params={"planes": [8, 16, 32, 64],
                           "layers": [1, 1, 1, 1]},
            fc1=False, fc1_params={},
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        embd = ref.state_dict()["fc2.affine.weight"].shape[0]
        freq_out = -(-feat // 8)
        net = SpeakerNet(
            backbone=ResNetXvector(base_planes=8, layers=(1, 1, 1, 1),
                                   embd_dim=embd),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        xs, ys = _batches(np.random.default_rng(1), feat, 64)
        _run_loop_parity(
            ref, net, lambda sd: convert_resnet_state_dict(sd, freq_out),
            xs, ys, max_change=150.0,  # probe range 98-383
            # reference forward() has the `self.self.cmvn_` typo
            # (resnet_xvector.py:152); extract_embedding_jit(near) is the
            # identical graph (see test_train_parity.TestResnetTrainParity)
            forward_fn=lambda t: ref.extract_embedding_jit(t, "near"),
        )


class TestConformerLoopParity:
    """The conformer is the one family whose trajectory parity has an
    IRREDUCIBLE per-step noise floor: its sinusoidal pos-table and the
    margin acos evaluate through different transcendental libraries (libm
    vs XLA, ~6e-6 relative on isolated gradient elements — see
    test_train_parity's conformer note), and that noise is re-injected at
    EVERY forward, then amplified by the trajectory's Lyapunov growth.
    Measured: leaf diffs 4e-4 by step 10 even at a low lr, with step-1
    diffs at the 1e-7 quantization floor — i.e. compounding, not
    semantics. So the integrated-loop gate splits in two:

      * TIGHT at k=3 (margin-warm init + ramp, cyclic up-phase, accum,
        clip, BN flow all active) — before amplification;
      * the FULL 10 steps with a coarse band that still catches any
        semantic break (wrong lr indexing, missing clamp, BN misflow all
        move params by >1e-2 absolute).
    """

    def _make(self):
        from asv_subtools_tpu.convert import convert_conformer_state_dict
        from asv_subtools_tpu.models import ConformerXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/transformer_xvector.py",
            "conf_loop_ref",
        )
        torch.manual_seed(0)
        feat, d_att, blocks = 30, 32, 2
        old_dtype = torch.get_default_dtype()
        torch.set_default_dtype(torch.float64)
        try:
            ref = ref_mod.TransformerXvector(
                feat, N_TARGETS, training=True, embd_dim=16,
                transformer_params={
                    "attention_dim": d_att, "attention_heads": 2,
                    "linear_units": 64, "num_blocks": blocks,
                    "pos_enc_type": "rel_pos", "input_layer": "conv2d",
                    "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
                    "attention_dropout_rate": 0.0,
                },
                tansformer_out={"out_dim": 48},
                margin_loss=True, margin_loss_params=dict(MARGIN),
            )
        finally:
            torch.set_default_dtype(old_dtype)
        freq_out = ((feat - 1) // 2 - 1) // 2
        net = SpeakerNet(
            backbone=ConformerXvector(
                embd_dim=16, attention_dim=d_att, attention_heads=2,
                linear_units=64, num_blocks=blocks, out_dim=48,
                dropout_rate=0.0,
            ),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        xs, ys = _batches(np.random.default_rng(2), feat, 80)

        def conv(sd):
            return convert_conformer_state_dict(sd, blocks, freq_out)

        fwd = lambda t: ref.forward(
            t, torch.full((t.shape[0],), 80, dtype=torch.long)
        )
        return ref, net, conv, xs, ys, fwd

    def test_three_steps_tight(self):
        ref, net, conv, xs, ys, fwd = self._make()
        # atol 2e-5: the worst leaf even at k=3 is the pos-projection
        # kernel — the weight that directly multiplies the
        # transcendentally-divergent pos table (observed 9.4e-6 absolute,
        # pure libm-vs-XLA); every other leaf sits well under 1e-6
        _run_loop_parity(
            ref, net, conv, xs, ys, max_change=500.0,  # probe 289-988
            forward_fn=fwd, rtol=5e-5, atol=2e-5,
            base_lr=2e-4, max_lr=1e-3, k_steps=3,
        )

    def test_ten_steps_integrated_coarse(self):
        ref, net, conv, xs, ys, fwd = self._make()
        _run_loop_parity(
            ref, net, conv, xs, ys, max_change=500.0,
            forward_fn=fwd, rtol=5e-2, atol=2e-3,
            base_lr=2e-4, max_lr=1e-3, k_steps=10,
        )

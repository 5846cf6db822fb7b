"""One-step TRAINING parity vs the reference torch stack (VERDICT r1 #1).

Forward parity (test_convert_parity.py) cannot catch deviations in loss/BN/
clip/optimizer-step semantics; this harness can. It instantiates a reference
model (torch CPU, train mode, AAM margin loss active), converts the weights,
runs ONE plain-SGD optimization step in both frameworks on the identical
batch, and asserts:

  * loss allclose                  (loss semantics: margin penalty, CE mean)
  * clipped grad global-norm close (backward + max_change clip semantics,
                                    reference trainer_online.py:218-327)
  * every updated parameter close  (optimizer step + lr semantics)
  * every updated BN running stat close (momentum + unbiased-var semantics)

The torch-updated state_dict is re-converted after opt.step() so the
comparison covers the WHOLE tree leaf-by-leaf, not a sample of tensors.

Both sides run in FLOAT64 (torch .double() + jax.experimental.enable_x64):
in f32 the train-mode bn_stats layer z-scores pooled statistics across a
batch of 4 near-identical samples, amplifying conv-algorithm rounding noise
to ~1e-2 and masking real semantic bugs. In f64 the comparison is tight
(1e-6) so any deviation in loss/BN/clip/step semantics fails loudly.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from asv_subtools_tpu.convert import (
    convert_ecapa_state_dict,
    convert_resnet_state_dict,
)
from asv_subtools_tpu.models import EcapaTdnn, ResNetXvector
from asv_subtools_tpu.models.framework import SpeakerNet
from asv_subtools_tpu.train.trainer import (
    TrainState,
    TrainStepConfig,
    make_train_step,
)

LR = 0.05
N_TARGETS = 20
# "s" left to its default (30) on both sides: the reference's
# assign_params_dict type-checks float-vs-int on overrides.
MARGIN = {"method": "aam", "m": 0.2}


def _load_ref_module(path, name):
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference model: {e}")
    return mod


def _torch_sgd_step(ref, x_bdt, y, max_change, forward_fn=None):
    """loss -> backward -> clip_grad_norm_(max_change) -> SGD step
    (trainer_online.py:263-305 + modify_grad :315-327)."""
    ref.train()
    opt = torch.optim.SGD(ref.parameters(), lr=LR)
    opt.zero_grad()
    fwd = forward_fn or ref.forward
    out = fwd(torch.from_numpy(x_bdt).double())
    if isinstance(out, tuple):  # multitask: forward already consumed targets
        loss = ref.get_loss(*out)
    else:
        loss = ref.get_loss(out, torch.from_numpy(y))
    loss.backward()
    gnorm = torch.nn.utils.clip_grad_norm_(ref.parameters(), max_change)
    opt.step()
    return float(loss.detach()), float(gnorm)


def _to_f64(tree):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree
    )


def _jax_sgd_step(net, params, batch_stats, x_btd, y, max_change,
                  config_extra=None):
    with jax.enable_x64():
        params = _to_f64(params)
        batch_stats = _to_f64(batch_stats)
        tx = optax.sgd(LR)
        step = make_train_step(
            net, tx,
            config=TrainStepConfig(
                max_change=max_change, compute_dtype=jnp.float64,
                skip_nonfinite=False, **(config_extra or {}),
            ),
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )
        batch = {
            "x": jnp.asarray(x_btd, jnp.float64),
            "y": jax.tree_util.tree_map(
                lambda t: jnp.asarray(t, jnp.int32), y
            ),
        }
        new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        new_state = jax.device_get(new_state)
        metrics = jax.device_get(metrics)
    return new_state, metrics


def _assert_tree_close(ours, ref_tree, rtol, atol, what):
    flat_o, _ = jax.tree_util.tree_flatten_with_path(ours)
    flat_r = jax.tree_util.tree_leaves(ref_tree)
    assert len(flat_o) == len(flat_r)
    for (path, o), r in zip(flat_o, flat_r):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=rtol, atol=atol,
            err_msg=f"{what} mismatch at {jax.tree_util.keystr(path)}",
        )


def _margin_loss_tree(sd):
    """Head params beside "backbone", keyed as the net names them."""
    return {"loss": {"weight": sd["loss.weight"].detach().numpy()[:, :, 0]}}


def _softmax_loss_tree(sd):
    """reference SoftmaxLoss: TdnnAffine weight [out,in,1] + bias."""
    return {"loss": {"affine": {
        "kernel": sd["loss.affine.weight"].detach().numpy()[:, :, 0].T,
        "bias": sd["loss.affine.bias"].detach().numpy(),
    }}}


def _run_parity(ref, net, convert_fn, x_btd, y, max_change, expect_clipped,
                forward_fn=None, rtol=1e-6, atol=1e-8,
                loss_tree_fn=_margin_loss_tree, config_extra=None):
    ref.double()
    params_bb, stats_bb = convert_fn(ref.state_dict())
    params = {"backbone": params_bb, **loss_tree_fn(ref.state_dict())}
    batch_stats = {"backbone": stats_bb}

    new_state, metrics = _jax_sgd_step(
        net, params, batch_stats, x_btd, y, max_change,
        config_extra=config_extra,
    )
    x_bdt = np.ascontiguousarray(np.transpose(x_btd, (0, 2, 1)))
    ref_loss, ref_gnorm = _torch_sgd_step(
        ref, x_bdt, y, max_change, forward_fn=forward_fn
    )

    if expect_clipped:
        assert ref_gnorm > max_change, "clip did not engage; test is vacuous"

    # f64 on both sides: only op-ordering rounding remains. The trainer
    # reports the loss metric rounded to f32, hence 1e-6 instead of 1e-12.
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=rtol)
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), ref_gnorm, rtol=rtol
    )

    # Re-convert the torch-updated weights: leaf-by-leaf comparison of the
    # full updated tree (params AND BN running stats).
    params_bb2, stats_bb2 = convert_fn(ref.state_dict())
    _assert_tree_close(
        new_state.params["backbone"], params_bb2, rtol, atol, "param"
    )
    heads = {k: v for k, v in new_state.params.items() if k != "backbone"}
    _assert_tree_close(
        heads, loss_tree_fn(ref.state_dict()), rtol, atol, "loss param",
    )
    _assert_tree_close(
        new_state.batch_stats["backbone"], stats_bb2, rtol, atol, "bn stat"
    )


class TestEcapaTrainParity:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        return _load_ref_module(
            "/root/reference/pytorch/model/ecapa_tdnn_xvector.py", "ecapa_tref"
        )

    def _make(self, ref_mod, seed=0):
        torch.manual_seed(seed)
        feat, channels, embd, mfa = 30, 64, 16, 96
        ref = ref_mod.ECAPA_TDNN(
            feat, N_TARGETS, training=True,
            ecapa_params={"channels": channels, "embd_dim": embd,
                          "mfa_conv": mfa},
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        net = SpeakerNet(
            backbone=EcapaTdnn(channels=channels, embd_dim=embd, mfa_conv=mfa),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        return ref, net, x, y

    def test_one_step_no_clip(self, ref_mod):
        ref, net, x, y = self._make(ref_mod, seed=0)
        _run_parity(ref, net, convert_ecapa_state_dict, x, y,
                    max_change=1e4, expect_clipped=False)

    def test_one_step_clip_engaged(self, ref_mod):
        """max_change below the natural grad norm: certifies that both sides
        scale by max_change/gnorm identically."""
        ref, net, x, y = self._make(ref_mod, seed=1)
        _run_parity(ref, net, convert_ecapa_state_dict, x, y,
                    max_change=0.25, expect_clipped=True)


class TestConformerTrainParity:
    def test_one_step(self):
        from asv_subtools_tpu.convert import convert_conformer_state_dict
        from asv_subtools_tpu.models import ConformerXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/transformer_xvector.py",
            "conf_tref",
        )
        torch.manual_seed(0)
        feat, d_att, blocks = 30, 32, 2
        # construct under f64 default dtype: the rel-pos table self.pe is a
        # plain attribute (not a buffer), so ref.double() would miss it
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
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)

        def conv(sd):
            return convert_conformer_state_dict(sd, blocks, freq_out)

        # reference forward(x, x_len, warmup): full lengths = all-valid
        # masks (our side runs unmasked), warmup 1.0 = plain path
        t_frames = x.shape[1]
        # rtol 2e-5 (vs 1e-6 for the TDNN families): the conformer's
        # sinusoidal pos-table and the margin loss's acos evaluate through
        # different transcendental libraries (libm vs XLA), leaving ~6e-6
        # relative on isolated gradient elements even in f64 — far below
        # any semantic-bug threshold (the eps bugs this test caught were
        # 1e-4 to 3e-4).
        _run_parity(
            ref, net, conv, x, y, max_change=1e4, expect_clipped=False,
            forward_fn=lambda t: ref.forward(
                t, torch.full((t.shape[0],), t_frames, dtype=torch.long)
            ),
            rtol=2e-5, atol=1e-7,
        )

    def test_one_step_model_warmup(self):
        """Model-level warmup (trainer_online.py:227-248 feeds
        warmup=cur_step/warmup_steps into the transformer; each encoder
        layer blends alpha*x_out + (1-alpha)*x_in with
        alpha=min(0.1+warmup, 1), encoder_layer.py:224-232,331-333).
        At step 0 with model_warmup_steps=4 our warmup is 0.0 ->
        alpha=0.1, deterministic since layer_dropout=0."""
        from asv_subtools_tpu.convert import convert_conformer_state_dict
        from asv_subtools_tpu.models import ConformerXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/transformer_xvector.py",
            "conf_tref_warm",
        )
        torch.manual_seed(1)
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
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)

        def conv(sd):
            return convert_conformer_state_dict(sd, blocks, freq_out)

        t_frames = x.shape[1]
        _run_parity(
            ref, net, conv, x, y, max_change=1e4, expect_clipped=False,
            # warmup passed positionally: the reference wraps forward in
            # for_device_free whose wrapper takes *args only
            forward_fn=lambda t: ref.forward(
                t, torch.full((t.shape[0],), t_frames, dtype=torch.long),
                torch.tensor([0.0], dtype=torch.float64),
            ),
            rtol=2e-5, atol=1e-7,
            config_extra={"model_warmup_steps": 4},
        )


class TestSnowdarTrainParity:
    def test_one_step(self):
        from asv_subtools_tpu.convert import convert_snowdar_state_dict
        from asv_subtools_tpu.models import Xvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/snowdar_xvector.py",
            "snowdar_tref",
        )
        torch.manual_seed(0)
        feat = 30
        ref = ref_mod.Xvector(
            feat, N_TARGETS, training=True,
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=512, embd_dim=512),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 90, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        _run_parity(ref, net, convert_snowdar_state_dict, x, y,
                    max_change=1e4, expect_clipped=False)


class TestSnowdarSETrainParity:
    def test_one_step_se(self):
        """snowdar SE=True: certifies SEBlock placement (after tdnn1-3
        only) and the fc_1/fc_2 conversion (components.py:565-598)."""
        from asv_subtools_tpu.convert import convert_snowdar_state_dict
        from asv_subtools_tpu.models import SnowdarXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/snowdar_xvector.py",
            "snowdar_tref3",
        )
        torch.manual_seed(0)
        feat = 30
        ref = ref_mod.Xvector(
            feat, N_TARGETS, training=True, SE=True, se_ratio=4,
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        net = SpeakerNet(
            backbone=SnowdarXvector(se_block=True, se_ratio=4),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 90, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        _run_parity(ref, net, convert_snowdar_state_dict, x, y,
                    max_change=1e4, expect_clipped=False)


class TestExtendedTrainParity:
    def test_one_step_extend_skip(self):
        """snowdar extend=True + skip_connection=True: certifies the E-TDNN
        interleave topology (9 hidden layers) and the single tdnn1->tdnn4
        identity-skip semantics (reference snowdar_xvector.py:185-205)."""
        from asv_subtools_tpu.convert import convert_snowdar_state_dict
        from asv_subtools_tpu.models import SnowdarXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/snowdar_xvector.py",
            "snowdar_tref2",
        )
        torch.manual_seed(0)
        feat = 30
        ref = ref_mod.Xvector(
            feat, N_TARGETS, training=True, extend=True, skip_connection=True,
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        net = SpeakerNet(
            backbone=SnowdarXvector(extend=True, skip_connection=True),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 90, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        _run_parity(ref, net, convert_snowdar_state_dict, x, y,
                    max_change=1e4, expect_clipped=False)


class TestRepVggTrainParity:
    def test_one_step_train_shape(self):
        """RepVGG in TRAIN shape: one step covers the multi-branch
        (3x3 + dilated/1x1 + identity) convs with a separate BN per branch
        — the structure deploy-reparam folds away, only exercisable in
        training (reference repvgg.py:106-180)."""
        from asv_subtools_tpu.convert import convert_repvgg_state_dict
        from asv_subtools_tpu.models import RepVggXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/repvgg_xvector.py", "repvgg_tref"
        )
        torch.manual_seed(0)
        feat, embd, base = 16, 32, 16
        num_blocks, wm = (1, 1, 1, 1), (1, 1, 1, 1)
        freq_out = -(-feat // 8)
        ref = ref_mod.RepVggXvector(
            feat, N_TARGETS, embd_dim=embd, training=True,
            margin_loss=True, margin_loss_params=dict(MARGIN),
            repvgg_config={
                "block": "RepSPK",
                "repvgg_params": {
                    "num_blocks": list(num_blocks),
                    "strides": [1, 1, 2, 2, 2],
                    "base_width": base,
                    "width_multiplier": list(wm),
                    "norm_layer_params": {"momentum": 0.5, "affine": True},
                    "override_groups_map": None,
                    "use_se": False,
                },
            },
        )
        net = SpeakerNet(
            backbone=RepVggXvector(
                num_blocks=num_blocks, width_multiplier=wm,
                base_channels=base, block="spk", embd_dim=embd,
            ),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 40, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        _run_parity(
            ref, net,
            lambda sd: convert_repvgg_state_dict(
                sd, freq_out, num_blocks=num_blocks
            ),
            x, y, max_change=1e4, expect_clipped=False,
        )


class TestFactoredTrainParity:
    def test_one_step(self):
        """F-TDNN one step (softmax loss — the reference model supports no
        margin loss, factored_xvector.py:55): exercises FTdnnBlock factor
        pairs, bypass scales, the two concat skips, and the SoftmaxLoss
        affine head."""
        from asv_subtools_tpu.convert import convert_ftdnn_state_dict
        from asv_subtools_tpu.models import FactoredXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/factored_xvector.py", "ftdnn_tref"
        )
        torch.manual_seed(0)
        feat = 30
        ref = ref_mod.Xvector(
            feat, N_TARGETS, training=True, aug_dropout=0.0, semi_orth=False,
        )
        net = SpeakerNet(
            backbone=FactoredXvector(width=1.0, embd_dim=512),
            loss_name="softmax",
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 60, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=2)).astype(np.int64)
        _run_parity(ref, net, convert_ftdnn_state_dict, x, y,
                    max_change=1e4, expect_clipped=False,
                    loss_tree_fn=_softmax_loss_tree)


class TestMultiTaskTrainParity:
    def test_one_step(self):
        """Speaker + frame-phone joint loss (loss = spk + mt_alpha*phone,
        multi_task_xvector_fix.py:230-243): one step through MultiTaskNet
        with dict targets covers both heads, the shared-trunk gradient sum,
        and the frame-phone affine."""
        from asv_subtools_tpu.convert import convert_multitask_state_dict
        from asv_subtools_tpu.models import MultiTaskNet, MultiTaskXvector

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/multi_task_xvector_fix.py",
            "mt_tref",
        )
        torch.manual_seed(0)
        feat, n_phones, mt_alpha = 30, 12, 0.1
        ref = ref_mod.Xvector(
            feat, N_TARGETS, n_phones, training=True, aug_dropout=0.0,
            margin_loss=True, margin_loss_params=dict(MARGIN),
            mt_alpha=mt_alpha,
        )
        net = MultiTaskNet(
            backbone=MultiTaskXvector(),
            num_targets=N_TARGETS, num_phones=n_phones,
            loss_name="margin_softmax", loss_params=dict(MARGIN),
            mt_alpha=mt_alpha,
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 90, feat)).astype(np.float32)
        y_spk = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        y_phone = (rng.integers(0, n_phones, size=(4, 90))).astype(np.int64)

        def torch_forward(t):
            loss_spk, loss_phone = ref.forward(
                t, torch.from_numpy(y_spk),
                torch.from_numpy(y_phone[:, None, :]),
            )
            return (loss_spk, loss_phone)


        def loss_tree_fn(sd):
            tree = {"loss_spk": {"weight": sd["loss_spk.weight"]
                                 .detach().numpy()[:, :, 0]}}
            tree["phone_affine"] = {
                "kernel": sd["loss_phone.affine.weight"]
                .detach().numpy()[:, :, 0].T,
                "bias": sd["loss_phone.affine.bias"].detach().numpy(),
            }
            return tree

        _run_parity(
            ref, net, convert_multitask_state_dict, x,
            {"spk": y_spk, "phone": y_phone},
            max_change=1e4, expect_clipped=False,
            forward_fn=torch_forward, loss_tree_fn=loss_tree_fn,
        )


class TestFDTrainParity:
    """FD-AL adversarial alternation (trainer_fd.py:427-500): one step in
    EACH phase vs a faithful torch replication of the reference trainer's
    core (the GanDalAttTrainer class itself is too entangled with its data
    plumbing to instantiate).

    main phase: loss = spk(x_part) + 0.1*aux(y_part) + 0.1*cc; backward;
      clip over non-DAL grads; SGD step on non-DAL params.
    adv phase: same loss; backward; FLIP DAL grads; SGD(0.01, momentum
      0.9, wd 1e-4) step on DAL params only, no clip.
    """

    def _setup(self):
        from asv_subtools_tpu.convert import convert_fd_state_dict
        from asv_subtools_tpu.models import FDXvector
        from asv_subtools_tpu.train.fd import FDSpeakerNet

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/snowdar-xvector-FD-AL.py",
            "fd_tref",
        )
        torch.manual_seed(0)
        feat = 30
        # margin_loss=False: the FD file's default_margin_loss_params carry
        # a "noise" key the stock MarginSoftmaxLoss rejects (FD-AL :132 vs
        # loss.py:216) — the reference's margin path cannot instantiate, so
        # softmax heads are its only runnable configuration.
        ref = ref_mod.Xvector(feat, N_TARGETS, training=True, aug_dropout=0.0)
        ref.double()
        net = FDSpeakerNet(
            backbone=FDXvector(),
            num_targets=N_TARGETS,
            loss_name="softmax",
            aux_loss_name="softmax",
        )
        params_bb, stats_bb = convert_fd_state_dict(ref.state_dict())
        sd = ref.state_dict()

        def aff(prefix):
            return {"affine": {
                "kernel": sd[f"{prefix}.affine.weight"]
                .detach().numpy()[:, :, 0].T,
                "bias": sd[f"{prefix}.affine.bias"].detach().numpy(),
            }}

        params = {
            "backbone": params_bb,
            "loss": aff("loss"),
            "loss2": aff("loss2"),
            "dal": {
                "w_id": {"kernel": sd["DAL.w_id.weight"]
                         .detach().numpy()[:, :, 0].T},
                "w_noise": {"kernel": sd["DAL.w_noise.weight"]
                            .detach().numpy()[:, :, 0].T},
            },
        }
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 90, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        y2 = (rng.integers(0, 9, size=4)).astype(np.int64)
        return ref, net, params, stats_bb, x, y, y2

    def _torch_fd_step(self, ref, x_bdt, y, y2, max_change, adv_phase):
        ref.train()
        dal_params = list(ref.DAL.parameters())
        dal_ids = {id(p) for p in dal_params}
        for p in ref.parameters():
            is_dal = id(p) in dal_ids
            p.requires_grad = is_dal if adv_phase else not is_dal
        out = ref.forward(torch.from_numpy(x_bdt).double())
        loss = ref.get_loss(
            out[0], torch.from_numpy(y), out[1], torch.from_numpy(y2)
        ) + 0.1 * out[2]
        if adv_phase:
            opt2 = torch.optim.SGD(
                dal_params, lr=0.01, momentum=0.9, weight_decay=1e-4
            )
            opt2.zero_grad()
            loss.backward()
            for p in dal_params:
                p.grad = -p.grad
            opt2.step()
        else:
            live = [p for p in ref.parameters() if p.requires_grad]
            opt = torch.optim.SGD(live, lr=LR)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(live, max_change)
            opt.step()
        return float(loss.detach())

    def _jax_fd_step(self, net, params, stats_bb, x, y, y2, max_change,
                     step0):
        from asv_subtools_tpu.train.fd import make_fd_train_step

        with jax.enable_x64():
            params = _to_f64(params)
            batch_stats = {"backbone": _to_f64(stats_bb)}
            tx_main = optax.sgd(LR)
            tx_adv = optax.chain(
                optax.add_decayed_weights(1e-4),
                optax.sgd(0.01, momentum=0.9),
            )
            step = make_fd_train_step(
                net, tx_main, tx_adv,
                config=TrainStepConfig(
                    max_change=max_change, compute_dtype=jnp.float64,
                    skip_nonfinite=False,
                ),
            )
            state = TrainState(
                step=jnp.asarray(step0, jnp.int32),
                params=params,
                batch_stats=batch_stats,
                opt_state=(tx_main.init(params), tx_adv.init(params)),
            )
            batch = {
                "x": jnp.asarray(x, jnp.float64),
                "y": jnp.asarray(y, jnp.int32),
                "aux_y": jnp.asarray(y2, jnp.int32),
            }
            new_state, metrics = jax.jit(step)(
                state, batch, jax.random.PRNGKey(0)
            )
            new_state = jax.device_get(new_state)
            metrics = jax.device_get(metrics)
        return new_state, metrics

    @pytest.mark.parametrize("adv_phase,step0", [(False, 20), (True, 0)])
    def test_one_step(self, adv_phase, step0):
        from asv_subtools_tpu.convert import convert_fd_state_dict

        ref, net, params, stats_bb, x, y, y2 = self._setup()
        new_state, metrics = self._jax_fd_step(
            net, params, stats_bb, x, y, y2, max_change=1e4, step0=step0
        )
        assert bool(metrics["phase_adv"]) == adv_phase
        x_bdt = np.ascontiguousarray(np.transpose(x, (0, 2, 1)))
        ref_loss = self._torch_fd_step(ref, x_bdt, y, y2, 1e4, adv_phase)
        np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                                   rtol=1e-6)

        params_bb2, stats_bb2 = convert_fd_state_dict(ref.state_dict())
        sd2 = ref.state_dict()
        _assert_tree_close(new_state.params["backbone"], params_bb2,
                           1e-6, 1e-8, "fd backbone param")
        _assert_tree_close(
            new_state.params["dal"],
            {"w_id": {"kernel": sd2["DAL.w_id.weight"]
                      .detach().numpy()[:, :, 0].T},
             "w_noise": {"kernel": sd2["DAL.w_noise.weight"]
                         .detach().numpy()[:, :, 0].T}},
            1e-6, 1e-8, "fd dal param",
        )
        for k in ("loss", "loss2"):
            np.testing.assert_allclose(
                np.asarray(new_state.params[k]["affine"]["kernel"]),
                sd2[f"{k}.affine.weight"].detach().numpy()[:, :, 0].T,
                rtol=1e-6, atol=1e-8, err_msg=f"fd {k} kernel",
            )
            np.testing.assert_allclose(
                np.asarray(new_state.params[k]["affine"]["bias"]),
                sd2[f"{k}.affine.bias"].detach().numpy(),
                rtol=1e-6, atol=1e-8, err_msg=f"fd {k} bias",
            )
        _assert_tree_close(new_state.batch_stats["backbone"], stats_bb2,
                           1e-6, 1e-8, "fd bn stat")


class TestSemiOrthParity:
    def test_constraint_update_matches_reference(self):
        """Our semi_orth_update vs the reference's Kaldi floating-scale
        update (components.py:218-276) on the same converted factor kernel,
        in f64, after several compounded applications."""
        sys.path.insert(0, "/root/reference/pytorch")
        sys.path.insert(0, "/root/reference/pytorch/libs")
        try:
            from libs.nnet.components import FTdnnBlock
        except Exception as e:  # pragma: no cover
            pytest.skip(f"cannot import reference components: {e}")
        from asv_subtools_tpu.convert import _conv_kernel
        from asv_subtools_tpu.nn.tdnn import semi_orth_update

        # context_size=1 -> context [-1, 0], gapless: the reference's full
        # width-2 kernel has no masked taps, so its raw-weight update is
        # exactly the clean Kaldi update our tap-only kernels implement.
        # (For gapped contexts the reference's P includes the random
        # never-trained values at masked taps — a reference artifact we
        # deliberately drop; see semi_orth_update's docstring.)
        torch.manual_seed(0)
        blk = FTdnnBlock(24, 40, 8, context_size=1).double()
        taps = (0, 1)
        with jax.enable_x64():
            for _ in range(3):
                w = blk.factor.weight.detach().numpy()
                ours = semi_orth_update(
                    jnp.asarray(_conv_kernel(w, taps), jnp.float64)
                )
                blk.step_semi_orth()
                ref_k = _conv_kernel(blk.factor.weight.detach().numpy(), taps)
                np.testing.assert_allclose(
                    np.asarray(ours), ref_k, rtol=1e-9, atol=1e-12
                )
                # continue from the reference's weights so later iterations
                # compound from identical state
                blk.factor.weight.data = blk.factor.weight.data.clone()


class TestResnetTrainParity:
    def test_one_step(self):
        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/resnet_xvector.py", "resnet_tref"
        )
        torch.manual_seed(0)
        feat = 24
        ref = ref_mod.ResNetXvector(
            feat, N_TARGETS, training=True,
            resnet_params={"planes": [8, 16, 32, 64], "layers": [1, 1, 1, 1]},
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
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 64, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)

        def conv(sd):
            return convert_resnet_state_dict(sd, freq_out)

        # reference forward() has a `self.self.cmvn_` typo
        # (resnet_xvector.py:152); extract_embedding_jit(near) is the same
        # graph (cmvn=Identity, dropouts off) and is what the runtime uses.
        _run_parity(
            ref, net, conv, x, y, max_change=1e4, expect_clipped=False,
            forward_fn=lambda t: ref.extract_embedding_jit(t, "near"),
        )


class TestLawlictEcapaTrainParity:
    """10th family: the lawlict ECAPA variant (ecapa-tdnn-xvector.py) —
    certifies its torch-default backbone BN (momentum 0.1), the res2
    first-split-conv ordering, and the linear-SE under a real optimization
    step."""

    @pytest.fixture(scope="class")
    def ref_mod(self):
        return _load_ref_module(
            "/root/reference/pytorch/model/ecapa-tdnn-xvector.py",
            "lawlict_tref",
        )

    def _make(self, ref_mod, seed=0):
        from asv_subtools_tpu.models import EcapaLawlict

        torch.manual_seed(seed)
        feat, channels, embd = 30, 64, 16
        ref = ref_mod.ECAPA_TDNN(
            feat, N_TARGETS, training=True, channels=channels, embd_dim=embd,
            margin_loss=True, margin_loss_params=dict(MARGIN),
        )
        net = SpeakerNet(
            backbone=EcapaLawlict(channels=channels, embd_dim=embd),
            loss_name="margin_softmax",
            loss_params=dict(MARGIN),
            num_targets=N_TARGETS,
        )
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        return ref, net, x, y

    def test_one_step_no_clip(self, ref_mod):
        from asv_subtools_tpu.convert import convert_ecapa_lawlict_state_dict

        ref, net, x, y = self._make(ref_mod, seed=0)
        _run_parity(ref, net, convert_ecapa_lawlict_state_dict, x, y,
                    max_change=1e4, expect_clipped=False)

    def test_one_step_clip_engaged(self, ref_mod):
        from asv_subtools_tpu.convert import convert_ecapa_lawlict_state_dict

        ref, net, x, y = self._make(ref_mod, seed=1)
        _run_parity(ref, net, convert_ecapa_lawlict_state_dict, x, y,
                    max_change=0.25, expect_clipped=True)


class TestSamTrainParity:
    """Two-pass SAM step vs a faithful transcription of the reference's
    optim.SAM (optim.py:768-838) + trainer_online_sam loop ordering
    (:255-330): pass-1 backward -> clip -> first_step (perturb w by
    rho*g/||g||, BN running stats updated) -> pass-2 backward at w+e with
    BN stats frozen -> clip -> second_step (restore w, base SGD step).
    f64 leaf-by-leaf, plain + adaptive variants."""

    def _torch_sam_step(self, ref, x_bdt, y, rho, adaptive, max_change):
        ref.train()

        def set_bn_momentum(m):
            for mod in ref.modules():
                if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                    mod.momentum = m if m is not None else mod.momentum
                    mod.track_running_stats = m is not None

        base = torch.optim.SGD(ref.parameters(), lr=LR)
        params = [p for p in ref.parameters()]
        # pass 1 (running stats ON)
        base.zero_grad()
        loss1 = ref.get_loss(ref.forward(torch.from_numpy(x_bdt).double()),
                             torch.from_numpy(y))
        loss1.backward()
        torch.nn.utils.clip_grad_norm_(params, max_change)
        # first_step (optim.py:779-791)
        with torch.no_grad():
            stacked = torch.stack([
                ((torch.abs(p) if adaptive else 1.0) * p.grad).norm(p=2)
                for p in params if p.grad is not None
            ])
            grad_norm = torch.norm(stacked, p=2)
            scale = rho / (grad_norm + 1e-12)
            old = [p.data.clone() for p in params]
            for p in params:
                if p.grad is None:
                    continue
                e_w = (torch.pow(p, 2) if adaptive else 1.0) * p.grad * scale
                p.add_(e_w)
        base.zero_grad()
        # pass 2 with BN batch stats frozen (trainer_online_sam
        # disable_running_stats): eval-mode BN would change the FORWARD
        # semantics; the reference keeps train-mode BN and only stops the
        # running-stat update, which for torch means momentum=0
        bns = [m for m in ref.modules()
               if isinstance(m, torch.nn.modules.batchnorm._BatchNorm)]
        saved = [(m.momentum, m.running_mean.clone(), m.running_var.clone(),
                  m.num_batches_tracked.clone()) for m in bns]
        loss2 = ref.get_loss(ref.forward(torch.from_numpy(x_bdt).double()),
                             torch.from_numpy(y))
        loss2.backward()
        for m, (mom, rm, rv, nbt) in zip(bns, saved):
            m.momentum = mom
            with torch.no_grad():
                m.running_mean.copy_(rm)
                m.running_var.copy_(rv)
                m.num_batches_tracked.copy_(nbt)
        torch.nn.utils.clip_grad_norm_(params, max_change)
        # second_step: restore w, base step with the perturbed-point grads
        with torch.no_grad():
            for p, o in zip(params, old):
                p.data = o
        base.step()
        return float(loss1.detach()), float(loss2.detach())

    @pytest.mark.parametrize("adaptive", [False, True])
    def test_one_step(self, adaptive):
        from asv_subtools_tpu.convert import convert_ecapa_state_dict
        from asv_subtools_tpu.models import EcapaTdnn
        from asv_subtools_tpu.train.sam import make_sam_train_step

        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/ecapa_tdnn_xvector.py",
            f"ecapa_sam_ref_{adaptive}",
        )
        torch.manual_seed(3)
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
        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = (rng.integers(0, N_TARGETS, size=4)).astype(np.int64)
        rho, max_change = 0.05, 1e4

        ref.double()
        params_bb, stats_bb = convert_ecapa_state_dict(ref.state_dict())
        params = {"backbone": params_bb,
                  **_margin_loss_tree(ref.state_dict())}
        with jax.enable_x64():
            p64 = _to_f64(params)
            bs64 = {"backbone": _to_f64(stats_bb)}
            tx = optax.sgd(LR)
            step = jax.jit(make_sam_train_step(
                net, tx, rho=rho, adaptive=adaptive,
                config=TrainStepConfig(
                    max_change=max_change, compute_dtype=jnp.float64,
                    skip_nonfinite=False,
                ),
            ))
            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=p64,
                batch_stats=bs64, opt_state=tx.init(p64),
            )
            batch = {"x": jnp.asarray(x, jnp.float64),
                     "y": jnp.asarray(y, jnp.int32)}
            new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
            new_state = jax.device_get(new_state)
            metrics = jax.device_get(metrics)

        x_bdt = np.ascontiguousarray(np.transpose(x, (0, 2, 1)))
        ref_l1, ref_l2 = self._torch_sam_step(ref, x_bdt, y, rho, adaptive,
                                              max_change)
        np.testing.assert_allclose(float(metrics["loss"]), ref_l1, rtol=1e-6)
        np.testing.assert_allclose(float(metrics["sam_loss"]), ref_l2,
                                   rtol=1e-6)
        params_bb2, stats_bb2 = convert_ecapa_state_dict(ref.state_dict())
        _assert_tree_close(new_state.params["backbone"], params_bb2,
                           1e-6, 1e-8, "sam param")
        _assert_tree_close(
            {k: v for k, v in new_state.params.items() if k != "backbone"},
            _margin_loss_tree(ref.state_dict()), 1e-6, 1e-8, "sam loss param",
        )
        _assert_tree_close(new_state.batch_stats["backbone"], stats_bb2,
                           1e-6, 1e-8, "sam bn stat")

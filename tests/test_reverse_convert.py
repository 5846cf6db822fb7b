"""Round-trip migration gate: train HERE -> export BACK to the reference
(VERDICT r3 missing #3).

For ECAPA / ResNet34 / Conformer:
  1. instantiate the reference torch model, forward-convert its weights
     into a SpeakerNet (the established one-way path),
  2. TRAIN several real optimization steps in this framework (so the
     exported tree is genuinely framework-trained, not an identity copy),
  3. reverse-convert (reverse_convert.ReverseConverter — value-traced
     inversion of the same forward converter) into a torch state_dict,
     load it into the reference model,
  4. the reference model extracts embeddings (extract_embedding_jit, its
     deployment path, framework.py:133-143) — cosine vs OUR embeddings
     must be >= 0.9999,
  5. bijectivity: forward-converting the exported state_dict reproduces
     the trained flax tree EXACTLY (bit-level, f32).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from asv_subtools_tpu.convert import (
    convert_conformer_state_dict,
    convert_ecapa_state_dict,
    convert_resnet_state_dict,
)
from asv_subtools_tpu.models import ConformerXvector, EcapaTdnn, ResNetXvector
from asv_subtools_tpu.models.framework import SpeakerNet
from asv_subtools_tpu.reverse_convert import ReverseConverter
from asv_subtools_tpu.train.trainer import (
    TrainState,
    TrainStepConfig,
    make_train_step,
)

from test_train_parity import _load_ref_module  # noqa: E402

N_TARGETS = 20


def _train_here(net, params_bb, stats_bb, x_btd, y, steps=5):
    """Real optimization steps through make_train_step (f32, adamW)."""
    rng = jax.random.PRNGKey(0)
    init_v = net.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(x_btd[:2]), jnp.asarray(y[:2]), train=False,
    )
    params = dict(init_v["params"])
    params["backbone"] = jax.tree_util.tree_map(jnp.asarray, params_bb)
    batch_stats = {"backbone": jax.tree_util.tree_map(jnp.asarray, stats_bb)}
    tx = optax.adamw(1e-3)
    step = jax.jit(make_train_step(
        net, tx,
        config=TrainStepConfig(compute_dtype=jnp.float32,
                               skip_nonfinite=False),
    ))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params),
    )
    batch = {"x": jnp.asarray(x_btd), "y": jnp.asarray(y, jnp.int32)}
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
    assert np.isfinite(float(m["loss"]))
    return jax.device_get(state)


def _roundtrip(ref, backbone, convert_fn, x_btd, y, our_position="near",
               min_cos=0.9999):
    net = SpeakerNet(
        backbone=backbone, loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2}, num_targets=N_TARGETS,
    )
    params_bb, stats_bb = convert_fn(ref.state_dict())
    state = _train_here(net, params_bb, stats_bb, x_btd, y)

    # export the framework-trained backbone back into the reference model
    rc = ReverseConverter(convert_fn, ref.state_dict())
    sd = rc(state.params["backbone"], state.batch_stats["backbone"])
    merged = dict(ref.state_dict())
    merged.update(sd)
    ref.load_state_dict(merged)
    ref.eval()

    with torch.no_grad():
        ref_emb = ref.extract_embedding_jit(
            torch.from_numpy(
                np.ascontiguousarray(np.transpose(x_btd, (0, 2, 1)))
            ),
            position="near",
        )
    ref_np = (ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3
              else ref_emb.numpy())
    our_emb = np.asarray(net.backbone.apply(
        {"params": state.params["backbone"],
         "batch_stats": state.batch_stats["backbone"]},
        jnp.asarray(x_btd), train=False, position=our_position,
    ))
    assert our_emb.shape == ref_np.shape
    cos = np.sum(our_emb * ref_np, axis=-1) / (
        np.linalg.norm(our_emb, axis=-1) * np.linalg.norm(ref_np, axis=-1)
        + 1e-12
    )
    assert np.all(cos >= min_cos), f"round-trip cosine {cos}"

    # bijectivity: re-converting the export reproduces the trained tree
    # exactly (both sides are the same f32 bits through the scatter)
    params2, stats2 = convert_fn({k: v for k, v in sd.items()})
    flat_a = jax.tree_util.tree_leaves(state.params["backbone"])
    flat_b = jax.tree_util.tree_leaves(params2)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats["backbone"]),
                    jax.tree_util.tree_leaves(stats2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    return rc


class TestEcapaRoundTrip:
    def test_train_export_extract(self):
        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/ecapa_tdnn_xvector.py",
            "ecapa_rt_ref",
        )
        torch.manual_seed(0)
        feat, channels, embd, mfa = 30, 64, 16, 96
        ref = ref_mod.ECAPA_TDNN(
            feat, 100, training=False,
            ecapa_params={"channels": channels, "embd_dim": embd,
                          "mfa_conv": mfa},
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = rng.integers(0, N_TARGETS, size=4).astype(np.int64)
        rc = _roundtrip(
            ref, EcapaTdnn(channels=channels, embd_dim=embd, mfa_conv=mfa),
            convert_ecapa_state_dict, x, y,
        )
        # Uncovered positions must be exactly: int bookkeeping counters +
        # the res2net dilated TdnnAffines' masked context taps (the
        # reference multiplies weight * mask at EVERY forward,
        # components.py:133-136, so zero-filling them is behavior-exact;
        # 6/9 taps masked for the width-9 dilated kernels)
        for k, n in rc.uncovered.items():
            assert (
                "num_batches_tracked" in k
                or ("res2net_block" in k and k.endswith("affine.weight"))
            ), (k, n)


class TestResnetRoundTrip:
    def test_train_export_extract(self):
        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/resnet_xvector.py",
            "resnet_rt_ref",
        )
        torch.manual_seed(0)
        feat = 24
        ref = ref_mod.ResNetXvector(
            feat, 50, training=False,
            resnet_params={"planes": [8, 16, 32, 64], "layers": [1, 1, 1, 1]},
            fc1=False, fc1_params={}, extracted_embedding="near",
        )
        embd = ref.state_dict()["fc2.affine.weight"].shape[0]
        freq_out = -(-feat // 8)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 64, feat)).astype(np.float32)
        y = rng.integers(0, N_TARGETS, size=4).astype(np.int64)
        _roundtrip(
            ref,
            ResNetXvector(base_planes=8, layers=(1, 1, 1, 1), embd_dim=embd),
            lambda sd: convert_resnet_state_dict(sd, freq_out), x, y,
        )


class TestConformerRoundTrip:
    def test_train_export_extract(self):
        ref_mod = _load_ref_module(
            "/root/reference/pytorch/model/transformer_xvector.py",
            "conf_rt_ref",
        )
        torch.manual_seed(0)
        feat, d_att, blocks = 30, 32, 2
        ref = ref_mod.TransformerXvector(
            feat, 100, training=False, embd_dim=16,
            transformer_params={
                "attention_dim": d_att, "attention_heads": 2,
                "linear_units": 64, "num_blocks": blocks,
                "pos_enc_type": "rel_pos", "input_layer": "conv2d",
                "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
                "attention_dropout_rate": 0.0,
            },
            tansformer_out={"out_dim": 48},
        )
        freq_out = ((feat - 1) // 2 - 1) // 2
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 80, feat)).astype(np.float32)
        y = rng.integers(0, N_TARGETS, size=4).astype(np.int64)
        _roundtrip(
            ref,
            ConformerXvector(
                embd_dim=16, attention_dim=d_att, attention_heads=2,
                linear_units=64, num_blocks=blocks, out_dim=48,
                dropout_rate=0.0,
            ),
            lambda sd: convert_conformer_state_dict(sd, blocks, freq_out),
            x, y,
        )

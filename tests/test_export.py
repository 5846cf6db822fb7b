"""Export / serving tests: StableHLO round-trip + nnet-config rebuild."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asv_subtools_tpu.export import (
    export_embed_fn,
    load_embed_fn,
    load_model_from_config,
    write_nnet_config,
)
from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet, Xvector
from asv_subtools_tpu.train import get_optimizer, init_train_state, save_checkpoint

KEY = jax.random.PRNGKey(0)


class TestExport:
    def test_stablehlo_roundtrip(self, tmp_path):
        model = EcapaTdnn(channels=16, embd_dim=8, mfa_conv=24)
        x0 = jnp.ones((1, 64, 10))
        v = model.init({"params": KEY}, x0, train=False)

        def embed(x, mask):
            return model.apply(v, x, mask=mask, train=False)

        paths = export_embed_fn(
            embed, feat_dim=10, out_dir=str(tmp_path),
            bucket_lengths=(64,), batch_sizes=(2,), platforms=("cpu",),
        )
        assert "b2_t64" in paths
        fn = load_embed_fn(paths["b2_t64"])
        x = jax.random.normal(KEY, (2, 64, 10))
        mask = jnp.ones((2, 64), bool)
        direct = embed(x, mask)
        loaded = fn(x, mask)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(loaded), rtol=1e-5, atol=1e-5
        )

    def test_nnet_config_rebuild(self, tmp_path):
        net = SpeakerNet(
            backbone=Xvector(num_frame_channels=16, embd_dim=8),
            loss_name="softmax", loss_params={}, num_targets=4,
        )
        batch = {
            "x": jnp.ones((2, 20, 8)),
            "y": jnp.zeros(2, jnp.int32),
        }
        tx = get_optimizer("adamW", learning_rate=1e-3)
        state = init_train_state(net, KEY, batch, tx)
        ckpt = save_checkpoint(str(tmp_path / "ckpt"), state, "final")
        cfg_path = write_nnet_config(
            str(tmp_path), "xvector",
            {"num_frame_channels": 16, "embd_dim": 8}, ckpt,
        )
        module, variables, cfg = load_model_from_config(cfg_path)
        emb = module.apply(
            {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"].get("backbone", {})},
            jnp.ones((2, 20, 8)), train=False,
        )
        assert emb.shape == (2, 8)


class TestQuantization:
    def test_int8_roundtrip_fidelity(self):
        from asv_subtools_tpu.models import EcapaTdnn
        from asv_subtools_tpu.quantize import (
            dequantize_params,
            quantization_error,
            quantize_params,
        )

        model = EcapaTdnn(channels=32, embd_dim=16, mfa_conv=48)
        x = jax.random.normal(KEY, (2, 80, 12))
        v = model.init({"params": KEY}, x, train=False)
        q = quantize_params(v["params"], min_size=64)
        err = quantization_error(v["params"], q)
        assert err < 0.01  # int8 per-channel: <1% max weight error
        deq = dequantize_params(q)
        emb_f32 = model.apply(v, x, train=False)
        emb_q = model.apply(
            {"params": deq, "batch_stats": v.get("batch_stats", {})}, x, train=False
        )
        a, b = np.asarray(emb_f32), np.asarray(emb_q)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() > 0.999

    def test_size_reduction(self):
        from asv_subtools_tpu.quantize import quantize_params

        w = {"k": np.random.default_rng(0).normal(size=(256, 256)).astype(np.float32)}
        q = quantize_params(w)
        orig = w["k"].nbytes
        quant = q["k"]["int8_values"].nbytes + q["k"]["int8_scales"].nbytes
        assert quant < orig / 3.5

"""Embedding-parity harness: reference torch ECAPA vs our flax ECAPA with
CONVERTED weights — the BASELINE.json "embeddings match the reference
extractor to allclose tolerance" gate, executed live by instantiating the
reference model code (torch CPU) with random weights and converting them.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from asv_subtools_tpu.convert import convert_ecapa_state_dict
from asv_subtools_tpu.models import EcapaTdnn


@pytest.fixture(scope="module")
def reference_ecapa():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(
        "ecapa_ref", "/root/reference/pytorch/model/ecapa_tdnn_xvector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference model: {e}")
    return mod


CHANNELS, EMBD, MFA, FEAT = 64, 16, 96, 30


def _models(reference_ecapa, seed=0):
    torch.manual_seed(seed)
    ref = reference_ecapa.ECAPA_TDNN(
        FEAT, 100, training=False,
        ecapa_params={"channels": CHANNELS, "embd_dim": EMBD, "mfa_conv": MFA},
    )
    ref.eval()
    params, stats = convert_ecapa_state_dict(ref.state_dict())
    ours = EcapaTdnn(channels=CHANNELS, embd_dim=EMBD, mfa_conv=MFA)
    variables = {"params": params, "batch_stats": stats}
    return ref, ours, variables


class TestEcapaParity:
    def test_converted_tree_matches_init_structure(self, reference_ecapa):
        _, ours, variables = _models(reference_ecapa)
        init_v = ours.init(
            {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 50, FEAT)), train=False
        )

        def shapes(tree):
            return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)

        assert shapes(init_v["params"]) == shapes(variables["params"])
        assert shapes(init_v["batch_stats"]) == shapes(variables["batch_stats"])

    def test_embeddings_allclose(self, reference_ecapa):
        ref, ours, variables = _models(reference_ecapa)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 80, FEAT)).astype(np.float32)

        with torch.no_grad():
            # reference layout [B, D, T]; position "near" = full fc2 output
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()

        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=1e-3, atol=1e-3)

    def test_near_affine_position_allclose(self, reference_ecapa):
        ref, ours, variables = _models(reference_ecapa, seed=1)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 120, FEAT)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near_affine"
            )
        ref_np = ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near_affine")
        )
        np.testing.assert_allclose(our_emb, ref_np, rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def reference_resnet():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(
        "resnet_ref", "/root/reference/pytorch/model/resnet_xvector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference resnet: {e}")
    return mod


class TestResnetParity:
    def test_embeddings_allclose(self, reference_resnet):
        from asv_subtools_tpu.convert import convert_resnet_state_dict
        from asv_subtools_tpu.models import ResNetXvector

        torch.manual_seed(0)
        feat, embd = 24, 32
        ref = reference_resnet.ResNetXvector(
            feat, 50, training=False,
            resnet_params={"planes": [8, 16, 32, 64], "layers": [1, 1, 1, 1]},
            fc1=False, fc1_params={}, extracted_embedding="near",
        )
        # override embd dim via fc2? reference fc2 out = embd_dim param
        ref.eval()
        freq_out = -(-feat // 8)
        params, stats = convert_resnet_state_dict(ref.state_dict(), freq_out)
        ours = ResNetXvector(
            base_planes=8, layers=(1, 1, 1, 1),
            embd_dim=ref.state_dict()["fc2.affine.weight"].shape[0],
        )
        variables = {"params": params, "batch_stats": stats}

        init_v = ours.init(
            {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 64, feat)), train=False
        )
        shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
        assert shapes(init_v["params"]) == shapes(variables["params"])

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 64, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def reference_conformer():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(
        "conf_ref", "/root/reference/pytorch/model/transformer_xvector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference conformer: {e}")
    return mod


class TestConformerParity:
    def test_embeddings_allclose(self, reference_conformer):
        from asv_subtools_tpu.convert import convert_conformer_state_dict
        from asv_subtools_tpu.models import ConformerXvector

        torch.manual_seed(0)
        feat, d_att, blocks = 30, 32, 2
        ref = reference_conformer.TransformerXvector(
            feat, 50, training=False, embd_dim=16,
            transformer_params={
                "attention_dim": d_att, "attention_heads": 2,
                "linear_units": 64, "num_blocks": blocks,
                "pos_enc_type": "rel_pos", "input_layer": "conv2d",
                "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
            },
            tansformer_out={"out_dim": 48},
        )
        ref.eval()
        freq_out = ((feat - 1) // 2 - 1) // 2
        params, stats = convert_conformer_state_dict(
            ref.state_dict(), blocks, freq_out
        )
        ours = ConformerXvector(
            embd_dim=16, attention_dim=d_att, attention_heads=2,
            linear_units=64, num_blocks=blocks, out_dim=48, dropout_rate=0.0,
        )
        variables = {"params": params, "batch_stats": stats}
        init_v = ours.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.ones((1, 80, feat)), train=False,
        )
        shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
        assert shapes(init_v["params"]) == shapes(variables["params"])

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 80, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=3e-3, atol=3e-3)


class TestFullSizeEcapaParity:
    def test_c1024_full_size_conversion(self, reference_ecapa):
        """Full production-size ECAPA C1024/embd-192/mfa-1536 conversion —
        the reduced-width tests cannot catch size-dependent converter bugs
        (tap selection at other dilations, head dims)."""
        torch.manual_seed(2)
        ref = reference_ecapa.ECAPA_TDNN(
            80, 100, training=False,
            ecapa_params={"channels": 1024, "embd_dim": 192,
                          "mfa_conv": 1536},
        )
        ref.eval()
        params, stats = convert_ecapa_state_dict(ref.state_dict())
        ours = EcapaTdnn(channels=1024, embd_dim=192, mfa_conv=1536)
        variables = {"params": params, "batch_stats": stats}
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 60, 80)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = (
            ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3
            else ref_emb.numpy()
        )
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape == (1, 192)
        np.testing.assert_allclose(our_emb, ref_np, rtol=2e-3, atol=2e-3)


class TestFullSizeResnetParity:
    def test_resnet34_full_size_conversion(self, reference_resnet):
        """Production ResNet34 base32 (planes 32/64/128/256, layers
        3/4/6/3, 80-d fbank) conversion — the reduced test uses 1-block
        stages and cannot catch stage-depth or stride-path bugs."""
        from asv_subtools_tpu.convert import convert_resnet_state_dict
        from asv_subtools_tpu.models import ResNetXvector

        torch.manual_seed(3)
        feat = 80
        ref = reference_resnet.ResNetXvector(
            feat, 100, training=False,
            resnet_params={"planes": [32, 64, 128, 256],
                           "layers": [3, 4, 6, 3]},
            fc1=False, fc1_params={}, extracted_embedding="near",
        )
        ref.eval()
        freq_out = -(-feat // 8)
        params, stats = convert_resnet_state_dict(ref.state_dict(), freq_out)
        ours = ResNetXvector(
            base_planes=32, layers=(3, 4, 6, 3),
            embd_dim=ref.state_dict()["fc2.affine.weight"].shape[0],
        )
        variables = {"params": params, "batch_stats": stats}
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 64, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = (
            ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3
            else ref_emb.numpy()
        )
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=2e-3, atol=2e-3)


class TestFullSizeConformerParity:
    def test_conformer_6l256d_full_size_conversion(self, reference_conformer):
        """Production Conformer 6L-256D-4H (the zoo-bench config)
        conversion at full width/depth."""
        from asv_subtools_tpu.convert import convert_conformer_state_dict
        from asv_subtools_tpu.models import ConformerXvector

        torch.manual_seed(4)
        feat, d_att, blocks = 80, 256, 6
        ref = reference_conformer.TransformerXvector(
            feat, 100, training=False, embd_dim=256,
            transformer_params={
                "attention_dim": d_att, "attention_heads": 4,
                "linear_units": 2048, "num_blocks": blocks,
                "pos_enc_type": "rel_pos", "input_layer": "conv2d",
                "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
            },
            tansformer_out={"out_dim": 1536},
        )
        ref.eval()
        freq_out = ((feat - 1) // 2 - 1) // 2
        params, stats = convert_conformer_state_dict(
            ref.state_dict(), blocks, freq_out
        )
        ours = ConformerXvector(
            embd_dim=256, attention_dim=d_att, attention_heads=4,
            linear_units=2048, num_blocks=blocks, out_dim=1536,
            dropout_rate=0.0,
        )
        variables = {"params": params, "batch_stats": stats}
        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 96, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = (
            ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3
            else ref_emb.numpy()
        )
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=3e-3, atol=3e-3)


@pytest.fixture(scope="module")
def reference_ftdnn():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(
        "ftdnn_ref", "/root/reference/pytorch/model/factored_xvector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference factored xvector: {e}")
    return mod


class TestFtdnnParity:
    def test_embeddings_allclose(self, reference_ftdnn):
        """Full-width F-TDNN (the reference hardcodes 512/1024/256/2048):
        converted semi-orth factorized weights -> identical embeddings."""
        from asv_subtools_tpu.convert import convert_ftdnn_state_dict
        from asv_subtools_tpu.models import FactoredXvector

        torch.manual_seed(0)
        feat = 30
        ref = reference_ftdnn.Xvector(feat, 50, training=False)
        ref.eval()
        params, stats = convert_ftdnn_state_dict(ref.state_dict())
        ours = FactoredXvector(width=1.0, embd_dim=512)
        variables = {"params": params, "batch_stats": stats}

        init_v = ours.init(
            {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 40, feat)),
            train=False,
        )
        shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
        assert shapes(init_v["params"]) == shapes(variables["params"])
        assert shapes(init_v["batch_stats"]) == shapes(variables["batch_stats"])

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 80, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.forward(torch.from_numpy(np.transpose(x, (0, 2, 1))))
        ref_np = ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=2e-3, atol=2e-3)

    def test_far_position_allclose(self, reference_ftdnn):
        """'far' (embedding1 affine) — the reference's default extraction
        position for this model (factored_xvector.py:18)."""
        from asv_subtools_tpu.convert import convert_ftdnn_state_dict
        from asv_subtools_tpu.models import FactoredXvector

        torch.manual_seed(1)
        feat = 30
        ref = reference_ftdnn.Xvector(feat, 50, training=False,
                                      extracted_embedding="far")
        ref.eval()
        params, stats = convert_ftdnn_state_dict(ref.state_dict())
        ours = FactoredXvector(width=1.0, embd_dim=512)
        variables = {"params": params, "batch_stats": stats}
        rng = np.random.default_rng(1)
        x = rng.normal(size=(90, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding(torch.from_numpy(x)).numpy()
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x)[None], train=False,
                       position="far")
        )[0]
        np.testing.assert_allclose(our_emb, ref_emb, rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def reference_snowdar():
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(
        "snow_ref", "/root/reference/pytorch/model/snowdar_xvector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference snowdar: {e}")
    return mod


class TestSnowdarParity:
    def test_embeddings_allclose(self, reference_snowdar):
        from asv_subtools_tpu.convert import convert_snowdar_state_dict
        from asv_subtools_tpu.models import Xvector

        torch.manual_seed(0)
        feat = 30
        ref = reference_snowdar.Xvector(feat, 50, training=False,
                                        extracted_embedding="far")
        ref.eval()
        params, stats = convert_snowdar_state_dict(ref.state_dict())
        ours = Xvector(num_frame_channels=512, embd_dim=512)
        variables = {"params": params, "batch_stats": stats}
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 90, feat)).astype(np.float32)
        # the decorator takes one [T, D] matrix per call and returns the
        # chunk-averaged 1-D embedding (framework.py:12-55)
        refs = []
        with torch.no_grad():
            for i in range(2):
                refs.append(ref.extract_embedding(torch.from_numpy(x[i])).numpy())
        ref_np = np.stack(refs)
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="far")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("pooling", ["xi-postmean-softplus2",
                                         "xi-postdist-softplus2"])
    def test_xi_pooling_embeddings_allclose(self, reference_snowdar, pooling):
        """Snowdar + xi-vector pooling (snowdar_xvector.py:131-134): the
        converter's stats.* subtree mapping (prior rows + log-precision
        estimator TDNN) produces identical embeddings — the model-level
        gate behind the Xi-vector reverse round-trip."""
        from asv_subtools_tpu.convert import convert_snowdar_state_dict
        from asv_subtools_tpu.models import Xvector

        torch.manual_seed(1)
        feat = 30
        ref = reference_snowdar.Xvector(
            feat, 50, training=False, pooling=pooling,
            pooling_params={"hidden_size": 16},
            extracted_embedding="near",
        )
        ref.eval()
        params, stats = convert_snowdar_state_dict(ref.state_dict())
        ours = Xvector(
            pooling="xi",
            pooling_params={"hidden_size": 16,
                            "stddev": pooling.endswith("postdist-softplus2")},
        )
        variables = {"params": params, "batch_stats": stats}
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 90, feat)).astype(np.float32)
        refs = []
        with torch.no_grad():
            for i in range(2):
                refs.append(
                    ref.extract_embedding(torch.from_numpy(x[i])).numpy()
                )
        ref_np = np.stack(refs)
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False,
                       position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=2e-3, atol=2e-3)


class TestConformerVariantParity:
    """Converter parity for the OTHER encoder variants: abs_pos / rot_pos /
    no_pos positional encodings and conv2d2 / conv2d6 / conv2d8
    subsampling (reference encoder.py:127-156). The base test covers only
    rel_pos + conv2d."""

    def _roundtrip(self, reference_conformer, pos_enc, input_layer,
                   freq_out_fn, seed=0, feat=30, tol=3e-3,
                   ref_extra=None, ours_extra=None, blocks=2,
                   randomize_bn_stats=False, transformer_type="conformer"):
        from asv_subtools_tpu.convert import convert_conformer_state_dict
        from asv_subtools_tpu.models import ConformerXvector

        torch.manual_seed(seed)
        d_att = 32
        ref = reference_conformer.TransformerXvector(
            feat, 50, training=False, embd_dim=16,
            transformer_type=transformer_type,
            transformer_params={
                "attention_dim": d_att, "attention_heads": 2,
                "linear_units": 64, "num_blocks": blocks,
                "pos_enc_type": pos_enc, "input_layer": input_layer,
                "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
                **(ref_extra or {}),
            },
            tansformer_out={"out_dim": 48},
        )
        ref.eval()
        if randomize_bn_stats:
            # fresh BatchNorm1d running stats are (0, 1) — the norm would
            # be a no-op in eval; randomize them so the parity check is
            # sensitive to the running-stats conversion
            with torch.no_grad():
                for m in ref.modules():
                    if isinstance(m, torch.nn.BatchNorm1d):
                        m.running_mean.uniform_(-0.5, 0.5)
                        m.running_var.uniform_(0.5, 1.5)
        params, stats = convert_conformer_state_dict(
            ref.state_dict(), blocks, freq_out_fn(feat)
        )
        ours = ConformerXvector(
            embd_dim=16, attention_dim=d_att, attention_heads=2,
            linear_units=64, num_blocks=blocks, out_dim=48,
            dropout_rate=0.0, pos_enc_type=pos_enc, input_layer=input_layer,
            transformer_type=transformer_type,
            **(ours_extra or {}),
        )
        variables = {"params": params, "batch_stats": stats}
        init_v = ours.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.ones((1, 80, feat)), train=False,
        )
        shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
        assert shapes(init_v["params"]) == shapes(variables["params"])

        rng = np.random.default_rng(seed)
        x = rng.normal(size=(2, 80, feat)).astype(np.float32)
        with torch.no_grad():
            ref_emb = ref.extract_embedding_jit(
                torch.from_numpy(np.transpose(x, (0, 2, 1))), position="near"
            )
        ref_np = ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=tol, atol=tol)

    def test_abs_pos_conv2d2(self, reference_conformer):
        """abs_pos sinusoidal + SVConv2dSubsampling2 (time-only stride,
        F' = F - 4, subsampling.py:365-384)."""
        self._roundtrip(reference_conformer, "abs_pos", "conv2d2",
                        lambda f: f - 4, seed=1)

    def test_rot_pos_conv2d(self, reference_conformer):
        """RoPE attention (rotary q/k/v, RoPESelfAttention attention.py:255)
        with the standard 4x subsampling."""
        self._roundtrip(reference_conformer, "rot_pos", "conv2d",
                        lambda f: ((f - 1) // 2 - 1) // 2, seed=2)

    def test_no_pos_conv2d6(self, reference_conformer):
        self._roundtrip(reference_conformer, "no_pos", "conv2d6",
                        lambda f: ((f - 1) // 2 - 2) // 3, seed=3)

    def test_abs_pos_conv2d8(self, reference_conformer):
        self._roundtrip(reference_conformer, "abs_pos", "conv2d8",
                        lambda f: (((f - 1) // 2 - 1) // 2 - 1) // 2, seed=4)

    def test_batch_norm_trans_bat(self, reference_conformer):
        """norm_type="batch_norm": every block norm and the after_norm are
        Trans_Bat (BatchNorm1d over [B, D, T], layer_norm.py:8-31), and the
        cnn module norm is a bare BatchNorm1d (convolution.py:62-64) —
        running stats must convert into our batch_stats tree."""
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=7,
            ref_extra={"norm_type": "batch_norm",
                       "cnn_module_norm": "batch_norm"},
            ours_extra={"encoder_params": {"norm_type": "batch_norm",
                                           "cnn_norm_type": "batch_norm"}},
            randomize_bn_stats=True,
        )

    def test_mfa_combiner_after_norm(self, reference_conformer):
        """combiner_type="mfa": aux taps from get_combiner
        (encoder.py:322-341: start num_blocks // aux_layer_start, step
        aux_layer_period, + final) concat to attention_dim * n_taps and the
        after_norm IS applied to the concat (encoder.py:206, :414-417).
        blocks=4, aux_layer_start=2 -> taps [2, 3] -> 64-wide concat."""
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=8, blocks=4,
            ref_extra={"combiner_type": "mfa", "aux_layer_start": 2},
            ours_extra={"combiner_type": "mfa",
                        "encoder_params": {"aux_layer_start": 2}},
        )

    def test_concat_after(self, reference_conformer):
        """concat_after=True: the attention residual becomes
        x + concat_linear([normed_x; att(x)]) with NO dropout on the branch
        (encoder_layer.py:85-86, :264-270)."""
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=10,
            ref_extra={"concat_after": True},
            ours_extra={"encoder_params": {"concat_after": True}},
        )

    def test_rope_abs_plus(self, reference_conformer):
        """rot_pos + rope_abs_plus: the absolute sinusoid table is ALSO
        added to the scaled input (embedding.py:190-196) on top of the
        rotary q/k/v rotation."""
        self._roundtrip(
            reference_conformer, "rot_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=11,
            ref_extra={"rope_abs_plus": True},
            ours_extra={"encoder_params": {"rope_abs_plus": True}},
        )

    def test_rotary_value_off(self, reference_conformer):
        """rot_pos + rotary_value=False: only q/k are rotated, v passes
        through unrotated (attention.py RoPESelfAttention)."""
        self._roundtrip(
            reference_conformer, "rot_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=12,
            ref_extra={"rotary_value": False},
            ours_extra={"encoder_params": {"rotary_value": False}},
        )

    def test_attention_conv_out(self, reference_conformer):
        """attention_conv_out=True: the MHA output projection is a k=3
        padding-1 Conv1d over time (attention.py:43-45, applied :113-114)."""
        self._roundtrip(
            reference_conformer, "rel_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=15,
            ref_extra={"attention_conv_out": True},
            ours_extra={"encoder_params": {"attention_conv_out": True}},
        )

    def test_re_conformer(self, reference_conformer):
        """transformer_type="re_conformer" (ReConformerEncoder,
        encoder.py:684-827): no per-branch norms, full-scale macaron FF,
        final balancer+BasicNorm per layer, Re conv module without a norm,
        and every Scaled* weight folded (w * exp(w_scale)) into plain
        kernels by the converter."""
        self._roundtrip(
            reference_conformer, "rel_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=13,
            transformer_type="re_conformer",
        )

    def test_re_conformer_re_conv2d(self, reference_conformer):
        """Re subsampling (ReConv2dSubsampling4, subsampling.py:150-250):
        8/32/128-channel convs (first stride 1 padding 1) with DoubleSwish,
        ScaledLinear out folded to Dense, fixed-eps BasicNorm."""
        self._roundtrip(
            reference_conformer, "rel_pos", "re_conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=14,
            transformer_type="re_conformer",
        )

    def test_mfa_default_single_tap(self, reference_conformer):
        """With the (unexposed) default aux_layer_start=1 the reference tap
        range is EMPTY — mfa concatenates only the final layer."""
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=9, blocks=3,
            ref_extra={"combiner_type": "mfa"},
            ours_extra={"combiner_type": "mfa"},
        )

    @staticmethod
    def _shim_balancer():
        """Reference latent defect: GAU with re_scale=False constructs
        `ActivationBalancer()` without the required channel_dim argument
        (attention.py:420-436), so the reference GAU cannot instantiate as
        shipped. ActivationBalancer is forward-identity (it only clamps
        gradients), so patching it with nn.Identity preserves eval
        semantics exactly."""
        import importlib as _il

        att_mod = _il.import_module("libs.nnet.transformer.attention")
        att_mod.ActivationBalancer = lambda *a, **k: torch.nn.Identity()

    def test_gau_rot_pos(self, reference_conformer):
        """Gated attention unit with RoPE (RoPEGAU, attention.py:580-640):
        to_gate/to_v/to_qk fuse into our uv projection, OffsetScale pairs
        stack into gamma/beta rows."""
        self._shim_balancer()
        self._roundtrip(
            reference_conformer, "rot_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=5,
            ref_extra={"att_type": "gau", "gau_units": 64, "gau_key": 16},
            ours_extra={"att_type": "gau",
                        "encoder_params": {"gau_units": 64, "gau_key": 16}},
        )

    def test_softmax_plus_rot_pos(self, reference_conformer):
        """The SHIPPED voxceleb conformer launcher config
        (runTransformerXvector.py:237-243): rot_pos + softmax_plus
        length-scaled attention with a LEARNED log(train_len)
        (attention.py:672,725-727)."""
        na = {"norm_method": "softmax_plus", "train_len": 300}
        self._roundtrip(
            reference_conformer, "rot_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=8,
            ref_extra={"attention_norm_args": na},
            ours_extra={"encoder_params": {"attention_norm_args": na}},
        )

    def test_relu_plus_abs_pos(self, reference_conformer):
        """relu_plus attention normalize: relu(a)^2 / len (attention.py:722)."""
        na = {"norm_method": "relu_plus"}
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=9,
            ref_extra={"attention_norm_args": na},
            ours_extra={"encoder_params": {"attention_norm_args": na}},
        )

    def test_scale_adapt_gsa_rel_pos(self, reference_conformer):
        """Learned log-scale (scale_adapt) + gaussian locality prior (g_sa)
        + diag_mask, on the rel_pos attention (attention.py:653-692)."""
        na = {"scale_adapt": True, "g_sa": True, "diag_mask": True}
        self._roundtrip(
            reference_conformer, "rel_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=10,
            ref_extra={"attention_norm_args": na},
            ours_extra={"encoder_params": {"attention_norm_args": na}},
        )

    def test_gau_softmax_plus(self, reference_conformer):
        """GAU with softmax_plus (the AttentionNormalize path is shared,
        attention.py:446: att_type='gau')."""
        self._shim_balancer()
        na = {"norm_method": "softmax_plus", "train_len": 300}
        self._roundtrip(
            reference_conformer, "rot_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=11,
            ref_extra={"att_type": "gau", "gau_units": 64, "gau_key": 16,
                       "attention_norm_args": na},
            ours_extra={"att_type": "gau",
                        "encoder_params": {"gau_units": 64, "gau_key": 16,
                                           "attention_norm_args": na}},
        )

    def test_positionwise_conv1d(self, reference_conformer):
        """conv1d positionwise FFN (MultiLayeredConv1d, multi_layer_conv.py:9)."""
        pw = {"positionwise_layer_type": "conv1d",
              "positionwise_conv_kernel_size": 3}
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=12,
            ref_extra=pw, ours_extra={"encoder_params": pw},
        )

    def test_positionwise_conv1d_linear(self, reference_conformer):
        """conv1d-linear positionwise FFN (Conv1dLinear, multi_layer_conv.py:63)."""
        pw = {"positionwise_layer_type": "conv1d-linear",
              "positionwise_conv_kernel_size": 3}
        self._roundtrip(
            reference_conformer, "rel_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=13,
            ref_extra=pw, ours_extra={"encoder_params": pw},
        )

    def test_full_gau(self, reference_conformer):
        """att_type=gau AND positionwise_layer_type=gau: every sub-layer is
        a gated attention unit (the FLASH architecture; encoder.py:262-270
        builds GAU FFNs via get_gau_layer). QUIRK: the positionwise GAU's
        key dim is pinned at get_positionwise_layer's default 64 (the call
        never forwards the configured gau_key), so with rot_pos the config
        only runs when gau_key == 64 — any other value crashes the
        reference in apply_rotary (pos_emb is sized for the attention
        GAU's key)."""
        self._shim_balancer()
        cfg = {"att_type": "gau", "gau_units": 96, "gau_key": 64,
               "positionwise_layer_type": "gau"}
        self._roundtrip(
            reference_conformer, "rot_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=14,
            ref_extra=cfg,
            ours_extra={"att_type": "gau",
                        "encoder_params": {"gau_units": 96, "gau_key": 64,
                                           "positionwise_layer_type": "gau"}},
        )

    def test_convfnn_blocks(self, reference_conformer):
        """convfnn_blocks=1: the first block's FFNs become conv1d
        (encoder.py:636-646) while later blocks keep linear FFNs."""
        cfg = {"convfnn_blocks": 1, "positionwise_conv_kernel_size": 3}
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=15,
            ref_extra=cfg, ours_extra={"encoder_params": cfg},
        )

    def test_t5_bias_abs_pos(self, reference_conformer):
        """add_t5rel_bias: per-layer learned bucket bias added to the raw
        q@k^T scores before the /sqrt(d_k) normalize (attention.py:135-137;
        the module's sqrt(d_k) scale cancels against AttentionNormalize, so
        our post-scale raw-bias addition is net-identical)."""
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=7,
            ref_extra={"add_t5rel_bias": True},
            ours_extra={"encoder_params": {"add_t5rel_bias": True}},
        )

    def test_gau_abs_pos(self, reference_conformer):
        """Plain (non-rotary) GAU with sinusoidal input positions — the
        only other GAU config that runs in the reference: get_gau_layer
        (encoder.py:314-317) picks RoPEGAU for everything except abs_pos,
        and with no_pos/rel_pos RoPEGAU receives a d_model-sized zero
        pos_emb and crashes in apply_rotary (latent defect)."""
        self._shim_balancer()
        self._roundtrip(
            reference_conformer, "abs_pos", "conv2d",
            lambda f: ((f - 1) // 2 - 1) // 2, seed=6,
            ref_extra={"att_type": "gau", "gau_units": 64, "gau_key": 16},
            ours_extra={"att_type": "gau",
                        "encoder_params": {"gau_units": 64, "gau_key": 16}},
        )


@pytest.fixture(scope="module")
def reference_lawlict():
    """The reference's SECOND ECAPA implementation (lawlict-derived),
    pytorch/model/ecapa-tdnn-xvector.py — dashes require path import."""
    sys.path.insert(0, "/root/reference/pytorch")
    sys.path.insert(0, "/root/reference/pytorch/libs")
    spec = importlib.util.spec_from_file_location(
        "ecapa_lawlict_ref", "/root/reference/pytorch/model/ecapa-tdnn-xvector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference lawlict model: {e}")
    return mod


class TestLawlictEcapaParity:
    """lawlict ECAPA variant (reference ecapa-tdnn-xvector.py): res2 chain
    convolves the FIRST split and passes the LAST through, SE is a
    channels//4 Linear bottleneck, pooling is tanh attention without global
    context, backbone BN is torch-default momentum 0.1."""

    def _models(self, reference_lawlict, seed=0, channels=64, embd=16):
        torch.manual_seed(seed)
        ref = reference_lawlict.ECAPA_TDNN(
            FEAT, 100, training=False, channels=channels, embd_dim=embd,
        )
        ref.eval()
        from asv_subtools_tpu.convert import convert_ecapa_lawlict_state_dict
        from asv_subtools_tpu.models import EcapaLawlict

        params, stats = convert_ecapa_lawlict_state_dict(ref.state_dict())
        ours = EcapaLawlict(channels=channels, embd_dim=embd)
        return ref, ours, {"params": params, "batch_stats": stats}

    def test_converted_tree_matches_init_structure(self, reference_lawlict):
        _, ours, variables = self._models(reference_lawlict)
        init_v = ours.init(
            {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 50, FEAT)),
            train=False,
        )
        shapes = lambda t: jax.tree_util.tree_map(
            lambda x: tuple(np.shape(x)), t
        )
        assert shapes(init_v["params"]) == shapes(variables["params"])
        assert shapes(init_v["batch_stats"]) == shapes(variables["batch_stats"])

    def test_embeddings_allclose(self, reference_lawlict):
        ref, ours, variables = self._models(reference_lawlict)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 80, FEAT)).astype(np.float32)
        with torch.no_grad():
            # forward == extract_embedding("near"): both end at the full
            # fc2 layer (reference :268-283 vs :305-324)
            ref_emb = ref.forward(torch.from_numpy(np.transpose(x, (0, 2, 1))))
        ref_np = (
            ref_emb.squeeze(-1).numpy() if ref_emb.ndim == 3 else ref_emb.numpy()
        )
        our_emb = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False, position="near")
        )
        assert our_emb.shape == ref_np.shape
        np.testing.assert_allclose(our_emb, ref_np, rtol=1e-3, atol=1e-3)

    def test_near_affine_allclose(self, reference_lawlict):
        ref, ours, variables = self._models(reference_lawlict, seed=3)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 120, FEAT)).astype(np.float32)
        with torch.no_grad():
            xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
            out1 = ref.layer1(xt)
            out2 = ref.layer2(out1) + out1
            out3 = ref.layer3(out1 + out2) + out1 + out2
            out4 = ref.layer4(out1 + out2 + out3) + out1 + out2 + out3
            out = torch.cat([out2, out3, out4], dim=1)
            out = ref.bn_conv(torch.relu(ref.conv(out)))
            z = ref.bn_stats(ref.stats(out)).unsqueeze(-1)
            ref_emb = ref.fc2.affine(z)
        ref_np = ref_emb.squeeze(-1).numpy()
        our_emb = np.asarray(
            ours.apply(
                variables, jnp.asarray(x), train=False, position="near_affine"
            )
        )
        np.testing.assert_allclose(our_emb, ref_np, rtol=1e-3, atol=1e-3)

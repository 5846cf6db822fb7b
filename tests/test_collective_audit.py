"""Compiled-HLO collective audit as a regression gate (VERDICT r3 #1).

tools/collective_audit.py audits the full production shape; this suite
keeps a mid-size FSDP x model-axis configuration under CI so a partition
regression (involuntary remats reappearing, or the at-use gather
constraint silently dropping out and re-inflating activation collectives)
fails a test instead of waiting for the next manual audit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet
from asv_subtools_tpu.parallel import make_fsdp_rules, make_mesh
from asv_subtools_tpu.parallel.audit import (
    audit_compiled_text,
    capture_stderr_fd,
)
from asv_subtools_tpu.train import TrainStepConfig, Trainer, get_optimizer


@pytest.fixture(scope="module")
def audit():
    mesh = make_mesh(num_data=4, num_model=2)
    net = SpeakerNet(
        backbone=EcapaTdnn(channels=256, embd_dim=64, mfa_conv=384),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2},
        num_targets=512,
    )
    trainer = Trainer(
        net, get_optimizer("adamW", learning_rate=1e-3),
        config=TrainStepConfig(compute_dtype=jnp.bfloat16, wave_input=True),
        mesh=mesh,
        partition_rules=make_fsdp_rules(mesh, min_size=4096),
    )
    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    feats0, _ = fused_fbank(jnp.zeros((2, 4000), jnp.float32),
                            FbankOptions())
    state = trainer.init_state(
        jax.random.PRNGKey(0), {"x": feats0, "y": jnp.zeros(2, jnp.int32)}
    )
    abstract_state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding),
        state,
    )
    batch = {
        "x": jax.ShapeDtypeStruct((32, 16000), jnp.float32),
        "y": jax.ShapeDtypeStruct((32,), jnp.int32),
    }
    scal = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    with capture_stderr_fd() as err:
        compiled = trainer._train_step_nomask.lower(
            abstract_state, batch, key, scal, scal, scal
        ).compile()
    a = audit_compiled_text(compiled.as_text(), err[0] if err else "")
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(state.params)
    )
    return a, n_params


class TestSpmdPartitioning:
    def test_zero_involuntary_rematerializations(self, audit):
        a, _ = audit
        assert a.involuntary_remats == 0

    def test_collective_volume_is_zero3_scale(self, audit):
        """Comm per step must stay at the ZeRO-3 budget (param gathers +
        grad reductions), NOT the activation-TP blowup the round-3 rules
        produced (~16x). Budget: params are moved O(6) times per step
        (bf16 fwd+bwd gathers, f32 grad reduce, opt-state resharding
        slack) — the broken partitioning moved ~60x param bytes."""
        a, n_params = audit
        budget = 10 * n_params * 4  # bytes, generous ZeRO-3 envelope
        assert a.total_bytes < budget, (
            f"{a.total_bytes / 1e6:.0f} MB/step vs budget "
            f"{budget / 1e6:.0f} MB — activation collectives are back"
        )

    def test_no_all_to_all_or_permute(self, audit):
        """The clean partitioning needs only all-gather + all-reduce
        (reduce-scatter); all-to-alls/permutes were the signature of the
        activation-resharding pathology."""
        a, _ = audit
        counts = a.counts()
        assert counts.get("all-to-all", 0) == 0, counts
        assert counts.get("collective-permute", 0) == 0, counts


class TestHloParsing:
    def test_async_start_done_accounting(self):
        """TPU-style async collectives: -done forms are skipped for every
        op kind, -start tuple results count only the RESULT member (not
        operand+result), sync tuple all-reduces still sum members."""
        hlo = """
  %all-gather-start.1 = (bf16[16,512]{1,0}, bf16[128,512]{1,0}) all-gather-start(%p), dimensions={0}
  %all-gather-done.1 = bf16[128,512]{1,0} all-gather-done(%all-gather-start.1)
  %reduce-scatter.2 = f32[16,512]{1,0} reduce-scatter(%g), dimensions={0}
  %reduce-scatter-done.9 = f32[16,512]{1,0} reduce-scatter-done(%x)
  %all-to-all-done.3 = f32[4,4]{1,0} all-to-all-done(%y)
  %all-reduce.3 = (f32[8]{0}, f32[8]{0}) all-reduce(%a, %b)
"""
        a = audit_compiled_text(hlo)
        assert a.counts() == {
            "all-gather": 1, "reduce-scatter": 1, "all-reduce": 1
        }, a.counts()
        b = a.bytes_by_op()
        assert b["all-gather"] == 128 * 512 * 2   # result member only
        assert b["reduce-scatter"] == 16 * 512 * 4
        assert b["all-reduce"] == 8 * 4 * 2       # sync tuple: sum

    def test_remat_warning_count(self):
        stderr = ("x\n[SPMD] Involuntary full rematerialization. blah\n"
                  "[SPMD] Involuntary full rematerialization. blah\n")
        a = audit_compiled_text("", stderr)
        assert a.involuntary_remats == 2


@pytest.fixture(scope="module")
def conformer_audit():
    """Same gate for the SECOND headline family: conformer attention/FFN
    params have different shapes/rank than ECAPA convs, so the FSDP
    last-dim rules + at-use gather must be re-proven on them."""
    from asv_subtools_tpu.models.conformer import ConformerXvector

    mesh = make_mesh(num_data=4, num_model=2)
    net = SpeakerNet(
        backbone=ConformerXvector(num_blocks=2, attention_dim=128,
                                  attention_heads=4, linear_units=256,
                                  input_layer="conv2d"),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2},
        num_targets=512,
    )
    trainer = Trainer(
        net, get_optimizer("adamW", learning_rate=1e-3),
        config=TrainStepConfig(compute_dtype=jnp.bfloat16, wave_input=True),
        mesh=mesh,
        partition_rules=make_fsdp_rules(mesh, min_size=4096),
    )
    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    feats0, _ = fused_fbank(jnp.zeros((2, 16000), jnp.float32),
                            FbankOptions())
    state = trainer.init_state(
        jax.random.PRNGKey(0), {"x": feats0, "y": jnp.zeros(2, jnp.int32)}
    )
    abstract_state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding),
        state,
    )
    batch = {
        "x": jax.ShapeDtypeStruct((32, 32000), jnp.float32),
        "y": jax.ShapeDtypeStruct((32,), jnp.int32),
    }
    scal = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    with capture_stderr_fd() as err:
        compiled = trainer._train_step_nomask.lower(
            abstract_state, batch, key, scal, scal, scal
        ).compile()
    a = audit_compiled_text(compiled.as_text(), err[0] if err else "")
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(state.params)
    )
    return a, n_params


class TestConformerSpmdPartitioning:
    def test_zero_involuntary_rematerializations(self, conformer_audit):
        a, _ = conformer_audit
        assert a.involuntary_remats == 0

    def test_collective_volume_is_zero3_scale(self, conformer_audit):
        a, n_params = conformer_audit
        budget = 10 * n_params * 4
        assert a.total_bytes < budget, (
            f"{a.total_bytes / 1e6:.0f} MB/step vs budget "
            f"{budget / 1e6:.0f} MB — activation collectives are back"
        )

    def test_no_all_to_all_or_permute(self, conformer_audit):
        a, _ = conformer_audit
        counts = a.counts()
        assert counts.get("all-to-all", 0) == 0, counts
        assert counts.get("collective-permute", 0) == 0, counts

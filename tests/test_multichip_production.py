"""EXECUTED production-shape multi-device numerics (VERDICT r4 missing #2).

The collective audit (tools/collective_audit.py) proves the production
config COMPILES clean; this test proves the partitioned step COMPUTES the
same function: 3 real optimizer steps of the audited configuration —
ECAPA-C1024, 5994 classes (VoxCeleb2 inventory,
/root/reference/recipe/voxcelebSRC/runVoxcelebSRC.sh:12-15), wave input,
accum_grad=2 — through the REAL Trainer.run_epoch in three placements:

    fsdp_tp     mesh (data=4, model=2), ZeRO-3 FSDP + row-parallel head
    dp          mesh (data=8), fully replicated params
    single      mesh (data=1), one device

and asserts loss / grad-norm per step AND every updated parameter and
BN running stat leaf-by-leaf agree across the three. Distributing the
computation must not change its value: the only cross-mode differences
are f32 reduction orders, whose effect the margin loss amplifies
chaotically after the first update (measured: step-0 loss agrees at
~1e-8 and grad-norm at ~1e-5; by step 1 a single sample crossing the
AAM hard-branch flips ~1/B of the gradient, moving the grad norm ~0.5%
while the loss still agrees at 1e-4). STEP 0 is therefore the sharding-
correctness assertion (tight: loss 1e-5, grad-norm 1e-4, accuracy
exact), and the state AFTER ONE UPDATE is compared leaf-by-leaf while
still pre-chaos: BN running stats at 1e-3/1e-6 (computed from identical
pre-update params, only reduction noise) and params within the
single-update Adam scale (first-step update = lr*sign(g); components
with g near 0 legitimately flip between +-lr under reduction noise,
hence atol 2.5*lr — parameter-exact agreement is not a property even
two single-device f32 runs with different reduction orders would have).
Steps 2-3 carry gross-divergence guards at 5% — far below the 2x/8x
signatures of a double-counted accum or wrong psum axis — and a final
placement-sanity leaf check (a stale/misplaced shard is off by
O(param scale) ~ 0.1-1, orders above the chaos-bounded update scale).
B drops 128 -> 16 and chunks to 0.5 s for CPU time; the MODEL dims are
the production ones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet
from asv_subtools_tpu.parallel import make_fsdp_rules, make_mesh
from asv_subtools_tpu.train import TrainStepConfig, Trainer, get_optimizer

CHANNELS = 1024
EMBD = 192
NUM_TARGETS = 5994
BATCH = 16
SECONDS = 0.5
ACCUM = 2
STEPS = 3


def _run_mode(mode: str, batches, example):
    if mode == "fsdp_tp":
        mesh = make_mesh(num_data=4, num_model=2)
        rules = make_fsdp_rules(mesh)
    elif mode == "dp":
        mesh = make_mesh(num_data=8, num_model=1)
        rules = None
    elif mode == "single":
        mesh = make_mesh(num_data=1, num_model=1,
                         devices=jax.devices()[:1])
        rules = None
    else:  # pragma: no cover
        raise ValueError(mode)

    net = SpeakerNet(
        backbone=EcapaTdnn(channels=CHANNELS, embd_dim=EMBD),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2},
        num_targets=NUM_TARGETS,
    )
    tx = get_optimizer("adamW", learning_rate=1e-3, weight_decay=1e-4)

    per_step = []

    class Recorder:
        def update(self, **kw):
            per_step.append({k: kw[k] for k in
                             ("loss", "accuracy", "grad_norm")})

    trainer = Trainer(
        net, tx,
        config=TrainStepConfig(
            compute_dtype=jnp.float32,  # the numerics gate: f32 so the
            # only cross-mode difference is reduction order
            accum_grad=ACCUM, wave_input=True, skip_nonfinite=False,
        ),
        mesh=mesh,
        partition_rules=rules,
        report_interval=1,
        reporter=Recorder(),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    # split the epoch so the state after ONE update can be checked
    # leaf-by-leaf before chaos decorrelates the trajectories
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    state, _ = trainer.run_epoch(state, iter(batches[:1]), k1, epoch=0)
    after_one = jax.device_get(state)
    state, _ = trainer.run_epoch(state, iter(batches[1:]), k2, epoch=0)
    host = jax.device_get(state)
    return host, per_step, after_one


def _tree_close(a, b, rtol, atol, what):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, xa), xb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(xa, np.float64), np.asarray(xb, np.float64),
            rtol=rtol, atol=atol,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_production_shape_three_placements_agree():
    gen = np.random.default_rng(0)
    n_samples = int(SECONDS * 16000)
    batches_np = []
    for _ in range(STEPS):
        batches_np.append({
            "x": (gen.normal(size=(BATCH, n_samples)) * 1000.0)
            .astype(np.float32),
            "y": gen.integers(0, NUM_TARGETS, size=BATCH)
            .astype(np.int32),
        })

    # init on features (init_train_state inits net on batch["x"];
    # wave_input applies only inside the train step)
    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    feats0, _ = fused_fbank(
        jnp.asarray(batches_np[0]["x"][:2, :4000]), FbankOptions()
    )
    example = {"x": feats0, "y": jnp.zeros((2,), jnp.int32)}

    results = {}
    for mode in ("single", "dp", "fsdp_tp"):
        results[mode] = _run_mode(mode, batches_np, example)

    ref_state, ref_steps, ref_one = results["single"]
    assert len(ref_steps) == STEPS
    assert all(np.isfinite(s["loss"]) for s in ref_steps)

    for mode in ("dp", "fsdp_tp"):
        state, steps, after_one = results[mode]
        assert len(steps) == STEPS
        # step 0 = the sharding-correctness assertion (pre-chaos);
        # steps 1+ = gross-divergence guards (see module docstring)
        for k, (ra, rb) in enumerate(zip(ref_steps, steps)):
            np.testing.assert_allclose(
                rb["loss"], ra["loss"],
                rtol=1e-5 if k == 0 else 5e-2,
                err_msg=f"{mode} step {k} loss")
            np.testing.assert_allclose(
                rb["grad_norm"], ra["grad_norm"],
                rtol=1e-4 if k == 0 else 5e-2,
                err_msg=f"{mode} step {k} grad_norm")
        assert steps[0]["accuracy"] == ref_steps[0]["accuracy"], mode
        # leaf-by-leaf AFTER ONE UPDATE (pre-chaos): params within the
        # single-update Adam scale (first-step update = lr*sign(g);
        # components with g ~ 0 legitimately flip between +-lr under
        # reduction noise, hence atol 2.5*lr), BN stats tight (computed
        # from IDENTICAL pre-update params — only reduction noise)
        _tree_close(after_one.params, ref_one.params,
                    rtol=1e-3, atol=2.5e-3, what=f"{mode} params@1")
        _tree_close(after_one.batch_stats, ref_one.batch_stats,
                    rtol=1e-3, atol=1e-6, what=f"{mode} batch_stats@1")
        # after 3 steps: placement sanity only (a stale/misplaced shard
        # is off by O(param scale); chaos is bounded by the update scale)
        _tree_close(state.params, ref_state.params,
                    rtol=5e-2, atol=1e-2, what=f"{mode} params@3")
        assert int(state.step) == STEPS

"""One real optimization step for EVERY model-zoo family.

Integration gate complementing the per-family unit/parity tests: each
backbone goes through SpeakerNet + AAM loss + the jitted Trainer step
(bf16 compute, masked batch) and must produce a finite loss and changed
parameters. Mirrors the reference's launcher-per-model coverage
(pytorch/launcher/run*Xvector*.py) at smoke scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.models import (
    MODELS,
    ConformerXvector,
    EcapaLawlict,
    EcapaTdnn,
    ExtendedXvector,
    FactoredXvector,
    RepVggXvector,
    ResNetXvector,
    SnowdarXvector,
    SpeakerNet,
    Xvector,
)
from asv_subtools_tpu.train import (
    TrainStepConfig,
    get_optimizer,
    init_train_state,
    make_train_step,
)

TINY = {
    "xvector": lambda: Xvector(num_frame_channels=16, embd_dim=8),
    "snowdar_xvector": lambda: SnowdarXvector(num_frame_channels=16, embd_dim=8),
    "extended_xvector": lambda: ExtendedXvector(num_frame_channels=16, embd_dim=8),
    "factored_xvector": lambda: FactoredXvector(width=0.125, embd_dim=16),
    "ecapa_tdnn": lambda: EcapaTdnn(channels=16, embd_dim=8, mfa_conv=24),
    "ecapa_lawlict": lambda: EcapaLawlict(channels=16, embd_dim=8),
    "resnet_xvector": lambda: ResNetXvector(
        base_planes=8, layers=(1, 1, 1, 1), embd_dim=8
    ),
    "repvgg_xvector": lambda: RepVggXvector(
        num_blocks=(1, 1, 1, 1), width_multiplier=(0.25, 0.25, 0.25, 0.5),
        base_channels=16, embd_dim=8,
    ),
    "conformer_xvector": lambda: ConformerXvector(
        attention_dim=32, attention_heads=2, num_blocks=1,
        linear_units=48, embd_dim=8,
    ),
}


@pytest.mark.parametrize("name", sorted(TINY))
def test_one_step_every_family(name):
    backbone = TINY[name]()
    net = SpeakerNet(
        backbone=backbone,
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2, "s": 30.0},
        num_targets=6,
    )
    rng = jax.random.PRNGKey(0)
    b, t, d = 4, 64, 26
    x = jax.random.normal(rng, (b, t, d), jnp.float32)
    y = jnp.arange(b) % 6
    mask = jnp.arange(t)[None, :] < jnp.asarray([64, 50, 40, 64])[:, None]

    tx = get_optimizer("adamW", learning_rate=1e-3)
    batch = {"x": x, "y": y, "mask": mask}
    state = init_train_state(net, rng, batch, tx)
    step = make_train_step(
        net, tx, config=TrainStepConfig(compute_dtype=jnp.bfloat16)
    )
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state2, metrics = step(state, {"x": x, "y": y, "mask": mask}, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), (name, loss)
    after = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), name


def test_registry_families_covered():
    """Every MODELS entry has a smoke config here or a dedicated training
    test (multitask/FD train through their own two-optimizer paths:
    tests/test_train.py / test_extras.py)."""
    special = {"multi_task_xvector", "fd_xvector"}
    assert set(TINY) | special == set(MODELS)

"""Feature-decomposition adversarial training (two-optimizer alternation).

Parity: pytorch/libs/training/trainer_fd.py GanDalAttTrainer
(train_one_batch :427-500) + snowdar-xvector-FD-AL.py get_loss (:295-308):

  joint loss = spk_loss(spk_emb) + aux_w * aux_loss(content_emb, aux_y)
               + adv_w * cos_sim(spk_emb, content_emb)
  phase schedule by iteration: step % cycle < adv_steps -> adversary phase
  (update ONLY the DAL projections with FLIPPED gradients — canonical
  maximization, no clip); otherwise main phase (update everything else,
  incl. the att gate, descent, clipped).

One jitted step; the phase select is a traced lax.cond on state.step.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.multitask import DALRegularizer, FDXvector
from ..nn.loss import LOSSES, accuracy as compute_accuracy
from .trainer import TrainState, TrainStepConfig


class FDSpeakerNet(nn.Module):
    """FD backbone + speaker loss head + auxiliary (e.g. noise-type) head."""

    backbone: FDXvector
    num_targets: int
    num_aux_targets: int = 9  # reference loss2 = 9 classes (FD-AL :231)
    loss_name: str = "margin_softmax"
    loss_params: dict = None  # type: ignore[assignment]
    # the reference aux head follows the main head type (FD-AL :229-236:
    # MarginSoftmaxLoss(512, 9) under margin_loss else SoftmaxLoss)
    aux_loss_name: str = "softmax"
    aux_loss_params: dict = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x, targets, aux_targets, mask=None, train=True):
        spk_emb, content_emb = self.backbone(x, mask=mask, train=train)
        loss_cls = LOSSES[self.loss_name]
        spk_loss, logits = loss_cls(
            num_targets=self.num_targets, **(self.loss_params or {}), name="loss"
        )(spk_emb, targets, train=train)
        aux_loss, _ = LOSSES[self.aux_loss_name](
            num_targets=self.num_aux_targets, **(self.aux_loss_params or {}),
            name="loss2"
        )(content_emb, aux_targets, train=train)
        adv = DALRegularizer(name="dal")(content_emb, spk_emb)
        return spk_loss, aux_loss, adv, logits


def _is_adversary(path) -> bool:
    """DAL projection params — the adversary partition.

    Matches the reference set_train_mode exactly (trainer_fd.py:393-415):
    ONLY model.DAL flips between phases; the att gate trains in the MAIN
    phase alongside the trunk and both loss heads."""
    for p in path:
        key = getattr(p, "key", "")
        if isinstance(key, str) and key == "dal":
            return True
    return False


def make_fd_train_step(
    net: FDSpeakerNet,
    tx_main: optax.GradientTransformation,
    tx_adv: optax.GradientTransformation,
    aux_weight: float = 0.1,
    adv_weight: float = 0.1,
    cycle: int = 70,
    adv_steps: int = 20,
    config: TrainStepConfig = TrainStepConfig(),
):
    """Returns step(state, batch, rng) with state.opt_state = (main, adv)."""

    def loss_fn(params, batch_stats, batch, rng):
        xc = batch["x"].astype(config.compute_dtype)
        (spk_loss, aux_loss, adv, logits), mut = net.apply(
            {"params": params, "batch_stats": batch_stats},
            xc, batch["y"], batch.get("aux_y", batch["y"] % net.num_aux_targets),
            mask=batch.get("mask"), train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        total = spk_loss + aux_weight * aux_loss + adv_weight * adv
        acc = compute_accuracy(logits, batch["y"])
        return total.astype(jnp.float32), (mut["batch_stats"], acc, adv)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def mask_tree(grads, adversary: bool):
        return jax.tree_util.tree_map_with_path(
            lambda path, g: g if _is_adversary(path) == adversary else jnp.zeros_like(g),
            grads,
        )

    def step(state: TrainState, batch, rng):
        (loss, (new_bs, acc, adv)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        main_state, adv_state = state.opt_state

        def adv_phase(_):
            # maximization: flipped grads on the adversary partition only,
            # NO clip (the reference clips only on the main-optimizer path,
            # trainer_fd.py:468-496)
            g = mask_tree(jax.tree_util.tree_map(lambda x: -x, grads), True)
            updates, new_adv = tx_adv.update(g, adv_state, state.params)
            # mask updates too: weight decay would otherwise move the
            # frozen partition through zero gradients
            updates = mask_tree(updates, True)
            return optax.apply_updates(state.params, updates), (main_state, new_adv)

        def main_phase(_):
            # clip over the MAIN partition only: the reference's frozen DAL
            # params carry no .grad, so its clip_grad_norm_ never sees them
            g = mask_tree(grads, False)
            gnorm = optax.global_norm(g)
            scale = jnp.minimum(
                1.0, config.max_change / jnp.maximum(gnorm, 1e-12)
            )
            g = jax.tree_util.tree_map(lambda x: x * scale, g)
            updates, new_main = tx_main.update(g, main_state, state.params)
            updates = mask_tree(updates, False)
            return optax.apply_updates(state.params, updates), (new_main, adv_state)

        in_adv = (state.step % cycle) < adv_steps
        new_params, new_opt = jax.lax.cond(in_adv, adv_phase, main_phase, None)

        finite = jnp.isfinite(loss)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_params = keep(new_params, state.params)
        metrics = {
            "loss": loss,
            "accuracy": acc,
            "adversarial_cos": adv,
            "phase_adv": in_adv.astype(jnp.float32),
            "skipped": 1.0 - finite.astype(jnp.float32),
        }
        return (
            TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=keep(new_bs, state.batch_stats), opt_state=new_opt,
            ),
            metrics,
        )

    return step


def init_fd_state(net, rng, batch, tx_main, tx_adv) -> TrainState:
    variables = net.init(
        {"params": rng, "dropout": rng},
        batch["x"], batch["y"],
        batch.get("aux_y", batch["y"] % net.num_aux_targets),
        mask=batch.get("mask"), train=False,
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=(tx_main.init(params), tx_adv.init(params)),
    )

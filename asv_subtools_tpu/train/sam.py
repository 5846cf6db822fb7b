"""Sharpness-aware minimization train step.

Parity: pytorch/libs/training/trainer_online_sam.py:210-370 and optim.SAM
(optim.py:768-838): two-pass step — grad at w, ascend to w + rho*g/|g|
(optionally element-adaptive), re-evaluate grads there with BatchNorm
batch statistics FROZEN (the reference disables BN running-stat updates on
the second forward), then update the ORIGINAL weights with the perturbed
gradient.

One jitted function; both forwards and the update compile into a single
XLA program over the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..nn.loss import accuracy as compute_accuracy
from .trainer import TrainState, TrainStepConfig


def make_sam_train_step(
    net,
    tx: optax.GradientTransformation,
    rho: float = 0.05,
    adaptive: bool = False,
    config: TrainStepConfig = TrainStepConfig(),
    param_gather_fn=None,
):
    def loss_fn(params, batch_stats, x, y, mask, rng, lambda_m, margin_offset, mutable):
        xc = x.astype(config.compute_dtype)
        if param_gather_fn is not None:
            # ZeRO-3 at-use gather (see trainer.make_train_step): without
            # it XLA turns FSDP rest-shardings into activation TP
            params = param_gather_fn(params)
        variables = {"params": params, "batch_stats": batch_stats}
        if mutable:
            (loss, logits, _), mut = net.apply(
                variables, xc, y, mask=mask, train=True,
                lambda_m=lambda_m, margin_offset=margin_offset,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            new_bs = mut["batch_stats"]
        else:
            # frozen-BN second pass: run in train mode semantics but discard
            # the stat update by not threading it out
            (loss, logits, _), mut = net.apply(
                variables, xc, y, mask=mask, train=True,
                lambda_m=lambda_m, margin_offset=margin_offset,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            new_bs = batch_stats
        acc = compute_accuracy(logits, y)
        return loss.astype(jnp.float32), (new_bs, acc)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch, rng, lambda_m=1.0, margin_offset=0.0,
             lr_scale=1.0):
        x, y = batch["x"], batch["y"]
        mask = batch.get("mask")
        r1, r2 = jax.random.split(rng)

        # pass 1: gradient at w (updates BN stats)
        (loss1, (new_bs, acc)), g1 = grad_fn(
            state.params, state.batch_stats, x, y, mask, r1,
            lambda_m, margin_offset, True,
        )
        # ascent direction
        if adaptive:
            gnorm = optax.global_norm(
                jax.tree_util.tree_map(lambda g, p: jnp.abs(p) * g, g1, state.params)
            )
            eps = jax.tree_util.tree_map(
                lambda g, p: rho * (p**2) * g / jnp.maximum(gnorm, 1e-12),
                g1, state.params,
            )
        else:
            gnorm = optax.global_norm(g1)
            eps = jax.tree_util.tree_map(
                lambda g: rho * g / jnp.maximum(gnorm, 1e-12), g1
            )
        perturbed = jax.tree_util.tree_map(jnp.add, state.params, eps)

        # pass 2: gradient at w + eps, BN stats frozen
        (loss2, _), g2 = grad_fn(
            perturbed, new_bs, x, y, mask, r2, lambda_m, margin_offset, False
        )

        g2norm = optax.global_norm(g2)
        finite = jnp.isfinite(g2norm) & jnp.isfinite(loss2)
        scale = jnp.minimum(1.0, config.max_change / jnp.maximum(g2norm, 1e-12))
        g2 = jax.tree_util.tree_map(lambda g: g * scale, g2)
        updates, new_opt = tx.update(g2, state.opt_state, state.params)
        # plateau lr_scale scales the STEP, not the gradients — Adam-family
        # optimizers are invariant to uniform gradient scaling (same fix as
        # the main trainer, advisor r1 high)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        if config.skip_nonfinite:
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old
            )
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            new_bs = keep(new_bs, state.batch_stats)
        metrics = {
            "loss": loss1,
            "sam_loss": loss2,
            "accuracy": acc,
            "grad_norm": gnorm,
            "skipped": 1.0 - finite.astype(jnp.float32),
        }
        return (
            TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=new_bs, opt_state=new_opt,
            ),
            metrics,
        )

    return step

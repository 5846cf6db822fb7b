"""LR schedules (parity: pytorch/libs/training/lr_scheduler_online.py).

Every schedule is a pure ``step -> lr`` callable (optax convention), so it
jits into the train step with zero host sync. The stateful exception is
``reduceP`` (ReduceLROnPlateau), which needs valid-loss feedback — it is a
small host-side object whose current scale feeds the step as a traced
scalar.

Names mirror the reference LRSchedulerWrapper (lr_scheduler_online.py:18-167):
cyclic | 1cycle | warmR | noam | reduceP | constant.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax.numpy as jnp
import numpy as np
import optax


def warm_restarts(
    base_lr: float,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 1e-6,
    warmup_steps: int = 0,
) -> Callable:
    """Cosine annealing with warm restarts (SGDR), Kaldi-subtools "warmR".

    Parity: CosineAnnealingWarmRestarts (reference lr_scheduler_online.py:169-276).
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = jnp.asarray(float(t_0))
        else:
            # closed form: find restart index n with geometric cycle lengths
            n = jnp.floor(
                jnp.log1p(step * (t_mult - 1) / t_0) / math.log(t_mult)
            )
            start = t_0 * (t_mult**n - 1) / (t_mult - 1)
            t_cur = step - start
            t_i = t_0 * t_mult**n
        lr = eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t_cur / t_i))
        if warmup_steps > 0:
            warm = base_lr * (step + 1) / warmup_steps
            lr = jnp.where(step < warmup_steps, warm, lr)
        return lr

    return schedule


def cyclic(
    base_lr: float = 1e-8,
    max_lr: float = 1e-3,
    step_size_up: int = 2000,
    step_size_down: Optional[int] = None,
    mode: str = "triangular2",
    gamma: float = 1.0,
) -> Callable:
    """CyclicLR (triangular/triangular2/exp_range), the ECAPA recipe default.

    Parity: torch CyclicLR via wrapper (reference lr_scheduler_online.py:40-66).
    """
    down = step_size_down or step_size_up
    total = step_size_up + down

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(step / total)
        pos = step - cycle * total
        frac = jnp.where(pos < step_size_up, pos / step_size_up, (total - pos) / down)
        amp = max_lr - base_lr
        if mode == "triangular2":
            amp = amp / (2.0**cycle)
        elif mode == "exp_range":
            amp = amp * gamma**step
        return base_lr + amp * frac

    return schedule


def one_cycle(
    max_lr: float = 1e-3,
    total_steps: int = 100000,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Callable:
    """1cycle policy (reference lr_scheduler_online.py:67-88)."""
    init_lr = max_lr / div_factor
    final_lr = init_lr / final_div_factor
    up = int(total_steps * pct_start)
    down = total_steps - up

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        def cos_interp(a, b, frac):
            return b + (a - b) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

        frac_up = jnp.clip(step / max(up, 1), 0.0, 1.0)
        frac_down = jnp.clip((step - up) / max(down, 1), 0.0, 1.0)
        return jnp.where(
            step < up,
            cos_interp(init_lr, max_lr, 1 - frac_up),
            cos_interp(max_lr, final_lr, 1 - frac_down),
        )

    return schedule


def noam(
    base_lr: float = 1.0, model_dim: int = 256, warmup_steps: int = 25000
) -> Callable:
    """Transformer WarmupLR (reference WarmupLR lr_scheduler_online.py:278-338)."""

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return (
            base_lr
            * model_dim**-0.5
            * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)
        )

    return schedule


def constant(base_lr: float) -> Callable:
    return lambda step: jnp.asarray(base_lr, jnp.float32)


class ReduceOnPlateau:
    """Host-side ReduceLROnPlateau ("reduceP", reference :89-117).

    Call ``update(valid_loss)`` at each validation; read ``scale`` and pass
    it into the train step as a traced multiplier on the base schedule.
    """

    def __init__(
        self,
        factor: float = 0.5,
        patience: int = 2,
        threshold: float = 1e-4,
        cooldown: int = 0,
        min_lr_scale: float = 1e-3,
    ):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr_scale = min_lr_scale
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def update(self, metric: float) -> bool:
        """Returns True if the LR was reduced at this update."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
            return False
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
            return False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_lr_scale)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
            return True
        return False


def get_lr_schedule(name: str = "warmR", **kwargs) -> Callable:
    """Factory mirroring LRSchedulerWrapper dispatch (lr_scheduler_online.py:18)."""
    key = name.lower()
    if key == "warmr":
        return warm_restarts(**kwargs)
    if key == "cyclic":
        return cyclic(**kwargs)
    if key == "1cycle":
        return one_cycle(**kwargs)
    if key == "noam":
        return noam(**kwargs)
    if key == "constant":
        return constant(**kwargs)
    raise ValueError(f"Unknown LR schedule {name!r} (reduceP is ReduceOnPlateau)")


def cycle_end_steps(step_size_up: int, step_size_down: Optional[int], n: int):
    """Steps at which cyclic cycles end — for cycle-point checkpoints
    (reference lr_scheduler_online.py:119-167)."""
    total = step_size_up + (step_size_down or step_size_up)
    return [total * (i + 1) for i in range(n)]

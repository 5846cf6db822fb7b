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


def _lr_dtype():
    """f64 when x64 is enabled (parity tests: torch schedulers compute lr
    in python doubles), f32 otherwise (production; a scalar, so free)."""
    import jax

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def warm_restarts(
    base_lr: float,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 1e-6,
    factor: float = 1.0,
    log_decay: bool = False,
    warmup_steps: int = 0,
) -> Callable:
    """Cosine annealing with warm restarts (SGDR), Kaldi-subtools "warmR".

    Parity: CosineAnnealingWarmRestarts (reference
    lr_scheduler_online.py:169-276) incl. Snowdar's extras: `factor`
    decays the restart peak (base_lr * factor**n at the n-th restart) and
    `log_decay` anneals in log10 space between eta_min and the peak.
    """

    def schedule(step):
        step = jnp.asarray(step, _lr_dtype())
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = jnp.asarray(float(t_0))
            n = jnp.floor(step / t_0)
        else:
            # closed form: find restart index n with geometric cycle lengths
            n = jnp.floor(
                jnp.log1p(step * (t_mult - 1) / t_0) / math.log(t_mult)
            )
            start = t_0 * (t_mult**n - 1) / (t_mult - 1)
            t_cur = step - start
            t_i = t_0 * t_mult**n
        peak = base_lr * factor**n
        cos_frac = 0.5 * (1 + jnp.cos(jnp.pi * t_cur / t_i))
        if log_decay:
            log_min = math.log10(eta_min)
            lr = 10 ** (log_min + (jnp.log10(peak) - log_min) * cos_frac)
        else:
            lr = eta_min + (peak - eta_min) * cos_frac
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
        step = jnp.asarray(step, _lr_dtype())
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
    # torch OneCycleLR phase sizes (lr_scheduler.py): peak lands exactly
    # at step pct_start*total - 1, the final lr at step total - 1
    up = float(total_steps * pct_start) - 1.0
    down = float(total_steps) - up - 1.0

    def schedule(step):
        step = jnp.asarray(step, _lr_dtype())

        def cos_anneal(a, b, frac):
            # a -> b as frac goes 0 -> 1 (torch _annealing_cos)
            return b + (a - b) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

        frac_up = jnp.clip(step / max(up, 1.0), 0.0, 1.0)
        frac_down = jnp.clip((step - up) / max(down, 1.0), 0.0, 1.0)
        return jnp.where(
            step <= up,
            cos_anneal(init_lr, max_lr, frac_up),
            cos_anneal(max_lr, final_lr, frac_down),
        )

    return schedule


def noam(
    base_lr: float = 1.0,
    warmup_steps: int = 25000,
    step_decay: bool = False,
    step_size: int = 80000,
    step_rate: float = 0.5,
    model_dim: Optional[int] = None,
) -> Callable:
    """The reference's "noam" = wenet's WarmupLR (lr_scheduler_online.py:
    278-338): linear warmup to base_lr (the PEAK equals the optimizer lr,
    unlike classic Noam), then base_lr * warmup^0.5 * step^-0.5 — or
    staircase decay by step_rate every step_size when step_decay is on.
    Pass model_dim for the classic Noam curve instead (it folds into the
    peak as model_dim^-0.5 * warmup^-0.5 * base_lr)."""
    peak = base_lr
    if model_dim is not None:  # classic noam peak at the warmup corner
        peak = base_lr * model_dim**-0.5 * warmup_steps**-0.5

    def schedule(step):
        # reference step_num = last_epoch + 1: the lr used for optimizer
        # step k (0-based) is computed at step_num = k + 1
        s = jnp.asarray(step, _lr_dtype()) + 1.0
        warm = peak * s / warmup_steps
        if step_decay:
            k = jnp.floor((s - warmup_steps) / step_size)
            after = peak * step_rate**k
        else:
            after = peak * warmup_steps**0.5 * s**-0.5
        return jnp.where(s < warmup_steps, warm, after)

    return schedule


def constant(base_lr: float) -> Callable:
    return lambda step: jnp.asarray(base_lr, _lr_dtype())


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

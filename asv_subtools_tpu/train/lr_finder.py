"""LR range finder (parity: pytorch/libs/training/lr_finder.py:24-219).

Exponential LR sweep from `start_lr` to `end_lr` over `num_steps` batches,
recording (lr, train loss[, valid loss]) per step; suggests the LR at the
steepest descent of the smoothed loss curve.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import numpy as np


def run_lr_finder(
    step_fn: Callable,
    state,
    data_iter: Iterable,
    rng,
    start_lr: float = 1e-8,
    end_lr: float = 1.0,
    num_steps: int = 100,
    smooth: float = 0.05,
    diverge_factor: float = 5.0,
) -> Dict[str, np.ndarray]:
    """step_fn(state, batch, rng, lr_scale) -> (state, metrics with 'loss').

    The train step's base LR should be 1.0 so `lr_scale` IS the LR (or pass
    a step built with `constant(1.0)` schedule). Stops early if the loss
    diverges beyond diverge_factor x best.
    """
    gamma = (end_lr / start_lr) ** (1.0 / max(num_steps - 1, 1))
    lrs: List[float] = []
    losses: List[float] = []
    avg = None
    best = float("inf")
    for i, batch in enumerate(data_iter):
        if i >= num_steps:
            break
        lr = start_lr * gamma**i
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub, lr)
        loss = float(jax.device_get(metrics["loss"]))
        if not math.isfinite(loss):
            break
        avg = loss if avg is None else (1 - smooth) * avg + smooth * loss
        debiased = avg / (1 - (1 - smooth) ** (i + 1))
        lrs.append(lr)
        losses.append(debiased)
        best = min(best, debiased)
        if debiased > diverge_factor * best and i > 10:
            break
    lrs_a = np.asarray(lrs)
    losses_a = np.asarray(losses)
    suggestion = None
    if len(lrs_a) > 5:
        d = np.gradient(losses_a, np.log(lrs_a))
        suggestion = float(lrs_a[int(np.argmin(d))])
    return {"lrs": lrs_a, "losses": losses_a, "suggested_lr": suggestion}

"""Failure-detection aids: NaN-batch dump + deterministic replay.

Parity: the reference's nan_debug mode (trainer_online.py:232-300) saves
the failing batch and model params when loss goes non-finite, so the step
can be replayed offline; skip_nan_batch drops bad steps (our train step
already skips on-device — this module adds the forensic dump).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def dump_nan_batch(
    directory: str,
    state,
    batch: Dict,
    metrics: Dict,
    step: Optional[int] = None,
) -> str:
    """Save the offending batch + params + metrics for offline replay."""
    os.makedirs(directory, exist_ok=True)
    step = step if step is not None else int(jax.device_get(state.step))
    path = os.path.join(directory, f"nan_batch_step{step}.pkl")
    payload = {
        "step": step,
        "batch": jax.tree_util.tree_map(np.asarray, jax.device_get(batch)),
        "params": jax.tree_util.tree_map(np.asarray, jax.device_get(state.params)),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, jax.device_get(state.batch_stats)
        ),
        "metrics": {k: float(v) for k, v in jax.device_get(metrics).items()},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_nan_batch(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def replay_nan_batch(path: str, net, rng=None) -> Dict:
    """Re-run the forward pass on the dumped batch; returns loss/logits plus
    per-layer finiteness report for localization."""
    payload = load_nan_batch(path)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = {
        "params": payload["params"],
        "batch_stats": payload["batch_stats"],
    }
    batch = payload["batch"]
    (loss, logits, emb), _ = net.apply(
        variables,
        batch["x"],
        batch["y"],
        mask=batch.get("mask"),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": rng},
    )
    report = {
        "loss": float(loss),
        "loss_finite": bool(np.isfinite(float(loss))),
        "logits_finite": bool(np.all(np.isfinite(np.asarray(logits)))),
        "embedding_finite": bool(np.all(np.isfinite(np.asarray(emb)))),
        "x_finite": bool(np.all(np.isfinite(np.asarray(batch["x"])))),
        "params_finite": all(
            bool(np.all(np.isfinite(np.asarray(p))))
            for p in jax.tree_util.tree_leaves(payload["params"])
        ),
    }
    return report

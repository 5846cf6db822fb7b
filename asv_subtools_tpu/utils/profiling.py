"""Profiling / tracing utilities (SURVEY.md §5 aux subsystems).

The reference has only RTF timers; here: jax.profiler trace capture for
TensorBoard/Perfetto, a step-timer with device sync, and a static FLOPs
estimate from XLA's cost analysis (the `thop`/print_model equivalent —
pytorch/libs/nnet/count_rules_for_thop.py, bin/print_model.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open in TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Static cost analysis of a jitted function: FLOPs + bytes accessed.

    The print_model/thop equivalent — but exact, from XLA itself.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
        "transcendentals": float(cost.get("transcendentals", 0.0)),
    }


def benchmark(
    fn: Callable, *args, iters: int = 20, warmup: int = 2, **kwargs
) -> Dict[str, float]:
    """Steady-state wall time of a device function (blocks on completion)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    stats = {"seconds_per_call": dt}
    try:
        cost = flops_estimate(fn, *args, **kwargs)
        if cost["flops"] > 0:
            stats["tflops_per_second"] = cost["flops"] / dt / 1e12
        if cost["bytes_accessed"] > 0:
            stats["hbm_gbytes_per_second"] = cost["bytes_accessed"] / dt / 1e9
    except Exception:
        pass
    return stats


def param_count(params: Any) -> Dict[str, int]:
    """Per-top-level-module parameter counts (print_model equivalent)."""
    out: Dict[str, int] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out[k] = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v))
    out["total"] = sum(v for k, v in out.items())
    return out

#!/usr/bin/env python
"""A/B the ECAPA train step between two source trees on the SAME chip
session protocol (VERDICT r4 weak #1: r4's driver value was -3.3% vs r3
with a best-of-2 protocol — decide code vs tunnel).

Usage (one process per measurement leg; the caller alternates trees):

    python tools/ab_train_bench.py --tree /root/repo          # leg A
    python tools/ab_train_bench.py --tree /tmp/r3_tree        # leg B

Self-contained measurement (no import from either tree's bench.py, so
both legs run the IDENTICAL protocol): jitted scanned multi-step,
differential timing (2K - K), 5 interleaved reps, prints one JSON line
with median/min/max audio-s/s and ms/step.

Constructs TrainStepConfig WITHOUT newer optional fields so older trees
(r3) import cleanly.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(tree: str, reps: int = 5) -> dict:
    sys.path.insert(0, tree)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from asv_subtools_tpu.models import EcapaTdnn
    from asv_subtools_tpu.models.framework import SpeakerNet
    from asv_subtools_tpu.train.trainer import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
    )

    batch, samples, chunk_seconds = 128, 32000, 2.0
    num_targets = 5994
    net = SpeakerNet(
        backbone=EcapaTdnn(channels=1024, embd_dim=192),
        loss_name="margin_softmax_v1",
        loss_params={"method": "aam", "m": 0.2, "sub_k": 2,
                     "adapt_method": "topk", "topk": 5},
        num_targets=num_targets,
    )
    tx = optax.adamw(1e-3)
    step_fn = make_train_step(
        net, tx,
        config=TrainStepConfig(compute_dtype=jnp.bfloat16, wave_input=True),
    )

    rng = jax.random.PRNGKey(0)
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, samples)) * 1000.0,
        jnp.float32,
    )
    y = jnp.asarray(np.random.default_rng(1).integers(0, num_targets, batch))

    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    feats0, _ = fused_fbank(wave[:2], FbankOptions())
    state = init_train_state(net, rng, {"x": feats0, "y": y[:2]}, tx)
    batch_d = {"x": wave, "y": y}
    iters = 8

    def make_multi(n):
        @jax.jit
        def multi_step(state, batch, key):
            def body(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st, m = step_fn(st, batch, sub)
                return (st, k), m["loss"]

            (st, _), losses = jax.lax.scan(body, (state, key), None, length=n)
            return st, losses

        return multi_step

    small, big = make_multi(iters), make_multi(2 * iters)
    for jfn in (small, big):
        _, losses = jfn(state, batch_d, rng)
        jax.device_get(losses)

    def timing(jfn):
        t0 = time.perf_counter()
        _, losses = jfn(state, batch_d, rng)
        jax.device_get(losses)
        return time.perf_counter() - t0

    dts = []
    for _ in range(reps):
        t1 = timing(small)
        t2 = timing(big)
        dts.append(max(t2 - t1, 1e-9))

    audio = iters * batch * chunk_seconds
    tps = sorted(audio / d for d in dts)
    mss = sorted(d * 1000.0 / iters for d in dts)
    out = {
        "tree": tree,
        "train_tp_median": round(tps[len(tps) // 2], 1),
        "train_tp_min": round(tps[0], 1),
        "train_tp_max": round(tps[-1], 1),
        "train_ms_median": round(mss[len(mss) // 2], 3),
        "reps": reps,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    main(args.tree, args.reps)

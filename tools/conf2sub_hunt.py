#!/usr/bin/env python
"""Conformer-2Sub train-step decomposition (VERDICT r4 weak #4).

The 2Sub variant (conv2d2 subsampling, T/2 sequence length — the
reference's best-EER conformer, recipe/voxcelebSRC/README.md:41-45) is
the slowest train step in the zoo (63 ms vs 6L-4Sub's 30.5 ms). Apply
the same measured ablation protocol that closed the 4Sub question
(PERF.md "Training roofline" section): block scaling, batch scaling,
remat policy — and attribute the time.

Run on the real chip:  python tools/conf2sub_hunt.py
Prints one JSON line per experiment + a summary. Measured r5 results are
recorded in PERF.md ("Conformer-2Sub decomposition"): blocks are 87.5 %
of the step, time is linear in T (no kernel win), and B=256 is the
actionable +24 % throughput finding.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(num_blocks=6, batch=128, remat=None, subsample="conv2d2",
            d_model=256, reps=5, iters=4):
    import optax

    from asv_subtools_tpu.models.conformer import ConformerXvector
    from asv_subtools_tpu.models.framework import SpeakerNet
    from asv_subtools_tpu.train.trainer import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
    )

    num_targets = 5994
    net = SpeakerNet(
        backbone=ConformerXvector(num_blocks=num_blocks,
                                  attention_dim=d_model,
                                  attention_heads=4,
                                  input_layer=subsample),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2},
        num_targets=num_targets,
    )
    tx = optax.adamw(1e-3)
    step_fn = make_train_step(
        net, tx,
        config=TrainStepConfig(compute_dtype=jnp.bfloat16, wave_input=True,
                               remat=remat),
    )
    rng = jax.random.PRNGKey(0)
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 32000)) * 1000.0,
        jnp.float32,
    )
    y = jnp.asarray(np.random.default_rng(1).integers(0, num_targets, batch))

    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    feats0, _ = fused_fbank(wave[:2], FbankOptions())
    state = init_train_state(net, rng, {"x": feats0, "y": y[:2]}, tx)
    batch_d = {"x": wave, "y": y}

    def make_multi(n):
        @jax.jit
        def multi(state, batch, key):
            def body(c, _):
                st, k = c
                k, sub = jax.random.split(k)
                st, m = step_fn(st, batch, sub)
                return (st, k), m["loss"]

            (st, _), losses = jax.lax.scan(body, (state, key), None, length=n)
            return st, losses

        return multi

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
    mss = sorted(d * 1000.0 / iters for d in dts)
    return mss[len(mss) // 2]


def main():
    rows = []

    def run(label, **kw):
        ms = measure(**kw)
        row = {"experiment": label, "step_ms": round(ms, 2), **kw}
        rows.append(row)
        print(json.dumps(row), flush=True)

    run("baseline 6 blocks B=128 2sub")
    run("2 blocks", num_blocks=2)
    run("B=256", batch=256)
    run("remat=dots_batch", remat="dots_batch")
    run("4sub control", subsample="conv2d")
    base = rows[0]["step_ms"]
    two = rows[1]["step_ms"]
    per_block = (base - two) / 4.0
    print(json.dumps({
        "summary": {
            "baseline_ms": base,
            "per_block_ms": round(per_block, 2),
            "blocks_pct_of_step": round(100 * 6 * per_block / base, 1),
            "batch_scaling": round(rows[2]["step_ms"] / base, 2),
            "remat_delta_ms": round(rows[3]["step_ms"] - base, 2),
            "vs_4sub_ms": rows[4]["step_ms"],
        }
    }))


if __name__ == "__main__":
    main()

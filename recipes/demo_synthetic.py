#!/usr/bin/env python
"""End-to-end framework demo on real TPU hardware: synthetic speakers ->
wave-input bf16 SPMD training (fused Pallas fbank inside the train step)
-> bucketed wave-mode extraction -> submean cosine + AS-norm scoring ->
EER/minDCF. Prints a JSON summary.

Synthetic speakers are harmonic-stack "voices" (distinct f0 + formant
weights) with additive noise, so the task is learnable but not trivial.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_speaker(rng, sr=16000):
    f0 = rng.uniform(90.0, 280.0)
    weights = rng.dirichlet(np.ones(6))
    vibrato = rng.uniform(2.0, 8.0)
    return f0, weights, vibrato


def synth_utt(spk, dur, rng, sr=16000):
    f0, weights, vib = spk
    n = int(sr * dur)
    t = np.arange(n) / sr
    f_inst = f0 * (1.0 + 0.01 * np.sin(2 * np.pi * vib * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    wav = sum(
        w * np.sin((h + 1) * phase + rng.uniform(0, 6.28)) for h, w in enumerate(weights)
    )
    wav = wav * 4000 + rng.normal(size=n) * rng.uniform(100, 400)
    return wav.astype(np.float32)


def main():
    from asv_subtools_tpu.backend import compute_eer, compute_min_dcf, asnorm, cosine_score_matrix
    from asv_subtools_tpu.extract import ExtractConfig, Extractor, make_wave_embed_fn
    from asv_subtools_tpu.features import FbankOptions, MelOptions
    from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet
    from asv_subtools_tpu.train import (
        TrainStepConfig, get_lr_schedule, get_optimizer, init_train_state,
        make_train_step,
    )

    n_spk, utts_per_spk = 64, 12
    chunk_s, sr = 2.0, 16000
    steps, batch_size = 300, 64
    rng_np = np.random.default_rng(7)
    speakers = [make_speaker(rng_np) for _ in range(n_spk)]

    opts = FbankOptions(mel_opts=MelOptions(num_bins=40))
    net = SpeakerNet(
        backbone=EcapaTdnn(channels=128, embd_dim=64, mfa_conv=192),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2, "s": 30.0},
        num_targets=n_spk,
    )
    schedule = get_lr_schedule("warmR", base_lr=2e-3, t_0=steps, warmup_steps=20)
    tx = get_optimizer("adamW", learning_rate=schedule, weight_decay=1e-4)
    cfg = TrainStepConfig(wave_input=True, fbank_opts=opts)
    step = jax.jit(make_train_step(net, tx, config=cfg), donate_argnums=0)

    n_frames = opts.frame_opts.num_frames(int(chunk_s * sr))
    rng = jax.random.PRNGKey(0)
    state = init_train_state(
        net, rng,
        {"x": jnp.zeros((batch_size, n_frames, 40)), "y": jnp.zeros(batch_size, jnp.int32)},
        tx,
    )

    def sample_batch():
        ys = rng_np.integers(0, n_spk, batch_size)
        xs = np.stack(
            [synth_utt(speakers[y], chunk_s, rng_np) for y in ys]
        )
        return {"x": jnp.asarray(xs), "y": jnp.asarray(ys)}

    t_train0 = time.time()
    losses = []
    k = rng
    for i in range(steps):
        batch = sample_batch()
        k, sub = jax.random.split(k)
        state, m = step(state, batch, sub)
        if (i + 1) % 50 == 0:
            mm = jax.device_get(m)
            losses.append(float(mm["loss"]))
            print(f"step {i+1}: loss={float(mm['loss']):.3f} acc={float(mm['accuracy']):.3f}")
    train_s = time.time() - t_train0

    # eval: held-out utterances from the SAME speakers (enroll/test split)
    def model_apply(x, mask):
        return net.backbone.apply(
            {"params": state.params["backbone"],
             "batch_stats": state.batch_stats.get("backbone", {})},
            x, mask=mask, train=False,
        )

    embed = make_wave_embed_fn(model_apply, opts)
    ex = Extractor(embed, ExtractConfig(buckets=(64000,), default_batch=64, max_chunk=10**9))
    items, labels = [], []
    for s in range(n_spk):
        for u in range(4):
            items.append((f"s{s}u{u}", synth_utt(speakers[s], rng_np.uniform(2.5, 4.0), rng_np)))
            labels.append(s)
    t0 = time.time()
    embs = ex.extract_all(iter(items))
    extract_s = time.time() - t0
    keys = [k for k, _ in items]
    mat = np.stack([embs[k] for k in keys])
    mat = mat - mat.mean(axis=0)  # submean
    labels = np.asarray(labels)

    scores = np.asarray(cosine_score_matrix(mat, mat))
    iu = np.triu_indices(len(keys), 1)
    same = (labels[:, None] == labels[None, :])[iu].astype(int)
    eer, _ = compute_eer(scores[iu], same)
    dcf, _ = compute_min_dcf(scores[iu], same, p_target=0.05)

    # AS-norm with a fresh synthetic cohort
    cohort_items = [
        (f"c{i}", synth_utt(make_speaker(rng_np), 3.0, rng_np)) for i in range(128)
    ]
    cembs = ex.extract_all(iter(cohort_items))
    cohort = np.stack([cembs[k] for k, _ in cohort_items]) - mat.mean(axis=0)
    coh_scores = np.asarray(cosine_score_matrix(mat, cohort))
    normed = asnorm(scores, coh_scores, coh_scores, top_n=40)
    eer_asnorm, _ = compute_eer(normed[iu], same)

    out = {
        "speakers": n_spk,
        "train_steps": steps,
        "train_seconds": round(train_s, 1),
        "final_loss": losses[-1] if losses else None,
        "eval_utts": len(items),
        "extract_seconds": round(extract_s, 2),
        "eer_percent": round(100 * eer, 2),
        "eer_asnorm_percent": round(100 * eer_asnorm, 2),
        "min_dcf_p05": round(dcf, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

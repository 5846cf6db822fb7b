#!/usr/bin/env python
"""ECAPA roadmap tricks-ablation on the synthetic gate corpus (r4).

The reference's headline tricks table (recipe/voxcelebSRC/README.md:62-76)
chains topk -> subcenter -> (syncbn) -> AAM -> LM finetune -> MQMHA on
VoxCeleb. The datasets can't ship here, so this runs the SAME chain on
the quality gate's regression corpus (formant-only identity, overlapping
f0, channel tilt + noise) with the gate's protocol: per-config cosine EER
on held-out utterances, seeded and deterministic per run.

Configs (cumulative, mirroring the reference's rows):
  baseline       AAM m=0.2 (the calibrated gate model)
  +topk+subc     margin_softmax_v1, adapt_method=topk, sub_k=2
  +mqmha         MQMHA(2q2h) pooling
  +LM            large-margin finetune: transfer backbone, m=0.5,
                 longer chunks, low constant LR, short pass

Usage: python recipes/roadmap_gate.py [--steps 400] [--lm-steps 120]
Prints one JSON line per config plus a summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from quality_gate import SR, make_speaker, synth_utt


def run_config(label, speakers, *, steps, seed, loss_name, loss_params,
               pooling=None, pooling_params=None, chunk_s=2.0, lr=2e-3,
               margin_warm=True, init_params=None, eval_utts_per_spk=4,
               channels=128):
    import jax
    import jax.numpy as jnp

    from asv_subtools_tpu.backend import compute_eer, cosine_score_matrix
    from asv_subtools_tpu.extract import (
        ExtractConfig,
        Extractor,
        make_wave_embed_fn,
    )
    from asv_subtools_tpu.features import FbankOptions, MelOptions
    from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet
    from asv_subtools_tpu.nn.loss import MarginWarm
    from asv_subtools_tpu.train import (
        TrainStepConfig,
        get_lr_schedule,
        get_optimizer,
        init_train_state,
        make_train_step,
    )

    n_spk = len(speakers)
    batch_size = 64
    rng_np = np.random.default_rng(seed)
    opts = FbankOptions(mel_opts=MelOptions(num_bins=40))
    bb_kwargs = dict(channels=channels, embd_dim=64,
                     mfa_conv=int(channels * 1.5))
    if pooling:
        bb_kwargs["pooling"] = pooling
        bb_kwargs["pooling_params"] = pooling_params or {}
    net = SpeakerNet(
        backbone=EcapaTdnn(**bb_kwargs),
        loss_name=loss_name, loss_params=loss_params, num_targets=n_spk,
    )
    schedule = get_lr_schedule("warmR", base_lr=lr, t_0=steps,
                               warmup_steps=min(20, steps // 4))
    tx = get_optimizer("adamW", learning_rate=schedule, weight_decay=1e-4)
    cfg = TrainStepConfig(wave_input=True, fbank_opts=opts)
    step = jax.jit(make_train_step(net, tx, config=cfg), donate_argnums=0)
    mw = MarginWarm(1, 2, offset_margin=-loss_params.get("m", 0.2),
                    init_lambda=0.0, epoch_iter=max(1, steps // 4)) \
        if margin_warm else None

    n_frames = opts.frame_opts.num_frames(int(chunk_s * SR))
    rng = jax.random.PRNGKey(0)
    state = init_train_state(
        net, rng,
        {"x": jnp.zeros((batch_size, n_frames, 40)),
         "y": jnp.zeros(batch_size, jnp.int32)},
        tx,
    )
    if init_params is not None:
        # LM finetune: transfer the previous phase's backbone
        p = dict(state.params)
        p["backbone"] = jax.tree_util.tree_map(jnp.asarray,
                                               init_params["backbone"])
        state = state.replace(params=p)

    t0 = time.time()
    last = {}
    for i in range(steps):
        ys = rng_np.integers(0, n_spk, batch_size)
        xs = np.stack([synth_utt(speakers[y], chunk_s, rng_np) for y in ys])
        moff, lam = mw.step(i) if mw else (0.0, 1.0)
        lam = max(1e-3, lam) if mw else 1.0
        rng, sub = jax.random.split(rng)
        state, m = step(state, {"x": jnp.asarray(xs), "y": jnp.asarray(ys)},
                        sub, jnp.asarray(lam, jnp.float32),
                        jnp.asarray(moff, jnp.float32))
        if (i + 1) % 100 == 0:
            last = {k: float(v) for k, v in jax.device_get(m).items()}
            print(f"  [{label}] step {i+1}: loss={last['loss']:.3f} "
                  f"acc={last['accuracy']:.3f}", file=sys.stderr)

    def model_apply(x, mask):
        return net.backbone.apply(
            {"params": state.params["backbone"],
             "batch_stats": state.batch_stats.get("backbone", {})},
            x, mask=mask, train=False,
        )

    embed = make_wave_embed_fn(model_apply, opts)
    ex = Extractor(embed, ExtractConfig(buckets=(64000,), default_batch=64,
                                        max_chunk=10**9))
    eval_rng = np.random.default_rng(seed + 1)
    items, labels = [], []
    for s in range(n_spk):
        for u in range(eval_utts_per_spk):
            items.append((f"s{s}u{u}",
                          synth_utt(speakers[s],
                                    eval_rng.uniform(2.5, 4.0), eval_rng)))
            labels.append(s)
    embs = ex.extract_all(iter(items))
    mat = np.stack([embs[k] for k, _ in items])
    mat = mat - mat.mean(axis=0)
    labels = np.asarray(labels)
    scores = np.asarray(cosine_score_matrix(mat, mat))
    iu = np.triu_indices(len(items), 1)
    same = (labels[:, None] == labels[None, :])[iu].astype(int)
    eer, _ = compute_eer(scores[iu], same)
    row = {
        "config": label,
        "eer_percent": round(100.0 * eer, 2),
        "final_acc": round(last.get("accuracy", 0.0), 3),
        "train_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(row), flush=True)
    import jax as _jax

    return row, _jax.device_get(state.params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lm-steps", type=int, default=120)
    ap.add_argument("--spk", type=int, default=48)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(args.seed)
    speakers = [make_speaker(rng) for _ in range(args.spk)]
    topk = min(5, args.spk - 1)

    rows = []
    r, _ = run_config("baseline_aam", speakers, steps=args.steps,
                      seed=args.seed, loss_name="margin_softmax",
                      loss_params={"method": "aam", "m": 0.2, "s": 30.0})
    rows.append(r)
    r, _ = run_config(
        "topk_subcenter", speakers, steps=args.steps, seed=args.seed,
        loss_name="margin_softmax_v1",
        loss_params={"method": "aam", "m": 0.2, "s": 30.0, "sub_k": 2,
                     "adapt_method": "topk", "topk": topk})
    rows.append(r)
    r, params_mq = run_config(
        "mqmha", speakers, steps=args.steps, seed=args.seed,
        loss_name="margin_softmax_v1",
        loss_params={"method": "aam", "m": 0.2, "s": 30.0, "sub_k": 2,
                     "adapt_method": "topk", "topk": topk},
        pooling="mqmha", pooling_params={"num_q": 2, "num_head": 2})
    rows.append(r)
    r, _ = run_config(
        "lm_finetune", speakers, steps=args.lm_steps, seed=args.seed + 10,
        loss_name="margin_softmax_v1",
        loss_params={"method": "aam", "m": 0.5, "s": 30.0, "sub_k": 2,
                     "adapt_method": "topk", "topk": topk},
        pooling="mqmha", pooling_params={"num_q": 2, "num_head": 2},
        chunk_s=4.0, lr=5e-5, margin_warm=False, init_params=params_mq)
    rows.append(r)
    print(json.dumps({"metric": "roadmap_gate", "rows": rows}))


if __name__ == "__main__":
    main()

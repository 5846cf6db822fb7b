#!/usr/bin/env python
"""Regression-sensitive quality gate (VERDICT r1 #9).

Synthesizes a corpus hard enough that cosine EER lands in the 2-10% band
(not the 0.01% of demo_synthetic): speaker identity is carried by
vocal-tract formant positions ONLY, while f0 ranges overlap across
speakers and every utterance gets a random channel tilt + additive noise
(5-20 dB SNR). A subtle loss/BN/aug bug that demo_synthetic cannot see
moves this EER out of band.

Usage: python recipes/quality_gate.py [--steps 400] [--spk 48] [--cpu]
Prints ONE JSON line {"eer_percent", "band", "pass", ...}; exit 1 if out
of band. The driver/judge records it round-over-round in PROGRESS.

Statistical power (r5 calibration, see the note above CALIBRATION):
`--multi` is a PAIRED 5-seed gate — per-seed deltas vs recorded
calibration EERs, |mean delta| <= 0.45 — whose minimum reliably
detectable quality regression is ~0.5 pt EER ~ 7% RELATIVE; a plain
absolute band at the same seed budget could only catch ~12%.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


SR = 16000


def make_speaker(rng):
    """Vocal-tract-like identity: 4 formant resonators. f0 deliberately
    overlaps across speakers so pitch alone cannot separate them."""
    return {
        "formants": np.array([
            rng.uniform(280, 900),
            rng.uniform(900, 2200),
            rng.uniform(2200, 3100),
            rng.uniform(3100, 4200),
        ]),
        "bw": rng.uniform(60, 140, size=4),
        "gains": rng.dirichlet(np.ones(4)) + 0.1,
        "f0_mean": rng.uniform(110, 220),
    }


def synth_utt(spk, dur, rng, sr=SR):
    """Glottal harmonic source -> formant cascade -> channel tilt + noise."""
    from scipy import signal as sps

    n = int(sr * dur)
    t = np.arange(n) / sr
    f0 = spk["f0_mean"] * rng.uniform(0.8, 1.25)  # per-utt pitch variation
    vib = rng.uniform(3.0, 7.0)
    f_inst = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * vib * t)
                   + 0.01 * rng.normal(size=n).cumsum() / np.sqrt(np.arange(1, n + 1)))
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    n_harm = max(3, int(4000 / max(f0, 1.0)))
    src = sum(
        np.sin((h + 1) * phase + rng.uniform(0, 6.28)) / (h + 1)
        for h in range(n_harm)
    )

    # formant cascade: 2nd-order resonators at the speaker's formants
    out = np.zeros_like(src)
    for fc, bw, g in zip(spk["formants"], spk["bw"], spk["gains"]):
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        b = [1.0 - r]
        a = [1.0, -2 * r * np.cos(theta), r * r]
        out = out + g * sps.lfilter(b, a, src)

    # per-utterance channel: random spectral tilt (1st-order) + gain
    tilt = rng.uniform(-0.7, 0.7)
    out = sps.lfilter([1.0, tilt], [1.0], out)
    out = out / (np.abs(out).max() + 1e-9) * rng.uniform(2000, 8000)

    # additive noise at 5-20 dB SNR
    snr_db = rng.uniform(5.0, 20.0)
    sig_p = np.mean(out**2)
    noise = rng.normal(size=n)
    noise *= np.sqrt(sig_p / (10 ** (snr_db / 10.0)))
    return (out + noise).astype(np.float32)


# Calibration (r4 -> r5, real chip, 400 steps). Facts, in order of
# discovery:
#   * per-seed EER is DETERMINISTIC (seed 7 run twice -> identical 7.36
#     to every digit);
#   * across CORPUS seeds the spread is large — 8 seeds (r5):
#     7.36/6.60/6.79/6.74/8.68/9.42/6.27/5.56, mean 7.18, per-seed
#     s = 1.28 — each seed draws genuinely easier/harder speakers, so an
#     ABSOLUTE mean band cannot detect less than ~2*s/sqrt(k) ~ 0.9 pt
#     (12% relative at k=5);
#   * across GRAPH changes the SAME seed moves much less (~±0.4 pt
#     observed over r2->r4 bisection; corpus difficulty is fixed by the
#     seed).
# The r5 gate is therefore PAIRED: each seed's EER is compared to its
# recorded calibration value below, and the regression signal is the
# MEAN PER-SEED DELTA — corpus difficulty cancels exactly, leaving only
# cross-graph chaos (sigma ~ 0.4/seed -> sigma_mean = 0.4/sqrt(5) =
# 0.18). Band |mean delta| <= 0.45 (2.5 sigma): minimum reliably
# detectable regression ~ 0.5 pt ~ 7% relative on the 7.2 base — vs the
# ~12% an absolute band allows at the same cost. An absolute sanity band
# on the mean (chance-level/broken-run catch) is kept, wide.
CALIBRATION = {7: 7.36, 8: 6.60, 9: 6.79, 10: 6.74, 11: 8.68,
               12: 9.42, 13: 6.27, 14: 5.56}  # r5, 400 steps, this code
MULTI_SEEDS = (7, 8, 9, 10, 11)
DELTA_BAND = 0.45           # |mean(EER_seed - CALIBRATION[seed])| bound
MULTI_BAND = (5.5, 9.0)     # absolute sanity band on the k-seed mean
SINGLE_BAND = (4.8, 10.2)   # per-seed envelope +/- margin; smoke only


def run_gate(steps=400, n_spk=48, channels=128, batch_size=64,
             eval_utts_per_spk=4, band=SINGLE_BAND, seed=7):
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
    from asv_subtools_tpu.train import (
        TrainStepConfig,
        get_lr_schedule,
        get_optimizer,
        init_train_state,
        make_train_step,
    )

    chunk_s = 2.0
    rng_np = np.random.default_rng(seed)
    speakers = [make_speaker(rng_np) for _ in range(n_spk)]

    opts = FbankOptions(mel_opts=MelOptions(num_bins=40))
    net = SpeakerNet(
        backbone=EcapaTdnn(channels=channels, embd_dim=64,
                           mfa_conv=int(channels * 1.5)),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2, "s": 30.0},
        num_targets=n_spk,
    )
    schedule = get_lr_schedule("warmR", base_lr=2e-3, t_0=steps, warmup_steps=20)
    tx = get_optimizer("adamW", learning_rate=schedule, weight_decay=1e-4)
    cfg = TrainStepConfig(wave_input=True, fbank_opts=opts)
    step = jax.jit(make_train_step(net, tx, config=cfg), donate_argnums=0)

    n_frames = opts.frame_opts.num_frames(int(chunk_s * SR))
    rng = jax.random.PRNGKey(0)
    state = init_train_state(
        net, rng,
        {"x": jnp.zeros((batch_size, n_frames, 40)),
         "y": jnp.zeros(batch_size, jnp.int32)},
        tx,
    )

    t0 = time.time()
    last = {}
    for i in range(steps):
        ys = rng_np.integers(0, n_spk, batch_size)
        xs = np.stack([synth_utt(speakers[y], chunk_s, rng_np) for y in ys])
        rng, sub = jax.random.split(rng)
        state, m = step(state, {"x": jnp.asarray(xs), "y": jnp.asarray(ys)}, sub)
        if (i + 1) % 100 == 0:
            last = {k: float(v) for k, v in jax.device_get(m).items()}
            print(f"step {i + 1}: loss={last['loss']:.3f} "
                  f"acc={last['accuracy']:.3f}", file=sys.stderr)
    train_s = time.time() - t0

    def model_apply(x, mask):
        return net.backbone.apply(
            {"params": state.params["backbone"],
             "batch_stats": state.batch_stats.get("backbone", {})},
            x, mask=mask, train=False,
        )

    embed = make_wave_embed_fn(model_apply, opts)
    ex = Extractor(embed, ExtractConfig(buckets=(64000,), default_batch=64,
                                        max_chunk=10**9))
    items, labels = [], []
    for s in range(n_spk):
        for u in range(eval_utts_per_spk):
            items.append(
                (f"s{s}u{u}",
                 synth_utt(speakers[s], rng_np.uniform(2.5, 4.0), rng_np))
            )
            labels.append(s)
    embs = ex.extract_all(iter(items))
    mat = np.stack([embs[k] for k, _ in items])
    mat = mat - mat.mean(axis=0)
    labels = np.asarray(labels)

    scores = np.asarray(cosine_score_matrix(mat, mat))
    iu = np.triu_indices(len(items), 1)
    same = (labels[:, None] == labels[None, :])[iu].astype(int)
    eer, _ = compute_eer(scores[iu], same)
    eer_pct = 100.0 * eer

    ok = band[0] <= eer_pct <= band[1]
    out = {
        "metric": "quality_gate_eer",
        "eer_percent": round(eer_pct, 2),
        "band": list(band),
        "pass": bool(ok),
        "speakers": n_spk,
        "train_steps": steps,
        "final_loss": last.get("loss"),
        "final_acc": last.get("accuracy"),
        "train_seconds": round(train_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return out


def run_gate_multi(seeds=MULTI_SEEDS, band=MULTI_BAND,
                   delta_band=DELTA_BAND, **kw):
    """The regression gate proper (r5, PAIRED design — see the
    calibration note above): per-seed EER deltas vs the recorded
    calibration values; gate = |mean delta| <= delta_band, plus a wide
    absolute sanity band on the mean."""
    runs = [run_gate(seed=s, band=(0.0, 100.0), **kw) for s in seeds]
    eers = [r["eer_percent"] for r in runs]
    mean = float(np.mean(eers))
    deltas = [e - CALIBRATION[s] for s, e in zip(seeds, eers)
              if s in CALIBRATION]
    mean_delta = float(np.mean(deltas)) if deltas else 0.0
    ok = (band[0] <= mean <= band[1]) and abs(mean_delta) <= delta_band
    out = {
        "metric": "quality_gate_eer_mean",
        "eer_percent_mean": round(mean, 2),
        "per_seed": {s: e for s, e in zip(seeds, eers)},
        "mean_delta_vs_calibration": round(mean_delta, 3),
        "delta_band": delta_band,
        "band": list(band),
        "pass": bool(ok),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--spk", type=int, default=48)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--seed", type=int, default=7,
                    help="corpus+train seed (single-seed smoke run)")
    ap.add_argument("--multi", action="store_true",
                    help="the real regression gate: mean over seeds "
                         f"{MULTI_SEEDS}, band {MULTI_BAND}")
    ap.add_argument("--band", type=float, nargs=2, default=None,
                    help="override pass band (default: the calibrated one)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    kw = dict(steps=args.steps, n_spk=args.spk, channels=args.channels)
    if args.multi:
        mb = tuple(args.band) if args.band is not None else MULTI_BAND
        res = run_gate_multi(band=mb, **kw)
    else:
        if args.band is not None:
            kw["band"] = tuple(args.band)
        res = run_gate(seed=args.seed, **kw)
    sys.exit(0 if res["pass"] else 1)

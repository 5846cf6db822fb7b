#!/usr/bin/env python
"""Anti-spoofing end-to-end gate: OCSoftmax training -> CM EER + min t-DCF.

Exercises the reference's anti-spoof surface as one pipeline: the
OCSoftmax one-class loss (reference pytorch/libs/nnet/loss.py:734-769)
trained through the standard SpeakerNet/train-step machinery, scored with
compute_eer + compute_min_tdcf (reference computeMin-t-DCF.py) — the
ASVspoof-shaped task the reference supports piecewise but never wires
into a runnable recipe.

Corpus: bona fide = the quality-gate formant voices; spoof = three
synthetic "attack" families applied to the same voices (mu-law
companding distortion ~ codec nonlinearity; hard clipping ~ amplifier
saturation; 4 kHz downsample-upsample ~ bandwidth artifact). ASV
scores for the t-DCF are drawn from calibrated Gaussians
(documented stand-in — the tandem metric needs an ASV system, which the
CM gate does not train).

Usage: python recipes/antispoof_gate.py [--steps 300] [--cpu]
Prints ONE JSON line; exit 1 if the CM EER leaves the pass band.
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


def spoof_utt(wav: np.ndarray, attack: int, rng) -> np.ndarray:
    """Three synthetic spoof families over a bona-fide waveform."""
    from scipy import signal as sps

    if attack == 0:
        # hard mu-law companding (nonlinear harmonic distortion — strong
        # enough to survive per-utterance CMVN; random-phase resynthesis
        # was tried first and is INVISIBLE to a phase-insensitive mel
        # front-end, and mild mu<=255 companding hid under the corpus's
        # own 5-20 dB additive noise)
        peak = np.abs(wav).max() + 1e-9
        mu = float(rng.uniform(255, 2047))
        x = wav / peak
        out = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu) * peak
    elif attack == 1:
        # hard clipping at 30-60% of peak (odd-harmonic distortion;
        # 3-4 bit quantization was tried first and its noise floor hides
        # under the corpus's 5-20 dB additive noise — chance-level EER)
        peak = np.abs(wav).max() + 1e-9
        c = float(rng.uniform(0.3, 0.6)) * peak
        out = np.clip(wav, -c, c)
    else:
        # 4 kHz bandwidth round trip
        out = sps.resample_poly(sps.resample_poly(wav, 1, 4), 4, 1)[: len(wav)]
    out = np.asarray(out, np.float32)
    if len(out) < len(wav):
        out = np.pad(out, (0, len(wav) - len(out)))
    return out


def run_gate(steps=600, n_spk=24, channels=128, batch_size=64,
             band=(0.5, 20.0), seed=11):
    import jax
    import jax.numpy as jnp

    from asv_subtools_tpu.backend import compute_eer, compute_min_tdcf
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
        loss_name="ocsoftmax",
        # "paper" = Zhang et al. 2021 eq. 8; the reference's shipped sign
        # convention is a latent defect (constraints overlap on
        # (r_fake, r_real) -> zero loss with no separation; see nn/loss.py)
        loss_params={"r_real": 0.9, "r_fake": 0.2, "alpha": 20.0,
                     "convention": "paper"},
        num_targets=2,
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

    # pre-generated pool (host synthesis dominated wall time at ~1 s/batch;
    # a fixed 960-utterance pool re-sampled per step keeps the chip fed)
    pool_x, pool_y = [], []
    for _ in range(480):
        spk = speakers[rng_np.integers(0, n_spk)]
        w = synth_utt(spk, chunk_s, rng_np)
        pool_x.append(w)
        pool_y.append(1)
        pool_x.append(spoof_utt(w, int(rng_np.integers(0, 3)), rng_np))
        pool_y.append(0)
    pool_x = np.stack(pool_x)
    pool_y = np.asarray(pool_y, np.int32)

    def make_batch():
        idx = rng_np.integers(0, len(pool_x), batch_size)
        return pool_x[idx], pool_y[idx]

    t0 = time.time()
    last = {}
    for i in range(steps):
        xs, ys = make_batch()
        rng, sub = jax.random.split(rng)
        state, m = step(state, {"x": jnp.asarray(xs), "y": jnp.asarray(ys)}, sub)
        if (i + 1) % 100 == 0:
            last = {k: float(v) for k, v in jax.device_get(m).items()}
            print(f"step {i + 1}: loss={last['loss']:.4f}", file=sys.stderr)
    train_s = time.time() - t0

    # countermeasure scoring: bona-fide score = cos(emb, center)
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
        for u in range(8):
            w = synth_utt(speakers[s], rng_np.uniform(2.5, 3.5), rng_np)
            if u % 2 == 0:
                items.append((f"s{s}u{u}b", w))
                labels.append(1)
            else:
                items.append(
                    (f"s{s}u{u}a", spoof_utt(w, u % 3, rng_np))
                )
                labels.append(0)
    embs = ex.extract_all(iter(items))
    mat = np.stack([embs[k] for k, _ in items]).astype(np.float32).copy()
    center = np.array(
        jax.device_get(state.params["loss"]["center"]), np.float32
    )[0]
    mat /= np.linalg.norm(mat, axis=-1, keepdims=True) + 1e-9
    center /= np.linalg.norm(center) + 1e-9
    cm_scores = mat @ center  # paper convention: bona fide ABOVE r_real
    labels = np.asarray(labels)

    eer, _ = compute_eer(cm_scores, labels)
    eer_pct = 100.0 * eer

    # tandem min t-DCF: calibrated Gaussian ASV stand-in (see docstring)
    n_asv = 2000
    g = np.random.default_rng(0)
    asv_scores = np.concatenate([
        g.normal(2.0, 1.0, n_asv),    # target
        g.normal(-2.0, 1.0, n_asv),   # nontarget
        g.normal(0.5, 1.5, n_asv),    # spoof
    ])
    asv_labels = np.concatenate([
        np.ones(n_asv, np.int64),
        np.zeros(n_asv, np.int64),
        -np.ones(n_asv, np.int64),
    ])
    min_tdcf = compute_min_tdcf(asv_scores, asv_labels, cm_scores, labels)

    ok = band[0] <= eer_pct <= band[1]
    out = {
        "metric": "antispoof_gate",
        "cm_eer_percent": round(eer_pct, 2),
        "min_tdcf": round(float(min_tdcf), 4),
        "band": list(band),
        "pass": bool(ok),
        "train_steps": steps,
        "final_loss": last.get("loss"),
        "train_seconds": round(train_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = run_gate(steps=args.steps)
    sys.exit(0 if res["pass"] else 1)

#!/usr/bin/env python
"""Domain-adaptation end-to-end gate: the reference's SRE use-case shape.

The reference ships six PLDA adaptation variants (score/pyplda/
ivector-adapt-plda{,-coral,-coralplus,-lip,-lip-reg,-cip,-cip-reg}.py)
whose entire point is recovering a PLDA trained in one domain when the
evaluation audio comes from another. Round-2 proved numeric parity of
every variant (tests/test_adaptation_parity.py); this recipe proves the
*workflow* end-to-end on audio:

  1. train a small ECAPA on SOURCE-domain synthetic speakers
     (full-band, mild channel tilt, 5-20 dB SNR — quality_gate corpus);
  2. estimate PLDA on source-domain embeddings of the train speakers;
  3. evaluate on UNSEEN speakers in a TARGET domain (telephone-like
     300-3400 Hz bandpass + stronger tilt + 0-12 dB noise) -> the
     source PLDA degrades;
  4. adapt and re-score: Kaldi-unsupervised / CORAL / CORAL+ use the
     target-domain set UNLABELED; LIP-Reg / CIP-Reg (interpolation
     variants) additionally get the small LABELED in-domain PLDA the
     reference's scenario assumes (Wang et al. 2020).

Gate: at least one covariance-level adaptation (CORAL+/LIP/CIP family)
must beat the unadapted source PLDA on target-domain EER.

Usage: python recipes/adaptation_gate.py [--steps 400] [--cpu]
Prints ONE JSON line; exit 1 if the gate fails.
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


def to_target_domain(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Telephone-like channel: 300-3400 Hz bandpass, extra 1st-order tilt,
    additive noise at 0-12 dB SNR (measured on the band-limited signal)."""
    from scipy import signal as sps

    sos = sps.butter(4, [300.0, 3400.0], btype="bandpass", fs=SR, output="sos")
    out = sps.sosfilt(sos, wav.astype(np.float64))
    tilt = rng.uniform(0.3, 0.9)  # strong, always-positive tilt (darker)
    out = sps.lfilter([1.0, tilt], [1.0], out)
    snr_db = rng.uniform(0.0, 12.0)
    sig_p = np.mean(out**2) + 1e-12
    noise = rng.normal(size=out.shape)
    noise *= np.sqrt(sig_p / (10 ** (snr_db / 10.0)))
    out = out + noise
    return (out / (np.abs(out).max() + 1e-9) * 4000.0).astype(np.float32)


def run_gate(steps=400, n_train_spk=48, n_adapt_spk=24, n_eval_spk=24,
             channels=128, batch_size=64, seed=11):
    import jax
    import jax.numpy as jnp

    from asv_subtools_tpu.backend import (
        PldaStats,
        TwoCovPlda,
        adapt_plda_cip_reg,
        adapt_plda_coral,
        adapt_plda_coral_plus,
        adapt_plda_lip_reg,
        adapt_plda_unsupervised,
        compute_eer,
        estimate_plda,
        length_norm,
        plda_score_trials,
    )
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
    train_spk = [make_speaker(rng_np) for _ in range(n_train_spk)]
    adapt_spk = [make_speaker(rng_np) for _ in range(n_adapt_spk)]
    eval_spk = [make_speaker(rng_np) for _ in range(n_eval_spk)]

    opts = FbankOptions(mel_opts=MelOptions(num_bins=40))
    net = SpeakerNet(
        backbone=EcapaTdnn(channels=channels, embd_dim=64,
                           mfa_conv=int(channels * 1.5)),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2, "s": 30.0},
        num_targets=n_train_spk,
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
    for i in range(steps):
        ys = rng_np.integers(0, n_train_spk, batch_size)
        xs = np.stack([synth_utt(train_spk[y], chunk_s, rng_np) for y in ys])
        rng, sub = jax.random.split(rng)
        state, m = step(state, {"x": jnp.asarray(xs), "y": jnp.asarray(ys)}, sub)
        if (i + 1) % 100 == 0:
            mm = {k: float(v) for k, v in jax.device_get(m).items()}
            print(f"step {i + 1}: loss={mm['loss']:.3f} "
                  f"acc={mm['accuracy']:.3f}", file=sys.stderr)
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

    def extract_set(tag, speakers, utts_per_spk, domain):
        items, labels = [], []
        for s, spk in enumerate(speakers):
            for u in range(utts_per_spk):
                wav = synth_utt(spk, rng_np.uniform(2.5, 4.0), rng_np)
                if domain == "target":
                    wav = to_target_domain(wav, rng_np)
                items.append((f"{tag}{s}u{u}", wav))
                labels.append(s)
        embs = ex.extract_all(iter(items))
        return np.stack([embs[k] for k, _ in items]), np.asarray(labels)

    # backend training: train speakers, FRESH source-domain utterances
    x_src, y_src = extract_set("b", train_spk, 8, "source")
    # adaptation set: unseen speakers, target domain (labels only used
    # by the LIP/CIP interpolation variants)
    x_adapt, y_adapt = extract_set("a", adapt_spk, 6, "target")
    # evaluation: other unseen speakers, target domain
    x_eval, y_eval = extract_set("e", eval_spk, 6, "target")

    src_mean = x_src.mean(axis=0)
    ln = lambda v: length_norm(v - src_mean)
    x_src_n, x_adapt_n, x_eval_n = ln(x_src), ln(x_adapt), ln(x_eval)

    plda = estimate_plda(PldaStats.from_vectors(x_src_n, y_src), 10)

    iu = np.triu_indices(len(x_eval_n), 1)
    same = (y_eval[:, None] == y_eval[None, :])[iu].astype(int)

    def eer_of(scores_mat):
        e, _ = compute_eer(np.asarray(scores_mat)[iu], same)
        return 100.0 * e

    results = {}
    # cosine on the length-normed (source-centered) embeddings
    results["cosine"] = eer_of(x_eval_n @ x_eval_n.T)
    results["plda_source"] = eer_of(plda_score_trials(plda, x_eval_n, x_eval_n))

    # Kaldi unsupervised adaptation works on the scoring form directly
    plda_u = adapt_plda_unsupervised(plda, x_adapt_n)
    results["plda_aplda"] = eer_of(plda_score_trials(plda_u, x_eval_n, x_eval_n))

    two_out = TwoCovPlda.from_scoring_form(plda)
    for name, fn in (("coral", adapt_plda_coral),
                     ("coral_plus", adapt_plda_coral_plus)):
        adapted = fn(two_out, x_adapt_n).to_scoring_form()
        results[f"plda_{name}"] = eer_of(
            plda_score_trials(adapted, x_eval_n, x_eval_n))

    # interpolation variants: small labeled in-domain PLDA + robust OOD one
    plda_in = estimate_plda(PldaStats.from_vectors(x_adapt_n, y_adapt), 10)
    two_in = TwoCovPlda.from_scoring_form(plda_in)
    results["plda_indomain_only"] = eer_of(
        plda_score_trials(plda_in, x_eval_n, x_eval_n))
    adapted = adapt_plda_lip_reg(two_out, two_in).to_scoring_form()
    results["plda_lip_reg"] = eer_of(
        plda_score_trials(adapted, x_eval_n, x_eval_n))
    adapted = adapt_plda_cip_reg(two_out, two_in, x_adapt_n).to_scoring_form()
    results["plda_cip_reg"] = eer_of(
        plda_score_trials(adapted, x_eval_n, x_eval_n))

    base = results["plda_source"]
    best_name, best = min(
        ((k, v) for k, v in results.items()
         if k.startswith("plda_")
         and k not in ("plda_source", "plda_indomain_only")),
        key=lambda kv: kv[1],
    )
    ok = best < base
    out = {
        "metric": "adaptation_gate",
        "eer_percent": {k: round(v, 2) for k, v in results.items()},
        "best_adaptation": best_name,
        "improves": bool(ok),
        "train_steps": steps,
        "train_seconds": round(train_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = run_gate(steps=args.steps)
    sys.exit(0 if res["improves"] else 1)

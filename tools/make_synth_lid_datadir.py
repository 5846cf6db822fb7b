#!/usr/bin/env python
"""Synthetic language-identification corpus for the OLR recipe.

Each "language" is a phonotactic system: its own vowel inventory (8
formant-target constellations in F1/F2/F3 space) and rhythm (phone
duration statistics). Speakers within a language share the inventory but
differ in vocal-tract scale (uniform formant scaling), f0, and
per-utterance channel tilt/noise — so language identity is carried by
the SEGMENTAL structure, not by any single speaker's voice. Eval
speakers are disjoint from train speakers, so a system cannot score the
task through speaker identity.

Writes <out>/{train,eval}/{wav.scp,utt2lang,utt2spk} + 16-bit wavs —
the shape recipes/olr/run.py consumes (parity: the reference's
AP-OLR datadir layout, recipe/ap-olr2020-baseline).

Usage: python tools/make_synth_lid_datadir.py --out /tmp/lid
         [--langs 6] [--train-spk 8] [--eval-spk 4] [--utts 10] [--dur 3.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

SR = 16000


def make_language(rng):
    """Vowel inventory + rhythm: the language's segmental signature."""
    n_vowels = 8
    vowels = np.stack(
        [
            rng.uniform(280, 850, size=n_vowels),    # F1
            rng.uniform(900, 2400, size=n_vowels),   # F2
            rng.uniform(2300, 3200, size=n_vowels),  # F3
            rng.uniform(3300, 4200, size=n_vowels),  # F4
        ],
        axis=1,
    )
    return {
        "vowels": vowels,
        "bw": rng.uniform(60, 140, size=4),
        "phone_dur_mean": rng.uniform(0.08, 0.22),  # rhythm
        "phone_dur_std": rng.uniform(0.01, 0.05),
        # phonotactics: a sticky 1st-order transition bias
        "trans": rng.dirichlet(np.ones(n_vowels) * 0.5, size=n_vowels),
    }


def make_speaker(rng):
    """Within-language variation: vocal-tract scale + pitch."""
    return {
        "scale": rng.uniform(0.85, 1.18),
        "f0_mean": rng.uniform(110, 220),
        "gains": rng.dirichlet(np.ones(4)) + 0.1,
    }


def synth_utt(lang, spk, dur, rng, sr=SR):
    """Random phoneme sequence -> per-segment formant cascade, crossfaded."""
    from scipy import signal as sps

    n = int(sr * dur)
    t = np.arange(n) / sr
    f0 = spk["f0_mean"] * rng.uniform(0.85, 1.2)
    vib = rng.uniform(3.0, 7.0)
    f_inst = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * vib * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    n_harm = max(3, int(4000 / max(f0, 1.0)))
    src = sum(
        np.sin((h + 1) * phase + rng.uniform(0, 6.28)) / (h + 1)
        for h in range(n_harm)
    )

    out = np.zeros(n)
    pos = 0
    state = rng.integers(len(lang["vowels"]))
    xfade = int(0.015 * sr)
    while pos < n:
        seg_dur = max(0.04, rng.normal(lang["phone_dur_mean"],
                                       lang["phone_dur_std"]))
        seg = min(int(seg_dur * sr), n - pos)
        formants = lang["vowels"][state] * spk["scale"]
        y = np.zeros(seg)
        for fc, bw, g in zip(formants, lang["bw"], spk["gains"]):
            fc = min(fc, sr / 2 - 200)
            r = np.exp(-np.pi * bw / sr)
            theta = 2 * np.pi * fc / sr
            y = y + g * sps.lfilter([1.0 - r], [1.0, -2 * r * np.cos(theta), r * r],
                                    src[pos : pos + seg])
        env = np.ones(seg)
        m = min(xfade, seg // 2)
        if m > 0:
            env[:m] = np.linspace(0, 1, m)
            env[-m:] = np.linspace(1, 0, m)
        out[pos : pos + seg] += y * env
        pos += seg
        state = rng.choice(len(lang["vowels"]), p=lang["trans"][state])

    tilt = rng.uniform(-0.7, 0.7)
    out = sps.lfilter([1.0, tilt], [1.0], out)
    snr_db = rng.uniform(8, 25)
    sig_rms = np.sqrt(np.mean(out**2) + 1e-12)
    out = out + rng.normal(size=n) * sig_rms * 10 ** (-snr_db / 20)
    return (out / (np.abs(out).max() + 1e-9) * rng.uniform(4000, 12000)).astype(
        np.float32
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", type=int, default=6)
    ap.add_argument("--train-spk", type=int, default=8)
    ap.add_argument("--eval-spk", type=int, default=4)
    ap.add_argument("--utts", type=int, default=10)
    ap.add_argument("--eval-utts", type=int, default=5)
    ap.add_argument("--dur", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from asv_subtools_tpu.io.wav import write_wav

    rng = np.random.default_rng(args.seed)
    langs = [make_language(rng) for _ in range(args.langs)]

    for subset, n_spk, n_utt in [("train", args.train_spk, args.utts),
                                 ("eval", args.eval_spk, args.eval_utts)]:
        d = os.path.join(args.out, subset)
        wav_dir = os.path.join(d, "wav")
        os.makedirs(wav_dir, exist_ok=True)
        scp, u2l, u2s = [], [], []
        for li, lang in enumerate(langs):
            for si in range(n_spk):
                spk = make_speaker(rng)
                spk_id = f"L{li:02d}-{subset}-S{si:02d}"
                for ui in range(n_utt):
                    utt = f"{spk_id}-U{ui:03d}"
                    wav = synth_utt(lang, spk, args.dur, rng)
                    path = os.path.join(wav_dir, utt + ".wav")
                    write_wav(path, wav, SR)
                    scp.append(f"{utt} {path}")
                    u2l.append(f"{utt} lang{li:02d}")
                    u2s.append(f"{utt} {spk_id}")
        for name, lines in [("wav.scp", scp), ("utt2lang", u2l),
                            ("utt2spk", u2s)]:
            with open(os.path.join(d, name), "w") as f:
                f.write("\n".join(lines) + "\n")
        print(f"{subset}: {len(scp)} utts, {args.langs} languages")


if __name__ == "__main__":
    main()

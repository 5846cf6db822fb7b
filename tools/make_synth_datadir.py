#!/usr/bin/env python
"""Materialize the quality-gate synthetic corpus as a Kaldi-style datadir.

recipes/quality_gate.py synthesizes its audio in memory; this writes the
same formant-identity corpus to disk (16-bit wavs + wav.scp/utt2spk +
trials) so the FULL VoxCeleb recipe path (recipes/voxceleb/run.py stages
0-3: online egs -> Launcher train -> extract -> AS-norm scored EER) can
be exercised end-to-end on a disk-backed dataset — the reference's L7
deliverable shape (recipe/voxcelebSRC/runVoxcelebSRC.sh) on data we can
generate in-image.

Usage: python tools/make_synth_datadir.py --out /tmp/synthdata
         [--spk 48] [--train-utts 12] [--eval-utts 4] [--dur 4.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "recipes"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--spk", type=int, default=48)
    ap.add_argument("--train-utts", type=int, default=12)
    ap.add_argument("--eval-utts", type=int, default=4)
    ap.add_argument("--dur", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from quality_gate import SR, make_speaker, synth_utt

    from asv_subtools_tpu.io.wav import write_wav

    rng = np.random.default_rng(args.seed)
    speakers = [make_speaker(rng) for _ in range(args.spk)]

    for subset, n_utts in (("train", args.train_utts), ("eval", args.eval_utts)):
        ddir = os.path.join(args.out, subset)
        wdir = os.path.join(ddir, "wav")
        os.makedirs(wdir, exist_ok=True)
        scp, u2s = [], []
        for s, spk in enumerate(speakers):
            for u in range(n_utts):
                utt = f"spk{s:03d}-{subset}{u:03d}"
                wav = synth_utt(spk, args.dur, rng)
                path = os.path.join(wdir, utt + ".wav")
                write_wav(path, wav, SR)
                scp.append(f"{utt} {path}")
                u2s.append(f"{utt} spk{s:03d}")
        with open(os.path.join(ddir, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(ddir, "utt2spk"), "w") as f:
            f.write("\n".join(u2s) + "\n")

    # all-vs-all eval trials (target iff same speaker)
    eval_utts = [
        f"spk{s:03d}-eval{u:03d}"
        for s in range(args.spk)
        for u in range(args.eval_utts)
    ]
    with open(os.path.join(args.out, "trials"), "w") as f:
        for i, a in enumerate(eval_utts):
            for b in eval_utts[i + 1:]:
                tgt = "target" if a.split("-")[0] == b.split("-")[0] else "nontarget"
                f.write(f"{a} {b} {tgt}\n")
    n_trials = len(eval_utts) * (len(eval_utts) - 1) // 2
    print(f"wrote {args.spk} spk x ({args.train_utts}+{args.eval_utts}) utts, "
          f"{n_trials} trials -> {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""AP-OLR language-identification recipe (parity: recipe/ap-olr2020-baseline
+ recipe/olr2021-baseline).

LID = the same x-vector pipeline with language labels and a softmax (or
margin) head; evaluation is Cavg + EER over language trials, scored either
from the classifier logits or a per-language back-end (LR / GMM) on
embeddings.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--exp", default="exp/olr_xvector")
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--stop-stage", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--chunk-seconds", type=float, default=3.0)
    ap.add_argument("--width", type=int, default=512,
                    help="frame-channel width (shrink for smoke corpora)")
    ap.add_argument("--lr", type=float, default=1e-2)
    args = ap.parse_args()

    import numpy as np

    from asv_subtools_tpu.backend import (
        compute_cavg,
        compute_eer,
        gmm_lid_scores,
        train_diag_gmm,
        train_logistic_regression,
    )
    from asv_subtools_tpu.io import read_vec_flt_scp
    from asv_subtools_tpu.launcher import Launcher

    params = {
        "exp_dir": args.exp,
        "data": {
            "train_wav_scp": os.path.join(args.data, "train", "wav.scp"),
            # utt2lang plays the utt2spk role: labels are languages
            "train_utt2spk": os.path.join(args.data, "train", "utt2lang"),
            "chunk_seconds": args.chunk_seconds,
            "batch_size": args.batch_size,
        },
        "model": {
            "name": "extended_xvector",
            "params": {"num_frame_channels": args.width,
                       "embd_dim": args.width},
        },
        "loss": {"name": "margin_softmax", "params": {"method": "am", "m": 0.2}},
        "train": {
            "epochs": args.epochs,
            "optimizer": {"name": "sgd", "learning_rate": args.lr},
            "lr_schedule": {"name": "warmR", "base_lr": args.lr, "t_0": 20000},
        },
    }

    launcher = Launcher(params)
    egs = launcher.build_egs()
    launcher.build_model()
    if args.stage <= 1 <= args.stop_stage:
        launcher.train(egs)
    if args.stage <= 2 <= args.stop_stage:
        for subset in ("train", "eval"):
            scp = os.path.join(args.data, subset, "wav.scp")
            if os.path.exists(scp):
                launcher.extract(scp, os.path.join(args.exp, f"xvector_{subset}"))
    if args.stage <= 3 <= args.stop_stage:
        # back-end: logistic regression over embeddings -> Cavg/EER
        train_embs = dict(read_vec_flt_scp(os.path.join(args.exp, "xvector_train.scp")))
        eval_embs = dict(read_vec_flt_scp(os.path.join(args.exp, "xvector_eval.scp")))
        u2l_train = dict(
            l.split()[:2] for l in open(os.path.join(args.data, "train", "utt2lang"))
        )
        u2l_eval = dict(
            l.split()[:2] for l in open(os.path.join(args.data, "eval", "utt2lang"))
        )
        langs = sorted(set(u2l_train.values()))
        l2i = {l: i for i, l in enumerate(langs)}
        xk = sorted(train_embs)
        clf = train_logistic_regression(
            np.stack([train_embs[k] for k in xk]),
            np.asarray([l2i[u2l_train[k]] for k in xk]),
        )
        ek = sorted(eval_embs)
        scores = clf.scores(np.stack([eval_embs[k] for k in ek]))
        pairs = []
        for i, k in enumerate(ek):
            true = l2i.get(u2l_eval.get(k, ""), -1)
            for j in range(len(langs)):
                pairs.append((j, true, float(scores[i, j])))
        _, min_cavg = compute_cavg(pairs, len(langs))
        flat = np.asarray([p[2] for p in pairs])
        lab = np.asarray([1 if p[0] == p[1] else 0 for p in pairs])
        eer, _ = compute_eer(flat, lab)
        print({"Cavg": round(min_cavg, 4), "EER%": round(100 * eer, 2)})


if __name__ == "__main__":
    main()

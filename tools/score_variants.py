#!/usr/bin/env python
"""Score one extraction under several back-end configurations.

The reference's README regression tables report each system as rows of
back-end variants (submean cosine / +AS-norm / PLDA..., e.g.
recipe/voxcelebSRC/README.md:8-76). This tool reproduces that table from
one set of extracted embeddings:

  python tools/score_variants.py --exp exp/ecapa --data data --trials trials

Reads {exp}/xvector_train.scp (backend training + cohort) and
{exp}/xvector_eval.scp, prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--trials", required=True)
    ap.add_argument("--cohort", type=int, default=3000)
    ap.add_argument("--top-n", type=int, default=300)
    ap.add_argument("--lda-dim", type=int, default=128)
    args = ap.parse_args()

    from asv_subtools_tpu.backend import ScoreConfig, ScoreSets, Trials
    from asv_subtools_tpu.io import read_vec_flt_scp

    train = dict(read_vec_flt_scp(os.path.join(args.exp, "xvector_train.scp")))
    evals = dict(read_vec_flt_scp(os.path.join(args.exp, "xvector_eval.scp")))
    u2s = dict(
        line.split()[:2]
        for line in open(os.path.join(args.data, "train", "utt2spk"))
    )
    keys = sorted(train)
    x = np.stack([train[k] for k in keys])
    spk_ids = np.asarray([u2s.get(k, k) for k in keys])
    trials = Trials.read(args.trials)
    cohort = x[: args.cohort]

    configs = [
        ("submean cosine", ScoreConfig(process="submean-norm",
                                       classifier="cosine")),
        ("submean cosine + AS-norm",
         ScoreConfig(process="submean-norm", classifier="cosine",
                     score_norm="asnorm", top_n=args.top_n)),
        ("submean PLDA",
         ScoreConfig(process="submean-norm", classifier="plda")),
        ("LDA-submean PLDA",
         ScoreConfig(process="lda-submean-norm", classifier="plda",
                     lda_dim=args.lda_dim)),
    ]
    rows = []
    for name, cfg in configs:
        pipe = ScoreSets(cfg).fit(x, spk_ids)
        out = pipe.run(
            evals, evals, trials,
            cohort=cohort if cfg.score_norm else None,
        )
        row = {"config": name,
               "eer_percent": round(100 * out["eer"], 3),
               "min_dcf": round(out.get("min_dcf", float("nan")), 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Vox2-scale data-plane smoke (VERDICT r4 missing #4).

The reference trains on 1,092,009 utterances
(/root/reference/recipe/voxcelebSRC/runVoxcelebSRC.sh:12-15: VoxCeleb2
dev, 5,994 speakers). This script synthesizes a datadir at exactly that
scale — 5,994 speakers x 182 utts = 1,090,908 utterances whose feats.scp
rows point (at real byte offsets) into one small shared feature ark — and
drives every host-side data-plane stage a real run needs:

    datadir_load   DataDir.read of 4 tables x 1.09M lines
    filter         split_by_length + valid_split (the recipe's filters)
    chunk_table    ChunkSamples speaker_balance sample + egs CSV write
    csv_reload     read_chunk_csv (what every loader worker does)
    epoch_slice    ChunkEgs: 200 real batches (B=64) of seek+row-range
                   ark reads through io.kaldi
    scp_fanout     DataDir.split(nj=32) extraction manifest fan-out

and records wall seconds per stage + peak RSS. Run:

    python tools/scale_bench.py [--spk 5994] [--utts-per-spk 182]

Prints one JSON line (the PERF.md row). tests/test_data_scale.py runs
the same harness (smaller by default, full scale with SCALE_FULL=1).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def synth_datadir(path: str, n_spk: int, utts_per_spk: int,
                  n_ark_mats: int = 64, max_frames: int = 1000,
                  min_frames: int = 200, feat_dim: int = 40,
                  seed: int = 0) -> None:
    """Write a datadir whose 1M feats.scp rows share n_ark_mats REAL
    matrices in one ark (real byte offsets -> epoch reads are honest
    seek+decode work) without a terabyte of disk."""
    from asv_subtools_tpu.io.kaldi import ArkScpWriter

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    ark = os.path.join(path, "feat.ark")
    rxfiles = []
    with ArkScpWriter(ark, os.path.join(path, "feat_pool.scp")) as w:
        for i in range(n_ark_mats):
            w.write(f"pool{i}", rng.normal(
                size=(max_frames, feat_dim)).astype(np.float32))
    with open(os.path.join(path, "feat_pool.scp")) as f:
        rxfiles = [line.split(None, 1)[1].strip() for line in f]

    frames = rng.integers(min_frames, max_frames + 1,
                          size=n_spk * utts_per_spk)
    with open(os.path.join(path, "feats.scp"), "w") as f_scp, \
         open(os.path.join(path, "wav.scp"), "w") as f_wav, \
         open(os.path.join(path, "utt2spk"), "w") as f_u2s, \
         open(os.path.join(path, "utt2num_frames"), "w") as f_u2f:
        i = 0
        for s in range(n_spk):
            spk = f"id{s:05d}"
            for u in range(utts_per_spk):
                utt = f"{spk}-u{u:04d}"
                f_scp.write(f"{utt} {rxfiles[i % n_ark_mats]}\n")
                f_wav.write(f"{utt} /fake/{spk}/{utt}.wav\n")
                f_u2s.write(f"{utt} {spk}\n")
                f_u2f.write(f"{utt} {frames[i]}\n")
                i += 1
    with open(os.path.join(path, "spk2utt"), "w") as f:
        for s in range(n_spk):
            spk = f"id{s:05d}"
            utts = " ".join(f"{spk}-u{u:04d}" for u in range(utts_per_spk))
            f.write(f"{spk} {utts}\n")


def run(n_spk: int, utts_per_spk: int, workdir: str,
        chunk_size: int = 200, batch_size: int = 64,
        slice_batches: int = 200, nj: int = 32) -> dict:
    from asv_subtools_tpu.data.egs_offline import (
        ChunkEgs,
        ChunkSamples,
        read_chunk_csv,
    )
    from asv_subtools_tpu.datadir import DataDir

    dd_path = os.path.join(workdir, "data")
    t0 = time.time()
    synth_datadir(dd_path, n_spk, utts_per_spk)
    stages = {"synth(untimed)": round(time.time() - t0, 2)}

    t0 = time.time()
    dd = DataDir.read(dd_path)
    stages["datadir_load"] = round(time.time() - t0, 2)
    n_utts = len(dd)
    assert n_utts == n_spk * utts_per_spk, n_utts

    t0 = time.time()
    short, long_ = dd.split_by_length(chunk_size + 50)
    train, valid = long_.valid_split(num_utts=1024)
    stages["filter"] = round(time.time() - t0, 2)
    assert len(short) + len(long_) == n_utts
    assert len(train) + len(valid) == len(long_)

    t0 = time.time()
    sampler = ChunkSamples(train, chunk_size=chunk_size,
                           chunk_type="speaker_balance")
    chunks = sampler.sample()
    csv_path = os.path.join(workdir, "train.egs.csv")
    sampler.write_csv(csv_path, chunks)
    stages["chunk_table"] = round(time.time() - t0, 2)
    n_chunks = len(chunks)

    t0 = time.time()
    chunks2 = read_chunk_csv(csv_path)
    stages["csv_reload"] = round(time.time() - t0, 2)
    assert len(chunks2) == n_chunks

    t0 = time.time()
    egs = ChunkEgs(chunks2, batch_size=batch_size)
    it = iter(egs)
    done = 0
    for batch in it:
        assert batch["x"].shape == (batch_size, chunk_size, 40)
        done += 1
        if done >= slice_batches:
            break
    dt = time.time() - t0
    stages["epoch_slice"] = round(dt, 2)
    chunks_per_s = round(done * batch_size / dt, 1)

    t0 = time.time()
    parts = dd.split(nj)
    stages["scp_fanout"] = round(time.time() - t0, 2)
    assert sum(len(p) for p in parts) == n_utts

    out = {
        "metric": "data_plane_scale",
        "utts": n_utts,
        "speakers": n_spk,
        "chunks": n_chunks,
        "egs_csv_mb": round(os.path.getsize(csv_path) / 1e6, 1),
        "stages_s": stages,
        "epoch_read_chunks_per_s": chunks_per_s,
        "peak_rss_gb": round(rss_gb(), 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--spk", type=int, default=5994)
    ap.add_argument("--utts-per-spk", type=int, default=182)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    if args.workdir:
        os.makedirs(args.workdir, exist_ok=True)
        run(args.spk, args.utts_per_spk, args.workdir)
    else:
        with tempfile.TemporaryDirectory() as td:
            run(args.spk, args.utts_per_spk, td)

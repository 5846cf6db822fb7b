#!/usr/bin/env python
"""Host egs-pipeline throughput: can the loader feed the train step?

The train step consumes a B=128 x 2 s batch every ~19 ms (PERF.md), i.e.
~52 batches/s ≈ 13.4k audio-s/s of prepared chunks. The reference feeds
its GPUs with multi-worker DataLoaders (egs_online.py DataLoader
num_workers); our loader is WavEgs + ParallelMapper threads (numpy/scipy
stages release the GIL). This tool measures delivered batches/s through
the FULL online pipeline — wav decode -> speed perturb -> random chunk ->
noise/babble/reverb aug -> shuffle -> batch -> pad — on a synthetic
disk-backed corpus, for several worker counts, and reports the margin
vs the train step's demand.

Usage: python tools/egs_bench.py [--utts 1024] [--batches 48]
Prints one JSON line per worker count.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


SR = 16000


def build_corpus(root: str, n_utts: int, n_spk: int, dur_s: float,
                 seed: int = 0) -> None:
    from asv_subtools_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    scp, u2s = [], []
    for i in range(n_utts):
        utt = f"spk{i % n_spk:03d}-u{i:05d}"
        path = os.path.join(root, "wav", utt + ".wav")
        if not os.path.exists(path):
            wav = (rng.normal(size=int(SR * dur_s)) * 3000).astype(np.float32)
            write_wav(path, wav, SR)
        scp.append(f"{utt} {path}")
        u2s.append(f"{utt} spk{i % n_spk:03d}")
    open(os.path.join(root, "wav.scp"), "w").write("\n".join(scp) + "\n")
    open(os.path.join(root, "utt2spk"), "w").write("\n".join(u2s) + "\n")

    # noise + RIR corpora for the aug manifests
    for sub, n, dur in (("noise", 24, 4.0), ("rir", 8, 0.3)):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            p = os.path.join(d, f"{sub}{i:02d}.wav")
            if os.path.exists(p):
                continue
            if sub == "rir":
                t = np.arange(int(SR * dur))
                w = rng.normal(size=len(t)) * np.exp(-t / (0.05 * SR))
                w[0] = 1.0
            else:
                w = rng.normal(size=int(SR * dur))
            write_wav(p, (w * 8000).astype(np.float32), SR)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/egs_bench_data")
    ap.add_argument("--utts", type=int, default=1024)
    ap.add_argument("--spk", type=int, default=64)
    ap.add_argument("--dur", type=float, default=3.0)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=48)
    ap.add_argument("--workers", default="1,4,8")
    args = ap.parse_args()

    from asv_subtools_tpu.data.augment import (
        AddBabble,
        AddNoise,
        AddReverb,
        NoiseManifest,
        SpeechAug,
        prepare_speechaug_csv,
    )
    from asv_subtools_tpu.data.dataset import WavEgs

    build_corpus(args.root, args.utts, args.spk, args.dur)
    noise_csv = os.path.join(args.root, "noise.csv")
    rir_csv = os.path.join(args.root, "rir.csv")
    prepare_speechaug_csv(os.path.join(args.root, "noise"), noise_csv)
    prepare_speechaug_csv(os.path.join(args.root, "rir"), rir_csv)
    noise_m = NoiseManifest.from_csv(noise_csv)
    rir_m = NoiseManifest.from_csv(rir_csv)

    chunk_s = 2.015
    demand_batches_s = 1000.0 / 18.8  # C1024 train step, PERF.md

    def make_egs(worker_id=0, num_workers=1, thread_workers=1):
        aug = SpeechAug(
            [AddNoise(noise_m), AddBabble(noise_m), AddReverb(rir_m)],
            mode="random", clean_prob=0.25,
        )
        return WavEgs(
            os.path.join(args.root, "wav.scp"),
            os.path.join(args.root, "utt2spk"),
            {f"spk{i:03d}": i for i in range(args.spk)},
            chunk_seconds=chunk_s,
            batch_size=args.batch,
            speed_perturb=True,
            num_spks=args.spk,
            aug=aug,
            rank=worker_id,
            world_size=num_workers,
            workers=thread_workers,
        )

    def bench(label, loader, n_batches):
        it = iter(loader)
        next(it)  # warm
        t0 = time.perf_counter()
        done, epoch = 0, 0
        while done < n_batches:
            for _ in it:
                done += 1
                if done >= n_batches:
                    break
            else:
                epoch += 1
                loader.set_epoch(epoch)
                it = iter(loader)
        dt = time.perf_counter() - t0
        bps = done / dt
        row = {
            "loader": label,
            "batches_per_s": round(bps, 2),
            "utts_per_s": round(bps * args.batch, 0),
            "audio_s_per_s": round(bps * args.batch * chunk_s, 0),
            "x_train_step_demand": round(bps / demand_batches_s, 2),
        }
        print(json.dumps(row), flush=True)

    for w in [int(x) for x in args.workers.split(",")]:
        if w <= 1:
            bench("threads-1", make_egs(), args.batches)
        else:
            bench(f"threads-{w}",
                  make_egs(thread_workers=w), args.batches)
            from asv_subtools_tpu.data import MultiprocessLoader

            # fork context: this tool is a numpy-only parent (no jax), so
            # the cheap start method is safe and closures are allowed
            loader = MultiprocessLoader(make_egs, num_workers=w,
                                        context="fork")
            bench(f"procs-{w}", loader, args.batches)
            loader.close()

    # FEATURE-mode rows (aug + 80-bin fbank on the host): where
    # data.feat_backend="native" (C++ frontend via ctypes) pays — the r4
    # per-core stage measurement is 4.3x; this measures the whole chain
    from asv_subtools_tpu.features import FbankOptions, MelOptions

    w = max(int(x) for x in args.workers.split(","))
    if w > 1:
        for backend in ("numpy", "native"):
            def make_feg(worker_id=0, num_workers=1, _b=backend):
                aug = SpeechAug(
                    [AddNoise(noise_m), AddBabble(noise_m), AddReverb(rir_m)],
                    mode="random", clean_prob=0.25,
                )
                return WavEgs(
                    os.path.join(args.root, "wav.scp"),
                    os.path.join(args.root, "utt2spk"),
                    {f"spk{i:03d}": i for i in range(args.spk)},
                    chunk_seconds=chunk_s,
                    batch_size=args.batch,
                    speed_perturb=True,
                    num_spks=args.spk,
                    aug=aug,
                    compute_feat=True,
                    feat_opts=FbankOptions(mel_opts=MelOptions(num_bins=80)),
                    feat_backend=_b,
                    rank=worker_id,
                    world_size=num_workers,
                )

            from asv_subtools_tpu.data import MultiprocessLoader

            loader = MultiprocessLoader(make_feg, num_workers=w,
                                        context="fork")
            bench(f"procs-{w}-feat-{backend}", loader, args.batches)
            loader.close()


if __name__ == "__main__":
    main()

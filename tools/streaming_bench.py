#!/usr/bin/env python
"""Concurrent streaming-serve benchmark (VERDICT r4 missing #5).

The reference serves one FeaturePipeline + extract thread PER STREAM
(/root/reference/runtime/frontend/feature_pipeline.h consumed by
torch_asv_extractor.cc:71-122). Our native extractor implements the same
model behind `--streaming --streams N` (asv_extractor_main.cc): N worker
threads each own a FeaturePipeline, the single PJRT executor is shared.
This driver measures aggregate audio-s/s and p50/p95 finalize latency as
a function of N on the real chip.

Stages (so the chip-free prep can run while the chip is busy):
  python tools/streaming_bench.py --prep            # wavs + bundles (CPU)
  python tools/streaming_bench.py --run             # drives the binary
Results land as a markdown table on stdout; paste into runtime/README.md.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "recipes"))

WORK = "/tmp/stream_bench"
SR = 16000


def prep(n_utts: int, dur_s: float) -> None:
    # Pin this process to CPU BEFORE any device use: bundle lowering via
    # jax.export is chip-free, and the chip may be busy with another job.
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from quality_gate import make_speaker, synth_utt

    from asv_subtools_tpu.export import export_pjrt_embed_bundles
    from asv_subtools_tpu.io.wav import write_wav
    from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet

    wav_dir = os.path.join(WORK, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(WORK, "wav.scp"), "w") as f:
        for i in range(n_utts):
            spk = make_speaker(np.random.default_rng(i % 8))
            wav = synth_utt(spk, dur_s, rng)
            path = os.path.join(wav_dir, f"u{i:04d}.wav")
            write_wav(path, wav, SR)
            f.write(f"u{i:04d} {path}\n")

    net = SpeakerNet(
        backbone=EcapaTdnn(channels=1024, embd_dim=192),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2},
        num_targets=32,
    )
    feat_dim = 80
    x0 = jnp.zeros((1, 64, feat_dim), jnp.float32)
    variables = net.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
        mask=jnp.ones((1, 64), bool), train=False,
    )
    export_pjrt_embed_bundles(
        net, variables, feat_dim, os.path.join(WORK, "bundles"),
        bucket_lengths=(200, 400, 800), compute_dtype=jnp.bfloat16,
        platform="tpu", batch=1,
    )
    print("prep done:", WORK)


def run(streams_list, block_ms: int, timeout_s: int) -> None:
    binary = os.path.join(ROOT, "runtime", "build", "asv_extractor_main")
    rows = []
    for n in streams_list:
        cmd = [
            binary, "--wav_scp", os.path.join(WORK, "wav.scp"),
            "--pjrt_plugin", "/opt/axon/libaxon_pjrt.so",
            "--pjrt_bundles", os.path.join(WORK, "bundles"),
            "--pjrt_axon", "--pjrt_warmup", "--streaming",
            "--block_ms", str(block_ms), "--streams", str(n),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s)
        m = re.search(
            r"STREAMING streams=(\d+) block_ms=(\d+)"
            r" agg_audio_s_per_s=([\d.]+) mean_finalize_ms=([\d.]+)"
            r" p50_finalize_ms=([\d.]+) p95_finalize_ms=([\d.]+)",
            out.stdout,
        )
        if not m:
            print(f"streams={n} FAILED\n--- stdout:\n{out.stdout[-2000:]}"
                  f"\n--- stderr:\n{out.stderr[-2000:]}")
            sys.exit(2)
        rows.append((n, float(m.group(3)), float(m.group(4)),
                     float(m.group(5)), float(m.group(6))))
        print(f"streams={n} agg={rows[-1][1]:.0f} audio-s/s "
              f"p50={rows[-1][3]:.1f} ms p95={rows[-1][4]:.1f} ms",
              flush=True)

    print("\n| streams | agg audio-s/s | mean finalize (ms) |"
          " p50 (ms) | p95 (ms) |")
    print("|---|---|---|---|---|")
    for n, agg, mean, p50, p95 in rows:
        print(f"| {n} | {agg:.0f} | {mean:.1f} | {p50:.1f} | {p95:.1f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--utts", type=int, default=64)
    ap.add_argument("--dur", type=float, default=3.0)
    ap.add_argument("--block_ms", type=int, default=200)
    ap.add_argument("--streams", default="1,2,4,8")
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    if args.prep:
        prep(args.utts, args.dur)
    if args.run:
        run([int(s) for s in args.streams.split(",")], args.block_ms,
            args.timeout)


if __name__ == "__main__":
    main()

"""Benchmark: embedding-extraction throughput (audio-seconds/s/chip).

Runs the full on-device pipeline — Kaldi-compatible fbank (GEMM DFT on the
MXU) + CMVN + ECAPA-TDNN C1024 embedding — on batches of 10 s utterances,
and reports steady-state audio-seconds processed per wall-clock second on
one chip.

Baseline anchor: the reference's only published speed number for this model
is the LibTorch C++ runtime RTF of 0.071 for ECAPA C1024 on one Xeon
thread (recipe/voxcelebSRC/README.md:51-57) = 14.08 audio-s/s.
`vs_baseline` = our audio-s/s per chip / 14.08.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from asv_subtools_tpu.features import FbankOptions, cmvn_utterance
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank
    from asv_subtools_tpu.models import EcapaTdnn

    sample_rate = 16000
    utt_seconds = 10.0
    batch = 128
    samples = int(sample_rate * utt_seconds)

    model = EcapaTdnn(channels=1024, embd_dim=192)
    opts = FbankOptions()
    rng = jax.random.PRNGKey(0)

    wave_np = np.random.default_rng(0).normal(size=(batch, samples)) * 1000.0
    wave = jnp.asarray(wave_np, jnp.float32)

    feats0, _ = fused_fbank(wave[:1], opts)
    variables = model.init({"params": rng}, feats0, train=False)
    # bf16 weights: serving configuration (embedding cosine vs f32 = 0.99999)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    @jax.jit
    def extract(w):
        f, _energy = fused_fbank(w, opts)  # fused Pallas framing+DFT+mel
        f = cmvn_utterance(f).astype(jnp.bfloat16)
        return model.apply(variables, f, train=False)

    # warmup / compile
    out = extract(wave)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(wave)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * utt_seconds
    throughput = audio_seconds / dt  # audio-s per wall-s per chip
    baseline = 1.0 / 0.071  # reference C++ runtime, 1 CPU thread
    print(
        json.dumps(
            {
                "metric": "ecapa_c1024_extract_throughput",
                "value": round(throughput, 1),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(throughput / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

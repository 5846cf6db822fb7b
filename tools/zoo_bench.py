#!/usr/bin/env python
"""Extraction throughput across the model zoo (one v5e chip).

The reference publishes single-threaded CPU RTFs for its runtime across
ResNet34/ECAPA/Conformer (recipe/voxcelebSRC/README.md:51-57) — this is
the same measurement for the TPU stack: raw wave -> fused Pallas fbank
(bf16 DFT) -> CMVN -> bf16 backbone embedding, B=128 x 10 s utterances,
salted-scan + device_get differential timing (see tools/roofline.py for
why the protocol matters on the axon relay).

Run on the real chip: `python tools/zoo_bench.py`. Rows land in
PERF_zoo.json; summarized in PERF.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from roofline import _timed_scan  # noqa: E402  (tools/ sibling)


def bench_model(name, model, wave, opts, audio_s, ref_rtf=None):
    from asv_subtools_tpu.features import cmvn_utterance
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    rng = jax.random.PRNGKey(0)
    feats0, _ = fused_fbank(wave[:1], opts, dft_dtype=jnp.bfloat16)
    variables = model.init({"params": rng}, feats0, train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables)
    )

    def extract(salt, w):
        f, _ = fused_fbank(w * (1.0 + 1e-6 * salt), opts, with_energy=False,
                           dft_dtype=jnp.bfloat16)
        f = cmvn_utterance(f).astype(jnp.bfloat16)
        return model.apply(variables, f, train=False)

    t1 = _timed_scan(extract, (wave,), 8)
    t2 = _timed_scan(extract, (wave,), 16)
    dt = max(t2 - t1, 1e-9) / 8
    rtf = dt / audio_s
    row = {
        "model": name,
        "params_m": round(n_params / 1e6, 2),
        "ms_per_batch": round(dt * 1e3, 3),
        "audio_s_per_s": round(audio_s / dt, 0),
        "rtf": float(f"{rtf:.3g}"),
    }
    if ref_rtf is not None:
        row["ref_cpu_rtf"] = ref_rtf
        row["speedup_vs_ref_runtime"] = round(ref_rtf / rtf, 0)
    print(json.dumps(row), flush=True)
    return row


def main():
    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.models import EcapaLawlict, EcapaTdnn
    from asv_subtools_tpu.models.xvector import (
        ExtendedXvector,
        FactoredXvector,
        SnowdarXvector,
    )
    from asv_subtools_tpu.models.conformer import ConformerXvector
    from asv_subtools_tpu.models.resnet_xvector import (
        RepVggXvector,
        ResNetXvector,
    )

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    sr, utt_s, batch = 16000, 10.0, 128
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, int(sr * utt_s))) * 1000.0,
        jnp.float32,
    )
    opts = FbankOptions()
    audio_s = batch * utt_s

    rows = [
        # reference CPU RTF anchors: recipe/voxcelebSRC/README.md:51-57
        bench_model("ecapa_c1024", EcapaTdnn(channels=1024, embd_dim=192),
                    wave, opts, audio_s, ref_rtf=0.071),
        bench_model("ecapa_c512", EcapaTdnn(channels=512, embd_dim=192),
                    wave, opts, audio_s, ref_rtf=0.030),
        bench_model("resnet34_base32", ResNetXvector(embd_dim=512),
                    wave, opts, audio_s, ref_rtf=0.090),
        bench_model(
            "conformer_6l_256d_4h_4sub",
            ConformerXvector(num_blocks=6, attention_dim=256,
                             attention_heads=4, input_layer="conv2d"),
            wave, opts, audio_s, ref_rtf=0.025,
        ),
        bench_model("repvgg_b32_deploy",
                    RepVggXvector(base_channels=32, deploy=True),
                    wave, opts, audio_s),
        bench_model("ecapa_lawlict_c512", EcapaLawlict(channels=512,
                                                       embd_dim=192),
                    wave, opts, audio_s),
        bench_model("snowdar_xvector", SnowdarXvector(), wave, opts, audio_s),
        bench_model("extended_xvector", ExtendedXvector(), wave, opts,
                    audio_s),
        bench_model("factored_xvector", FactoredXvector(), wave, opts,
                    audio_s),
        bench_model("xi_vector",
                    SnowdarXvector(pooling="xi"),
                    wave, opts, audio_s),
    ]
    with open("PERF_zoo.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

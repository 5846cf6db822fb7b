"""Embedding-extraction service: batched whole-utterance x-vectors.

Parity: pytorch/pipeline/onestep/extract_embeddings{,_online}.py + the
chunked `for_extract_embedding` logic (libs/nnet/framework.py:12-55) and
the C++ runtime loop (runtime/bin/extractor_main.cc).

TPU-first redesign (the throughput north star, SURVEY.md §7):
* The reference extracts batch=1 utterance at a time. Here utterances are
  length-bucketed and padded to a handful of static shapes, so the chip
  sees large masked batches and jit compiles once per bucket.
* Utterances longer than `max_chunk` frames are split into equal chunks
  (reference maxChunk semantics); chunk embeddings are frame-weighted
  averaged. Chunks ride the same bucketed batches as short utterances.
* The host pipeline (wav decode + feature) runs in a background prefetch
  thread, overlapping with device compute.

Output: in-memory dict and/or Kaldi ark/scp via io.kaldi.ArkScpWriter
(drop-in for the reference's xvector.scp consumers).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .io.kaldi import ArkScpWriter


@dataclasses.dataclass
class ExtractConfig:
    buckets: Sequence[int] = (200, 400, 800, 1600, 3200, 6400, 10000)
    batch_sizes: Optional[Dict[int, int]] = None  # per-bucket batch size
    max_chunk: int = 10000
    default_batch: int = 32


# waveform-mode buckets (samples @16 kHz): 2s .. 100s
WAVE_BUCKETS = (32000, 64000, 128000, 256000, 512000, 1024000, 1600000)


def make_wave_embed_fn(model_apply, fbank_opts=None, dtype=None):
    """Build embed_fn(wave [B, S], mask [B, S]) -> [B, E]: fused Pallas
    fbank + CMVN + model, ALL on device.

    Measured pipeline rates (v5e): host CPU features cap the old path at
    ~1k audio-s/s; plain wav decode runs at ~98k audio-s/s per host
    thread, and the on-device path does 39k audio-s/s — so wave-in
    extraction keeps the chip the bottleneck. (In this dev environment the
    axon tunnel's H2D dominates instead; on real PCIe/ICI hosts it does
    not.)"""
    import jax.numpy as jnp

    from .features import FbankOptions, cmvn_utterance
    from .features.pallas_fbank import fused_fbank

    opts = fbank_opts or FbankOptions()
    shift, win = opts.frame_opts.window_shift, opts.frame_opts.window_size

    def embed(wave, mask):
        # bf16 DFT GEMMs: 1.7x faster front-end; embedding cosine vs the
        # f32 front-end >= 0.999999 on real speech (silent-bin leakage is
        # below the bf16 backbone's own rounding after CMVN)
        feats, _ = fused_fbank(wave, opts, dft_dtype=jnp.bfloat16,
                               with_energy=False)
        n_samples = jnp.sum(mask, axis=1)
        n_frames = jnp.maximum((n_samples - win) // shift + 1, 1)
        t = feats.shape[1]
        fmask = jnp.arange(t)[None, :] < n_frames[:, None]
        feats = cmvn_utterance(feats, mask=fmask)
        # zero the padded region: fbank of padding is log(eps), not zero —
        # zeroing matches feature-mode bucketing (and conv zero-padding)
        feats = feats * fmask[..., None]
        if dtype is not None:
            feats = feats.astype(dtype)
        return model_apply(feats, fmask)

    return embed


def _bucket_for(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def _chunk(feats: np.ndarray, max_chunk: int) -> Tuple[List[np.ndarray], List[float]]:
    """Equal-chunk split + frame weights (framework.py:27-52 semantics)."""
    t = feats.shape[0]
    if t <= max_chunk:
        return [feats], [1.0]
    num_split = -(-t // max_chunk)
    length = t // num_split
    chunks = [feats[i * length : (i + 1) * length] for i in range(num_split)]
    weights = [float(length)] * num_split
    remainder = t - num_split * length
    if remainder > 0:
        chunks.append(feats[t - length :])
        weights.append(float(remainder))
    s = sum(weights)
    return chunks, [w / s for w in weights]


class Extractor:
    """Batched bucketed embedding extractor.

    embed_fn(x [B, T, D], mask [B, T]) -> [B, embd] — typically
    `lambda x, m: model.apply(vars, x, mask=m, train=False)`, jit-wrapped
    here once per bucket shape.
    """

    def __init__(self, embed_fn: Callable, config: ExtractConfig = ExtractConfig()):
        self.config = config
        self._embed = jax.jit(embed_fn)
        self._stats = {"utts": 0, "frames": 0, "batches": 0, "device_s": 0.0}

    def extract_iter(
        self, items: Iterable[Tuple[str, np.ndarray]]
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """items: (key, feats [T, D]). Yields (key, embedding) in completion
        order (bucketed batches flush when full; tail flushes at the end)."""
        cfg = self.config
        pending: Dict[int, List] = {b: [] for b in cfg.buckets}
        # per-utterance accumulation for chunked long utts
        acc: Dict[str, List] = {}
        expected: Dict[str, int] = {}

        def flush(bucket: int):
            batch = pending[bucket]
            if not batch:
                return []
            keys = [k for k, _, _ in batch]
            weights = [w for _, _, w in batch]
            feats = [f for _, f, _ in batch]
            lens = np.asarray([f.shape[0] for f in feats])
            if feats[0].ndim == 1:  # waveform mode: [S] items
                x = np.zeros((len(feats), bucket), np.float32)
                for i, f in enumerate(feats):
                    x[i, : f.shape[0]] = f
            else:
                d = feats[0].shape[1]
                x = np.zeros((len(feats), bucket, d), np.float32)
                for i, f in enumerate(feats):
                    x[i, : f.shape[0]] = f
            mask = np.arange(bucket)[None, :] < lens[:, None]
            t0 = time.perf_counter()
            embs = self._embed(jnp.asarray(x), jnp.asarray(mask))
            embs = np.asarray(jax.device_get(embs))
            self._stats["device_s"] += time.perf_counter() - t0
            self._stats["batches"] += 1
            self._stats["frames"] += int(lens.sum())
            pending[bucket] = []
            out = []
            for key, w, e in zip(keys, weights, embs):
                acc.setdefault(key, []).append(w * e)
                if len(acc[key]) == expected[key]:
                    out.append((key, np.sum(acc.pop(key), axis=0)))
                    expected.pop(key)
                    self._stats["utts"] += 1
            return out

        batch_size = lambda b: (
            (cfg.batch_sizes or {}).get(b, cfg.default_batch)
        )

        for key, feats in items:
            chunks, weights = _chunk(np.asarray(feats, np.float32), cfg.max_chunk)
            expected[key] = len(chunks)
            for c, w in zip(chunks, weights):
                b = _bucket_for(c.shape[0], cfg.buckets)
                pending[b].append((key, c, w))
                if len(pending[b]) >= batch_size(b):
                    yield from flush(b)
        for b in cfg.buckets:
            yield from flush(b)

    def extract_to_ark(
        self,
        items: Iterable[Tuple[str, np.ndarray]],
        ark_path: str,
        scp_path: Optional[str] = None,
    ) -> Dict:
        """Extract all and write Kaldi vec ark/scp; returns stats."""
        t0 = time.perf_counter()
        with ArkScpWriter(ark_path, scp_path, matrix=False) as w:
            for key, emb in self.extract_iter(items):
                w.write(key, emb)
        wall = time.perf_counter() - t0
        s = dict(self._stats)
        s["wall_s"] = wall
        return s

    def extract_all(self, items) -> Dict[str, np.ndarray]:
        return dict(self.extract_iter(items))

    @property
    def stats(self) -> Dict:
        return dict(self._stats)

"""Dataset assembly + distributed sharding + background prefetch.

Parity: pytorch/libs/egs/egs_online.py (WavEgs pipeline assembly :153-237,
DistributedSampler rank/worker modulo split :67-117, set_epoch reshuffle
:125-128) and libs/support/prefetch_generator.py.

TPU-first: the pipeline runs on host threads; batches are handed to the
device loop which overlaps H2D with compute (the driver of the ≥3x
extraction-throughput target, SURVEY.md §7).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from .augment import SpeechAug
from . import processor as P


class DistributedShardList:
    """Deterministic per-host split of a source list with per-epoch
    reshuffle (egs_online.py:67-128)."""

    def __init__(
        self,
        items: Sequence,
        shuffle: bool = True,
        seed: int = 1024,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.items = list(items)
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        idx = np.arange(len(self.items))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        for i in idx[self.rank :: self.world_size]:
            item = self.items[int(i)]
            # pipeline stages mutate samples in place (parse_raw decodes
            # into s["wav"], speed_perturb_stage offsets s["label"], ...);
            # hand each epoch a fresh copy or the mutations accumulate
            # across iterations (a second pass re-offsets already-offset
            # labels beyond num_targets -> on TPU the out-of-bounds CE
            # gather is NaN and every step gets skip_nonfinite'd)
            yield dict(item) if isinstance(item, dict) else item


class WavEgs:
    """Training egs: wav source -> aug -> chunk -> batch pipeline.

    Assembly parity: WavEgs (egs_online.py:153-237). Returns batches
    {"x": [B, T] waveforms or [B, T, D] feats, "y", "mask"}.
    """

    def __init__(
        self,
        wav_scp: str,
        utt2spk: str,
        spk2int: Optional[Dict] = None,
        *,
        chunk_seconds: float = 2.015,
        batch_size: int = 64,
        speed_perturb: bool = False,
        num_spks: int = 0,
        aug: Optional[SpeechAug] = None,
        compute_feat: bool = False,
        feat_opts=None,
        spec_aug: bool = False,
        shuffle_buffer: int = 1000,
        seed: int = 1024,
        rank: int = 0,
        world_size: int = 1,
        drop_last: bool = True,
        workers: int = 1,
    ):
        entries = list(P.wav_scp_source(wav_scp, utt2spk, spk2int))
        self.workers = int(workers)
        self.shards = DistributedShardList(
            entries, seed=seed, rank=rank, world_size=world_size
        )
        self.epoch_state = P.EpochState()
        ep = self.epoch_state
        stages: List[Callable] = [P.parse_raw, P.resample()]
        if speed_perturb:
            stages.append(
                P.speed_perturb_stage(
                    expand_labels=True, num_spks=num_spks, seed=seed, epoch=ep
                )
            )
        stages.append(P.random_chunk(chunk_seconds, seed=seed, epoch=ep))
        if aug is not None:
            stages.append(P.speech_aug_stage(aug, seed=seed, epoch=ep))
        key = "wav"
        if compute_feat:
            stages.append(P.compute_feats(feat_opts))
            key = "feat"
            if spec_aug:
                stages.append(P.spec_aug_stage(seed=seed, epoch=ep))
        # per-sample stages (decode/aug/feats — numpy/scipy, GIL-releasing)
        # can fan out over a thread pool; batching stays serial
        self.sample_stages = stages
        self.batch_stages = [
            P.shuffle(shuffle_buffer, seed=seed, epoch=ep),
            P.static_batch(batch_size, drop_last=drop_last),
            P.pad_batch(key=key),
        ]
        self.stages = stages + self.batch_stages

    def set_epoch(self, epoch: int) -> None:
        self.shards.set_epoch(epoch)
        self.epoch_state.epoch = epoch

    def _process_one(self, entry):
        # a stage may emit 0 (skip) or >1 samples; return the list
        return list(P.Pipeline([entry], self.sample_stages)) or None

    def __iter__(self):
        if self.workers > 1:
            # map each entry through the per-sample chain in parallel
            # (ordered, so epoch determinism is preserved), then batch
            mapped = ParallelMapper(
                self._process_one, self.shards, workers=self.workers
            )
            it = (s for group in mapped for s in group)
            for stage in self.batch_stages:
                it = stage(it)
            return it
        return iter(P.Pipeline(self.shards, self.stages))


class WavEgsXvector:
    """Extraction egs: per-utterance whole features, no chunking/aug
    (egs_online.py:239-260). With workers>1 the decode+feature work runs
    in an ordered thread pool (ParallelMapper) so the host keeps the chip
    fed during batched extraction."""

    def __init__(
        self,
        wav_scp: str,
        *,
        de_silence: bool = False,
        feat_opts=None,
        workers: int = 1,
    ):
        self.entries = list(P.wav_scp_source(wav_scp))
        self.workers = workers
        stages: List[Callable] = [P.parse_raw, P.resample()]
        if de_silence:
            stages.append(P.de_sil())
        stages.append(P.compute_feats(feat_opts))
        self.stages = stages

    def _process_one(self, entry):
        out = list(P.Pipeline([entry], self.stages))
        if not out:
            return None
        s = out[0]
        return s["key"], s["feat"]

    def __iter__(self):
        if self.workers > 1:
            yield from ParallelMapper(
                self._process_one, self.entries, workers=self.workers
            )
            return
        for s in P.Pipeline(self.entries, self.stages):
            yield s["key"], s["feat"]


class ParallelMapper:
    """Ordered parallel map over an iterable using a thread pool.

    For the host-side hot stages (wav decode, resample, feature compute —
    all numpy/scipy, which release the GIL): a 39k audio-s/s chip needs
    tens of decode cores to stay fed; this keeps utterance order while
    keeping `workers` items in flight.
    """

    def __init__(self, fn: Callable, iterable: Iterable, workers: int = 8,
                 prefetch: int = 32):
        self.fn = fn
        self.iterable = iterable
        self.workers = workers
        self.prefetch = prefetch

    def __iter__(self):
        import concurrent.futures as cf
        from collections import deque

        with cf.ThreadPoolExecutor(max_workers=self.workers) as pool:
            pending: deque = deque()
            it = iter(self.iterable)
            try:
                for _ in range(self.prefetch):
                    pending.append(pool.submit(self.fn, next(it)))
            except StopIteration:
                pass
            while pending:
                result = pending.popleft().result()
                try:
                    pending.append(pool.submit(self.fn, next(it)))
                except StopIteration:
                    pass
                if result is not None:
                    yield result


class Prefetcher:
    """Background-thread prefetch (parity: prefetch_generator.py:42,
    DataLoaderFast egs.py:218-227): overlaps host pipeline work with
    device compute."""

    def __init__(self, iterable: Iterable, max_prefetch: int = 4):
        self.iterable = iterable
        self.max_prefetch = max_prefetch

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.max_prefetch)
        sentinel = object()
        error: List[BaseException] = []

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # propagate into the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if error:
            raise error[0]


def build_spk2int(utt2spk_path: str) -> Dict[str, int]:
    """Speaker -> class-id map, sorted for determinism."""
    spks = set()
    with open(utt2spk_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                spks.add(parts[1])
    return {s: i for i, s in enumerate(sorted(spks))}

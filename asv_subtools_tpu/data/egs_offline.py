"""Offline chunk-egs path: fixed-length chunks over precomputed Kaldi
feature arks (parity: pytorch/libs/egs/{kaldi_dataset,samples,egs}.py +
pipeline/onestep/get_chunk_egs.py).

The reference walks a KaldiDataset, emits a chunk CSV
(utt ark-path start end label), and a map-style ChunkEgs seeks into arks
per item. Same design here: `ChunkSamples` generates the chunk table with
speaker-balanced or sequential sampling; `ChunkEgs` reads ark ranges
(io.kaldi row-range reads) and yields fixed-shape batches.
"""

from __future__ import annotations

import csv
import dataclasses
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..io.kaldi import read_ali, read_mat
from ..datadir import DataDir


@dataclasses.dataclass
class Chunk:
    utt: str
    rxfile: str
    start: int
    end: int  # exclusive
    label: int


class ChunkSamples:
    """Chunk table generation (parity: ChunkSamples.__sample samples.py:23-170).

    chunk_type "speaker_balance": every speaker contributes ~equal chunks
    (short utts repeat-sampled); "sequential": tile every utterance with
    `overlap` fraction.
    """

    def __init__(
        self,
        datadir: DataDir,
        chunk_size: int = 200,
        chunk_type: str = "speaker_balance",
        chunk_num_selection: int = 0,  # 0 = mean chunks/spk, -1 = max, n>0 = n
        overlap: float = 0.1,
        scale: float = 1.5,
        seed: int = 1024,
        spk2int: Optional[Dict[str, int]] = None,
    ):
        self.datadir = datadir
        self.chunk_size = chunk_size
        self.chunk_type = chunk_type
        self.chunk_num_selection = chunk_num_selection
        self.overlap = overlap
        self.scale = scale
        self.seed = seed
        u2s = datadir.utt2spk()
        spks = sorted(set(u2s.values()))
        self.spk2int = spk2int or {s: i for i, s in enumerate(spks)}

    def sample(self) -> List[Chunk]:
        rng = random.Random(self.seed)
        feats = self.datadir.tables.get("feats.scp", {})
        u2f = {
            k: int(v) for k, v in self.datadir.tables.get("utt2num_frames", {}).items()
        }
        u2s = self.datadir.utt2spk()
        cs = self.chunk_size
        chunks: List[Chunk] = []

        def utt_chunks_seq(utt: str) -> List[Tuple[int, int]]:
            n = u2f.get(utt, 0)
            if n < cs:
                return []
            step = max(1, int(cs * (1.0 - self.overlap)))
            out = []
            start = 0
            while start + cs <= n:
                out.append((start, start + cs))
                start += step
            return out

        if self.chunk_type == "sequential":
            for utt in self.datadir.utts:
                if utt not in feats:
                    continue
                for s, e in utt_chunks_seq(utt):
                    chunks.append(
                        Chunk(utt, feats[utt], s, e, self.spk2int[u2s[utt]])
                    )
            return chunks

        if self.chunk_type != "speaker_balance":
            raise ValueError(f"unknown chunk_type {self.chunk_type!r}")

        # speaker_balance: decide a per-speaker chunk budget, then sample
        s2u = self.datadir.spk2utt()
        per_spk_avail = {
            s: sum(max(0, u2f.get(u, 0) // cs) for u in us) for s, us in s2u.items()
        }
        if self.chunk_num_selection > 0:
            budget = self.chunk_num_selection
        elif self.chunk_num_selection == -1:
            budget = max(per_spk_avail.values() or [0])
        else:
            vals = [v for v in per_spk_avail.values() if v > 0]
            budget = int(np.mean(vals) * self.scale) if vals else 0
        for s, us in s2u.items():
            usable = [u for u in us if u in feats and u2f.get(u, 0) >= cs]
            if not usable:
                continue
            for _ in range(max(1, budget)):
                utt = rng.choice(usable)
                n = u2f[utt]
                start = rng.randint(0, n - cs)
                chunks.append(
                    Chunk(utt, feats[utt], start, start + cs, self.spk2int[u2s[utt]])
                )
        rng.shuffle(chunks)
        return chunks

    def write_csv(self, path: str, chunks: Optional[List[Chunk]] = None) -> None:
        chunks = chunks if chunks is not None else self.sample()
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["utt", "rxfile", "start", "end", "label"])
            for c in chunks:
                w.writerow([c.utt, c.rxfile, c.start, c.end, c.label])


def get_info_from_egsdir(
    egsdir: str,
    train_csv_name: Optional[str] = None,
    valid_csv_name: Optional[str] = None,
) -> Tuple[int, int, str, Optional[str]]:
    """Read an egsdir's info files + csv paths.

    Parity: get_info_from_egsdir (pytorch/libs/egs/egs.py:230-247) —
    info/feat_dim + info/num_targets, train.egs.csv, valid.egs.csv
    (None if absent). Returns (feat_dim, num_targets, train_csv, valid_csv).
    """
    info = os.path.join(egsdir, "info")
    if not os.path.isdir(info):
        raise ValueError(f"Expected dir {info} to exist.")
    feat_dim = int(open(os.path.join(info, "feat_dim")).read().split()[0])
    num_targets = int(
        open(os.path.join(info, "num_targets")).read().split()[0]
    )
    train_csv = os.path.join(egsdir, train_csv_name or "train.egs.csv")
    valid_csv = os.path.join(egsdir, valid_csv_name or "valid.egs.csv")
    if not os.path.exists(valid_csv):
        valid_csv = None
    return feat_dim, num_targets, train_csv, valid_csv


def prepare_egs_dir(
    datadir_path: str,
    egs_dir: str,
    *,
    chunk_size: int = 200,
    chunk_type: str = "speaker_balance",
    chunk_num_selection: int = 0,
    overlap: float = 0.1,
    scale: float = 1.5,
    valid_num_utts: int = 0,
    valid_chunk_num: int = 2,
    seed: int = 1024,
) -> Tuple[int, int]:
    """Generate a chunk-egs dir from a feature datadir.

    Parity: pipeline/onestep/get_chunk_egs.py:31-120 — valid split (held
    out per speaker, keeping >=2 train utts/spk), speaker-balanced or
    sequential chunk sampling for train, sequential chunks for valid
    (--valid-chunk-num), then train.egs.csv / valid.egs.csv +
    info/{feat_dim,num_targets}. The datadir needs feats.scp +
    utt2num_frames + utt2spk. Returns (feat_dim, num_targets).
    """
    dd = DataDir.read(datadir_path)
    spks = sorted(set(dd.utt2spk().values()))
    spk2int = {s: i for i, s in enumerate(spks)}
    os.makedirs(os.path.join(egs_dir, "info"), exist_ok=True)

    valid_dd = None
    if valid_num_utts > 0:
        dd, valid_dd = dd.valid_split(num_utts=valid_num_utts, seed=seed)

    sampler = ChunkSamples(
        dd,
        chunk_size=chunk_size,
        chunk_type=chunk_type,
        chunk_num_selection=chunk_num_selection,
        overlap=overlap,
        scale=scale,
        seed=seed,
        spk2int=spk2int,
    )
    sampler.write_csv(os.path.join(egs_dir, "train.egs.csv"))
    if valid_dd is not None:
        # valid: sequential tiling capped at valid_chunk_num chunks/utt
        # (get_chunk_egs.py --valid-chunk-num semantics)
        vs = ChunkSamples(
            valid_dd,
            chunk_size=chunk_size,
            chunk_type="sequential",
            overlap=0.0,
            seed=seed,
            spk2int=spk2int,
        )
        per_utt: Dict[str, int] = {}
        kept = []
        for c in vs.sample():
            if per_utt.get(c.utt, 0) < valid_chunk_num:
                kept.append(c)
                per_utt[c.utt] = per_utt.get(c.utt, 0) + 1
        vs.write_csv(os.path.join(egs_dir, "valid.egs.csv"), kept)

    # feat_dim from the first feature matrix's first row
    feats = dd.tables.get("feats.scp", {})
    first = next(iter(sorted(feats.values())), None)
    if first is None:
        raise ValueError(f"{datadir_path} has no feats.scp entries")
    feat_dim = int(read_mat(first, row_range=(0, 1)).shape[1])
    num_targets = len(spk2int)
    open(os.path.join(egs_dir, "info", "feat_dim"), "w").write(f"{feat_dim}\n")
    open(os.path.join(egs_dir, "info", "num_targets"), "w").write(
        f"{num_targets}\n"
    )
    return feat_dim, num_targets


def read_ali_scp(path: str) -> Dict[str, str]:
    """utt -> alignment rxfile map (the ali.scp ali-to-phones writes)."""
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def build_chunk_egs_from_dir(cfg: Dict, worker_id: int = 0,
                             num_workers: int = 1,
                             probe: bool = False) -> "ChunkEgs":
    """Module-level ChunkEgs factory (picklable for MultiprocessLoader
    spawn workers); composes the (worker, pool-size) split into ChunkEgs's
    (rank, world_size) like the reference's DistributedSampler. With
    cfg["ali_scp"] set, builds the dual-label ChunkEgsMultiTask
    (egs_multi_task.py semantics) instead."""
    utt2aux = None
    if cfg.get("aux_utt2label"):
        # per-chunk FD auxiliary labels: a 2-column "utt int" file
        utt2aux = {
            k: int(v) for k, v in
            (line.split(None, 1) for line in open(cfg["aux_utt2label"])
             if line.strip())
        }
    kwargs = dict(
        batch_size=cfg["batch_size"],
        seed=cfg.get("seed", 1024),
        rank=worker_id,
        world_size=num_workers,
        aug=cfg.get("aug"),
        aug_params=cfg.get("aug_params"),
        utt2aux=utt2aux,
    )
    chunks = read_chunk_csv(cfg["train_csv"])
    if cfg.get("ali_scp"):
        return ChunkEgsMultiTask(chunks, read_ali_scp(cfg["ali_scp"]),
                                 **kwargs)
    return ChunkEgs(chunks, **kwargs)


def read_chunk_csv(path: str) -> List[Chunk]:
    out = []
    with open(path) as f:
        r = csv.reader(f)
        next(r, None)
        for row in r:
            if len(row) == 5:
                out.append(Chunk(row[0], row[1], int(row[2]), int(row[3]), int(row[4])))
    return out


class ChunkEgs:
    """Map-style chunk dataset over Kaldi arks with epoch shuffling and
    fixed-shape batches (parity: ChunkEgs egs.py:28-105 + BaseBunch)."""

    def __init__(
        self,
        chunks: Sequence[Chunk],
        batch_size: int = 64,
        seed: int = 1024,
        rank: int = 0,
        world_size: int = 1,
        drop_last: bool = True,
        aug: Optional[str] = None,
        aug_params: Optional[Dict] = None,
        utt2aux: Optional[Dict[str, int]] = None,
    ):
        from .augment import get_augmentation

        self.chunks = list(chunks)
        self.batch_size = batch_size
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.epoch = 0
        # per-item feature aug, reference ChunkEgs egs.py:68 (specaugment
        # or cutout via the get_augmentation factory)
        self.aug_fn = get_augmentation(aug, aug_params)
        self._aug_rng = np.random.default_rng(seed + 7)
        # per-chunk auxiliary class label (e.g. noise/domain type) for the
        # feature-decomposition egs (egs_feature_decompsition.py:28-123)
        self.utt2aux = utt2aux

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.chunks) // self.world_size
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(len(self.chunks))[self.rank :: self.world_size]
        batch: List[Chunk] = []
        for idx in order:
            batch.append(self.chunks[int(idx)])
            if len(batch) == self.batch_size:
                yield self._collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield self._collate(batch)

    def _collate(self, batch: List[Chunk]) -> Dict:
        feats = [read_mat(c.rxfile, row_range=(c.start, c.end)) for c in batch]
        if self.aug_fn is not None:
            feats = [self.aug_fn(f, self._aug_rng) for f in feats]
        x = np.stack(feats).astype(np.float32)
        y = np.asarray([c.label for c in batch], np.int32)
        out = {"x": x, "y": y, "keys": [c.utt for c in batch]}
        if self.utt2aux is not None:
            out["aux_y"] = np.asarray(
                [self.utt2aux[c.utt] for c in batch], np.int32
            )
        return out


class ChunkEgsMultiTask(ChunkEgs):
    """Dual-label chunk egs for multi-task (speaker, phone) training.

    Parity: pytorch/libs/egs/egs_multi_task.py:28-123 — each chunk carries
    the speaker label plus frame-aligned phone labels read from a parallel
    alignment ark (same start/end range as the features). Accepts both the
    int-vector format ali-to-phones writes (read via kaldi_io's
    read_ali_ark convention) and single-column float matrices.
    """

    def __init__(self, chunks, ali_rxfiles: Dict[str, str], **kwargs):
        super().__init__(chunks, **kwargs)
        self.ali_rxfiles = ali_rxfiles

    def _collate(self, batch):
        out = super()._collate(batch)
        phones = [
            read_ali(self.ali_rxfiles[c.utt], row_range=(c.start, c.end))
            for c in batch
        ]
        out["phone_y"] = np.stack(phones)
        return out

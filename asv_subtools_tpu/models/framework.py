"""Model framework: the contract every x-vector model implements, plus
chunked whole-utterance embedding extraction.

Parity: pytorch/libs/nnet/framework.py (TopVirtualNnet +
`for_extract_embedding` maxChunk logic, framework.py:12-55), re-designed
functionally:

* A model is a flax module whose ``__call__(x, mask, train) -> embedding``
  returns the speaker embedding (the reference's "near" position); an
  optional ``position`` argument selects far/near_affine/near.
* Training couples a model with a loss head via :class:`SpeakerNet` —
  the loss owns the classifier weight, mirroring the reference's
  ``model.loss`` attribute.
* Whole utterances longer than ``max_chunk`` frames are split into
  equal-length chunks, embedded as one batch (a big TPU win vs the
  reference's sequential python loop) and frame-weighted averaged.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.loss import LOSSES, accuracy


class SpeakerNet(nn.Module):
    """Backbone + loss head = the trainable unit.

    ``backbone`` maps [B, T, D] -> [B, embd]; ``loss_name``/``loss_params``
    pick from the loss zoo. ``__call__`` returns (loss, logits, embeddings).
    """

    backbone: nn.Module
    loss_name: str = "margin_softmax"
    loss_params: dict = None  # type: ignore[assignment]
    num_targets: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        targets: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        lambda_m: jax.Array | float = 1.0,
        margin_offset: jax.Array | float = 0.0,
        warmup: jax.Array | float = 1.0,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # model-level warmup is a transformer-only input (reference
        # trainer_online.py:227-248 appends it just for TransformerXvector);
        # forward it only to backbones that accept it
        bk = {}
        if "warmup" in inspect.signature(type(self.backbone).__call__).parameters:
            bk["warmup"] = warmup
        emb = self.backbone(x, mask=mask, train=train, **bk)
        loss_cls = LOSSES[self.loss_name]
        params = dict(self.loss_params or {})
        kwargs = {}
        if self.loss_name in ("margin_softmax", "margin_softmax_v1"):
            kwargs = {"lambda_m": lambda_m, "margin_offset": margin_offset}
        loss, logits = loss_cls(num_targets=self.num_targets, **params, name="loss")(
            emb, targets, train=train, **kwargs
        )
        return loss, logits, emb

    def embed(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        position: str = "near",
    ) -> jax.Array:
        return self.backbone(x, mask=mask, train=False, position=position)


def chunk_utterance(
    feats: np.ndarray, max_chunk: int = 10000
) -> Tuple[np.ndarray, np.ndarray]:
    """Split [T, D] into [n, chunk, D] equal chunks + per-chunk frame weights.

    Mirrors the reference's for_extract_embedding (framework.py:27-52):
    split = ceil(T / max_chunk) chunks of floor(T / split) frames; the final
    remainder frames are folded into the last chunk's weight via overlap.
    Returns (chunks [n, L, D], weights [n]) where weights sum to 1.
    """
    t = feats.shape[0]
    if t <= max_chunk:
        return feats[None], np.ones(1, np.float32)
    num_split = -(-t // max_chunk)
    length = t // num_split
    chunks = [feats[i * length : (i + 1) * length] for i in range(num_split)]
    remainder = t - num_split * length
    weights = np.full(num_split, length, np.float32)
    if remainder > 0:
        # last partial chunk: overlap back to keep static shape, weight by
        # its novel frames only
        chunks.append(feats[t - length :])
        weights = np.concatenate([weights, np.asarray([remainder], np.float32)])
    return np.stack(chunks), weights / weights.sum()


def extract_embedding_chunked(
    embed_fn: Callable[[jax.Array, Optional[jax.Array]], jax.Array],
    feats: jax.Array,
    max_chunk: int = 10000,
) -> jax.Array:
    """Whole-utterance embedding: chunk, batch-embed, weight-average.

    ``embed_fn(chunk_batch [n, L, D], mask=None) -> [n, embd]``. All chunks
    are embedded in ONE batched call (the reference loops chunks one by one,
    framework.py:38-48 — batching them is the TPU-friendly redesign).
    """
    chunks, weights = chunk_utterance(np.asarray(feats), max_chunk)
    embs = embed_fn(jnp.asarray(chunks), None)
    return jnp.sum(embs * jnp.asarray(weights)[:, None], axis=0)


def l2_norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

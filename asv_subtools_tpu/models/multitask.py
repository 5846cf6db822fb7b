"""Multi-task and feature-decomposition x-vectors.

Parity: pytorch/model/multi_task_xvector_fix.py (speaker + frame-level
phone heads over a shared TDNN trunk) and snowdar-xvector-FD-AL.py
(feature decomposition + cosine-similarity adversarial learning).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.loss import cross_entropy
from ..nn.norm import BatchNorm
from ..nn.pooling import StatisticsPooling
from ..nn.tdnn import ReluBatchNormTdnnLayer


class MultiTaskXvector(nn.Module):
    """Shared trunk; speaker head (pooled) + phone head (per frame).

    __call__ returns (speaker_embedding, phone_logits [B, T, phones]).
    The joint loss combines margin-softmax on the embedding with frame CE
    on the phone logits (trainer_mt semantics: loss = spk + w * phone).
    """

    num_phones: int
    num_frame_channels: int = 512
    embd_dim: int = 512
    phone_hidden: int = 256
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ):
        c = self.num_frame_channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)
        contexts = [(-2, -1, 0, 1, 2), (-2, 0, 2), (-3, 0, 3), (0,), (0,)]
        dims = [c, c, c, c, 1500]
        shared = x
        taps = []
        for i, (ctx, dim) in enumerate(zip(contexts, dims)):
            shared = ReluBatchNormTdnnLayer(
                dim, context=ctx, name=f"tdnn{i + 1}", **common
            )(shared, train=train, mask=mask)
            taps.append(shared)

        # phone head on the frame-level representation before pooling
        ph = ReluBatchNormTdnnLayer(self.phone_hidden, name="phone_hidden", **common)(
            taps[3], train=train, mask=mask
        )
        phone_logits = nn.Dense(self.num_phones, name="phone_out")(ph)

        stats = StatisticsPooling(name="stats")(shared, mask=mask)
        z = nn.Dense(self.embd_dim, name="fc1_affine")(stats)
        if position == "far":
            return z, phone_logits
        z = jax.nn.relu(z)
        z = BatchNorm(name="fc1_bn", **common)(z, train=train)
        z2 = nn.Dense(self.embd_dim, name="fc2_affine")(z)
        if position == "near_affine":
            return z2, phone_logits
        z2 = jax.nn.relu(z2)
        z2 = BatchNorm(name="fc2_bn", **common)(z2, train=train)
        return z2, phone_logits


def phone_frame_loss(
    phone_logits: jax.Array,
    phone_targets: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Frame-level CE for the phone head, masked over padding."""
    logp = jax.nn.log_softmax(phone_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, phone_targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        m = mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


class FDXvector(nn.Module):
    """Feature-decomposition x-vector (snowdar-xvector-FD-AL.py).

    Two parallel encoders split the input representation into a speaker
    part and a residual ("content") part; `__call__` returns both pooled
    embeddings. Adversarial training minimizes the speaker loss on the
    speaker branch while PENALIZING cosine similarity between the two
    branch embeddings (`fd_adversarial_loss`), with the reference's
    two-optimizer alternation approximated by a gradient-reversal weight.
    """

    num_frame_channels: int = 512
    embd_dim: int = 512
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.num_frame_channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)

        def branch(name):
            h = x
            for i, ctx in enumerate([(-2, -1, 0, 1, 2), (-2, 0, 2), (0,)]):
                h = ReluBatchNormTdnnLayer(
                    c, context=ctx, name=f"{name}_tdnn{i + 1}", **common
                )(h, train=train, mask=mask)
            stats = StatisticsPooling(name=f"{name}_stats")(h, mask=mask)
            z = nn.Dense(self.embd_dim, name=f"{name}_fc")(stats)
            return z

        spk = branch("speaker")
        content = branch("content")
        return spk, content


def fd_adversarial_loss(
    spk_emb: jax.Array, content_emb: jax.Array
) -> jax.Array:
    """Squared cosine similarity between branch embeddings — minimized so
    the content branch carries no speaker information."""
    a = spk_emb / jnp.maximum(jnp.linalg.norm(spk_emb, axis=-1, keepdims=True), 1e-12)
    b = content_emb / jnp.maximum(
        jnp.linalg.norm(content_emb, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.sum(a * b, axis=-1)
    return jnp.mean(cos**2)

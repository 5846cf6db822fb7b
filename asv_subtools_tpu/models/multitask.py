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


class DALRegularizer(nn.Module):
    """Decoupling (DAL) regularizer: learned bias-free projections of the
    two decomposed embeddings, squared mean cosine between them.

    Parity: DAL_regularizer (snowdar-xvector-FD-AL.py:62-76). The
    projections are trained ADVERSARIALLY (they seek residual correlation)
    while the trunk minimizes what they find — see train/fd.py.
    """

    @nn.compact
    def __call__(self, content_emb: jax.Array, spk_emb: jax.Array) -> jax.Array:
        d = spk_emb.shape[-1]
        n = nn.Dense(d, use_bias=False, name="w_noise")(content_emb)
        i = nn.Dense(d, use_bias=False, name="w_id")(spk_emb)
        i = i / jnp.maximum(jnp.linalg.norm(i, axis=-1, keepdims=True), 1e-12)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        cos = jnp.mean(jnp.sum(i * n, axis=-1))
        return cos**2


class FDXvector(nn.Module):
    """Feature-decomposition x-vector (snowdar-xvector-FD-AL.py:79-292).

    Reference architecture: ONE shared x-vector trunk to the second
    segment layer (tdnn7), then an SE sigmoid gate `scale = att(e)` splits
    the embedding into a domain/noise part `e * scale` and a speaker part
    `e * (1 - scale)` (FD-AL forward :287-292). The speaker loss trains
    the (1-scale) part, an auxiliary classifier (reference loss2, 9
    classes) trains the scale part, and the DAL regularizer decouples
    them (train/fd.py wires all three).
    """

    num_frame_channels: int = 512
    embd_dim: int = 512
    se_ratio: int = 8
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

        h = x
        for i, ctx in enumerate([(-2, -1, 0, 1, 2), (-2, 0, 2), (-3, 0, 3), (0,), (0,)]):
            h = ReluBatchNormTdnnLayer(
                c, context=ctx, name=f"tdnn{i + 1}", **common
            )(h, train=train, mask=mask)
        stats = StatisticsPooling(name="stats")(h, mask=mask)
        e = ReluBatchNormTdnnLayer(self.embd_dim, name="tdnn6", **common)(
            stats[:, None, :], train=train
        )[:, 0, :]
        e = ReluBatchNormTdnnLayer(self.embd_dim, name="tdnn7", **common)(
            e[:, None, :], train=train
        )[:, 0, :]

        # SE gate (reference att = SEBlock(512), FD-AL :224): sigmoid
        # channel weights split the embedding into domain vs speaker parts
        g = nn.Dense(self.embd_dim // self.se_ratio, name="content_gate_fc1")(e)
        g = jax.nn.relu(g)
        scale = jax.nn.sigmoid(
            nn.Dense(self.embd_dim, name="content_gate_fc2")(g)
        )
        content = e * scale          # y: domain/noise part (loss2 input)
        spk = e * (1.0 - scale)      # x: speaker part (main loss input)
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

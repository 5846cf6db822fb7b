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

from ..nn.norm import BatchNorm
from ..nn.tdnn import ReluBatchNormTdnnLayer


class MultiTaskXvector(nn.Module):
    """Snowdar trunk; speaker head (pooled) + 512-d frame phone features.

    Reference-exact topology (multi_task_xvector_fix.py:101-214): shared
    tdnn1-4 (with the full extend/SE/skip switchboard), the speaker
    branch tdnn5(1500) -> stats -> tdnn6 -> tdnn7, and the phonetic
    branch phonetic_tdnn5/6/7 (3x512) tapping the trunk output. The
    phone-classification affine lives in the LOSS
    (SoftmaxLoss_frame_phone_fix, loss.py:119-160), not here — __call__
    returns (speaker_embedding_at_position, phone_frame_features
    [B, T, 512]).
    """

    num_frame_channels: int = 512
    embd_dim: int = 512
    extend: bool = False
    skip_connection: bool = False
    se_block: bool = False
    se_ratio: int = 4
    pooling: str = "statistics"
    pooling_params: Any = None
    # reference MT bn_params default = the snowdar family's
    # (multi_task_xvector_fix.py:40-41): momentum 0.5, affine False
    momentum: float = 0.5
    bn_affine: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ):
        from .xvector import _pool, snowdar_trunk

        c = self.num_frame_channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)
        layer = lambda dim, name: ReluBatchNormTdnnLayer(
            dim, context=(0,), name=name, bn_affine=self.bn_affine, **common
        )

        trunk = snowdar_trunk(
            x, mask=mask, train=train, channels=c, extend=self.extend,
            skip_connection=self.skip_connection, se_block=self.se_block,
            se_ratio=self.se_ratio, bn_affine=self.bn_affine, **common,
        )

        # phonetic branch: frame-level 512-d features
        ph = layer(c, "phonetic_tdnn5")(trunk, train=train, mask=mask)
        ph = layer(c, "phonetic_tdnn6")(ph, train=train, mask=mask)
        phone_feats = layer(c, "phonetic_tdnn7")(ph, train=train, mask=mask)

        # speaker branch (identical to the snowdar tail)
        h = ReluBatchNormTdnnLayer(1500, context=(0,), name="tdnn5",
                                   bn_affine=self.bn_affine, **common)(
            trunk, train=train, mask=mask
        )
        stats = _pool(self.pooling, self.pooling_params, h, mask, train)
        z = nn.Dense(self.embd_dim, name="tdnn6_affine")(stats)
        if position == "far":
            return z, phone_feats
        bn_kw = dict(use_scale=self.bn_affine, use_bias=self.bn_affine,
                     **common)
        z = jax.nn.relu(z)
        z = BatchNorm(name="tdnn6_bn", **bn_kw)(z, train=train)
        z2 = nn.Dense(self.embd_dim, name="tdnn7_affine")(z)
        if position == "near_affine":
            return z2, phone_feats
        z2 = jax.nn.relu(z2)
        z2 = BatchNorm(name="tdnn7_bn", **bn_kw)(z2, train=train)
        return z2, phone_feats


class MultiTaskNet(nn.Module):
    """MultiTaskXvector + the two loss heads = the trainable unit.

    Mirrors SpeakerNet's interface so make_train_step works unchanged:
    ``targets`` is a dict {"spk": [B], "phone": [B, T]}; the loss is
    loss_spk + mt_alpha * loss_phone (multi_task_xvector_fix.py:230-243),
    with the frame-phone affine head inside loss_phone
    (SoftmaxLoss_frame_phone_fix, loss.py:119-160). Returns
    (loss, spk_logits, embeddings).
    """

    backbone: nn.Module
    num_targets: int
    num_phones: int
    loss_name: str = "margin_softmax"
    loss_params: dict = None  # type: ignore[assignment]
    mt_alpha: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        targets,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        lambda_m: jax.Array | float = 1.0,
        margin_offset: jax.Array | float = 0.0,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        from ..nn.loss import LOSSES

        emb, phone_feats = self.backbone(x, mask=mask, train=train)
        loss_cls = LOSSES[self.loss_name]
        params = dict(self.loss_params or {})
        kwargs = {}
        if self.loss_name in ("margin_softmax", "margin_softmax_v1"):
            kwargs = {"lambda_m": lambda_m, "margin_offset": margin_offset}
        loss_spk, logits = loss_cls(
            num_targets=self.num_targets, **params, name="loss_spk"
        )(emb, targets["spk"], train=train, **kwargs)

        phone_logits = nn.Dense(self.num_phones, name="phone_affine")(
            phone_feats
        )
        loss_phone = phone_frame_loss(
            phone_logits, targets["phone"], mask=mask,
            num_phones=self.num_phones,
        )
        loss = loss_spk + self.mt_alpha * loss_phone
        return loss, logits, emb

    def embed(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        position: str = "near",
    ) -> jax.Array:
        emb, _ = self.backbone(x, mask=mask, train=False, position=position)
        return emb


def phone_frame_loss(
    phone_logits: jax.Array,
    phone_targets: jax.Array,
    mask: Optional[jax.Array] = None,
    num_phones: Optional[int] = None,
) -> jax.Array:
    """Frame-level CE for the phone head, masked over padding.

    Matches SoftmaxLoss_frame_phone_fix (reference loss.py:133-160):
    mean CE over frames, out-of-range labels clamped to 0 (the reference
    guards against alignment/label mismatches this way). The reference
    has no padding mask (its offline MT egs are fixed-length chunks);
    pass mask for variable-length batches.
    """
    if num_phones is not None:
        bad = (phone_targets < 0) | (phone_targets >= num_phones)
        phone_targets = jnp.where(bad, 0, phone_targets)
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
    extend: bool = False
    skip_connection: bool = False
    se_block: bool = False
    se_ratio: int = 4
    att_ratio: int = 8  # reference att = SEBlock(512) default ratio 8
    pooling: str = "statistics"
    pooling_params: Any = None
    # FD-AL tdnn_layer_params default = the snowdar family's
    # (snowdar-xvector-FD-AL.py:106-108): momentum 0.5, affine False
    momentum: float = 0.5
    bn_affine: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> Tuple[jax.Array, jax.Array]:
        from .xvector import _pool, snowdar_trunk

        c = self.num_frame_channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)

        trunk = snowdar_trunk(
            x, mask=mask, train=train, channels=c, extend=self.extend,
            skip_connection=self.skip_connection, se_block=self.se_block,
            se_ratio=self.se_ratio, bn_affine=self.bn_affine, **common,
        )
        h = ReluBatchNormTdnnLayer(1500, context=(0,), name="tdnn5",
                                   bn_affine=self.bn_affine, **common)(
            trunk, train=train, mask=mask
        )
        stats = _pool(self.pooling, self.pooling_params, h, mask, train)
        bn_kw = dict(use_scale=self.bn_affine, use_bias=self.bn_affine,
                     **common)
        e = nn.Dense(self.embd_dim, name="tdnn6_affine")(stats)
        e = jax.nn.relu(e)
        e = BatchNorm(name="tdnn6_bn", **bn_kw)(e, train=train)
        e = nn.Dense(self.embd_dim, name="tdnn7_affine")(e)
        e = jax.nn.relu(e)
        e = BatchNorm(name="tdnn7_bn", **bn_kw)(e, train=train)

        # SE gate (reference att = SEBlock(512), FD-AL :15-40,290): sigmoid
        # channel weights split the embedding into domain vs speaker parts
        g = nn.Dense(self.embd_dim // self.att_ratio, name="att_fc1")(e)
        g = jax.nn.relu(g)
        scale = jax.nn.sigmoid(nn.Dense(self.embd_dim, name="att_fc2")(g))
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

"""The TDNN x-vector family (parity: pytorch/model/{xvector.py,
snowdar_xvector.py, extended_xvector.py, factored_xvector.py}).

All backbones map [B, T, D] (+ optional mask) -> [B, embd_dim] and accept
``position`` in {"far", "near", "near_affine"} mirroring the reference's
extracted_embedding switch (snowdar_xvector.py:318-334): "far" = the affine
output of the first embedding layer (tdnn6), "near" = the full second
embedding layer (tdnn7) output.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.pooling import POOLINGS
from ..nn.tdnn import FTdnnBlock, ReluBatchNormTdnnLayer, SEBlock, TdnnAffine


def _pool(name, params, y, mask, train):
    pp = dict(params or {})
    pool_cls = POOLINGS[name]
    pool = pool_cls(**pp, name="stats")
    if name in ("mqmha", "mqmha-linear", "xi"):
        return pool(y, mask=mask, train=train)
    return pool(y, mask=mask)


class Xvector(nn.Module):
    """Minimal 5-layer TDNN x-vector (reference pytorch/model/xvector.py:15).

    frame1..frame5 contexts: [-2..2], [-2,0,2], [-3,0,3], [0], [0]x1500,
    stats pooling, two embedding layers. BN defaults follow the snowdar
    file's plain Xvector (momentum 0.5, affine=False; the default config
    train-parity tests against snowdar_xvector.py); set bn_affine=True,
    momentum=0.1 for the older xvector.py flavor, which uses the
    components.py BN defaults.
    """

    num_frame_channels: int = 512
    embd_dim: int = 512
    pooling: str = "statistics"
    pooling_params: Any = None
    # reference snowdar-family bn_params default: momentum 0.5,
    # affine=False (snowdar_xvector.py default_tdnn_layer_params)
    momentum: float = 0.5
    axis_name: Optional[str] = None
    bn_affine: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        c = self.num_frame_channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)
        contexts = [(-2, -1, 0, 1, 2), (-2, 0, 2), (-3, 0, 3), (0,), (0,)]
        dims = [c, c, c, c, 1500]
        for i, (ctx, dim) in enumerate(zip(contexts, dims)):
            x = ReluBatchNormTdnnLayer(dim, context=ctx, name=f"tdnn{i + 1}",
                                       bn_affine=self.bn_affine, **common)(
                x, train=train, mask=mask
            )
        stats = _pool(self.pooling, self.pooling_params, x, mask, train)

        tdnn6_affine = nn.Dense(self.embd_dim, name="tdnn6_affine")
        z = tdnn6_affine(stats)
        if position == "far":
            return z
        z = jax.nn.relu(z)
        from ..nn.norm import BatchNorm

        bn_kw = dict(use_scale=self.bn_affine, use_bias=self.bn_affine,
                     **common)
        z = BatchNorm(name="tdnn6_bn", **bn_kw)(z, train=train)
        z2 = nn.Dense(self.embd_dim, name="tdnn7_affine")(z)
        if position == "near_affine":
            return z2
        z2 = jax.nn.relu(z2)
        z2 = BatchNorm(name="tdnn7_bn", **bn_kw)(z2, train=train)
        return z2


def snowdar_trunk(
    x: jax.Array,
    mask: Optional[jax.Array],
    train: bool,
    *,
    channels: int,
    extend: bool,
    skip_connection: bool,
    se_block: bool,
    se_ratio: int,
    bn_affine: bool,
    momentum: float,
    axis_name: Optional[str],
) -> jax.Array:
    """Shared snowdar frame-level trunk, through tdnn4 (+ skip).

    Mirrors the reference forward exactly (snowdar_xvector.py:185-205,
    multi_task_xvector_fix.py:192-208): `extend` interleaves the E-TDNN
    1x1 layers (ex_tdnn1..5, reference names kept for the converter);
    se1-3 follow tdnn1-3 (se4 follows ex_tdnn4, extend only);
    skip_connection saves tdnn1's (pre-SE) output and adds it ONCE to
    tdnn4's output. Must be called from a flax compact __call__ (the
    layers it creates scope into the caller).
    """
    c = channels
    common = dict(momentum=momentum, axis_name=axis_name)
    plan = [("tdnn1", (-2, -1, 0, 1, 2), "se1")]
    if extend:
        plan += [("ex_tdnn1", (0,), None)]
    plan += [("tdnn2", (-2, 0, 2), "se2")]
    if extend:
        plan += [("ex_tdnn2", (0,), None)]
    plan += [("tdnn3", (-3, 0, 3), "se3")]
    if extend:
        plan += [
            ("ex_tdnn3", (0,), None),
            ("ex_tdnn4", (-4, 0, 4), "se4"),
            ("ex_tdnn5", (0,), None),
        ]
    plan += [("tdnn4", (0,), None)]

    h = x
    identity = None
    for name, ctx, se_name in plan:
        h = ReluBatchNormTdnnLayer(c, context=ctx, name=name,
                                   bn_affine=bn_affine, **common)(
            h, train=train, mask=mask
        )
        if skip_connection and name == "tdnn1":
            identity = h
        if skip_connection and name == "tdnn4":
            h = h + identity
        if se_block and se_name is not None and (se_name != "se4" or extend):
            h = SEBlock(ratio=se_ratio, name=se_name)(h, mask=mask)
    return h


class SnowdarXvector(nn.Module):
    """Standard/extended x-vector with the full switchboard.

    Parity: pytorch/model/snowdar_xvector.py:12-403 — `extend` inserts the
    E-TDNN interleaved 1x1 layers; optional skip connections, SE blocks,
    full pooling zoo; embeddings at far/near.
    """

    num_frame_channels: int = 512
    embd_dim: int = 512
    extend: bool = False
    skip_connection: bool = False
    se_block: bool = False
    se_ratio: int = 4
    pooling: str = "statistics"
    pooling_params: Any = None
    aug_dropout: float = 0.0
    tail_dropout: float = 0.0
    training_stage: bool = True
    # reference snowdar bn_params default: momentum 0.5, affine=False
    momentum: float = 0.5
    axis_name: Optional[str] = None
    bn_affine: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        c = self.num_frame_channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)
        if self.aug_dropout > 0 and train:
            x = nn.Dropout(self.aug_dropout, deterministic=False)(x)

        h = snowdar_trunk(
            x, mask=mask, train=train, channels=c, extend=self.extend,
            skip_connection=self.skip_connection, se_block=self.se_block,
            se_ratio=self.se_ratio, bn_affine=self.bn_affine, **common,
        )
        h = ReluBatchNormTdnnLayer(1500, context=(0,), name="tdnn5",
                                   bn_affine=self.bn_affine, **common)(
            h, train=train, mask=mask
        )
        stats = _pool(self.pooling, self.pooling_params, h, mask, train)

        from ..nn.norm import BatchNorm

        fc1_affine = nn.Dense(self.embd_dim, name="tdnn6_affine")
        z = fc1_affine(stats)
        if position == "far":
            return z
        z = jax.nn.relu(z)
        bn_kw = dict(use_scale=self.bn_affine, use_bias=self.bn_affine,
                     **common)
        z = BatchNorm(name="tdnn6_bn", **bn_kw)(z, train=train)
        z2 = nn.Dense(self.embd_dim, name="tdnn7_affine")(z)
        if position == "near_affine":
            return z2
        z2 = jax.nn.relu(z2)
        z2 = BatchNorm(name="tdnn7_bn", **bn_kw)(z2, train=train)
        if self.tail_dropout > 0 and train:
            z2 = nn.Dropout(self.tail_dropout, deterministic=False)(z2)
        return z2


class ExtendedXvector(SnowdarXvector):
    """E-TDNN x-vector (reference pytorch/model/extended_xvector.py:13)."""

    extend: bool = True


class FactoredXvector(nn.Module):
    """Factored TDNN (F-TDNN) x-vector with semi-orthogonal constraint.

    Parity: pytorch/model/factored_xvector.py:14-120 — the EXACT reference
    topology so reference checkpoints convert directly: layer01 (5-tap),
    layer02-09 FTdnnBlocks with the reference's (context, bypass) plan and
    the two concat skips (layer07 <- cat(x2, x4), layer09 <- cat(x4, x6,
    x8)), layer10, stats pooling, embedding1/embedding2. The semi-orth step
    is applied out-of-band via nn.tdnn.apply_semi_orth_constraint on the
    param pytree every 4 steps (reference components.py:218-226).

    `width` scales every hidden dim (1.0 = the reference's 512/1024/256/
    2048 sizes; smaller for tests).
    """

    width: float = 1.0
    embd_dim: int = 512
    pooling: str = "statistics"
    pooling_params: Any = None
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        w = self.width
        frame = int(512 * w)
        block = int(1024 * w)
        bneck = int(256 * w)
        final = int(2048 * w)
        common = dict(momentum=self.momentum, axis_name=self.axis_name)

        def ftdnn(name, ctx, bypass):
            return FTdnnBlock(
                block, bneck, context_size=ctx, bypass_scale=bypass,
                name=name, **common,
            )

        x1 = ReluBatchNormTdnnLayer(
            frame, context=(-2, -1, 0, 1, 2), name="layer01", **common
        )(x, train=train, mask=mask)
        x2 = ftdnn("layer02", 2, 0.0)(x1, train=train, mask=mask)
        x3 = ftdnn("layer03", 0, 0.66)(x2, train=train, mask=mask)
        x4 = ftdnn("layer04", 3, 0.66)(x3, train=train, mask=mask)
        x5 = ftdnn("layer05", 0, 0.66)(x3, train=train, mask=mask)
        x6 = ftdnn("layer06", 3, 0.66)(x5, train=train, mask=mask)
        x7 = ftdnn("layer07", 3, 0.0)(
            jnp.concatenate([x2, x4], axis=-1), train=train, mask=mask
        )
        x8 = ftdnn("layer08", 3, 0.66)(x7, train=train, mask=mask)
        x9 = ftdnn("layer09", 0, 0.0)(
            jnp.concatenate([x4, x6, x8], axis=-1), train=train, mask=mask
        )
        h = ReluBatchNormTdnnLayer(final, name="layer10", **common)(
            x9, train=train, mask=mask
        )
        stats = _pool(self.pooling, self.pooling_params, h, mask, train)

        from ..nn.norm import BatchNorm

        z = nn.Dense(self.embd_dim, name="embed1_affine")(stats)
        if position == "far":
            return z
        z = jax.nn.relu(z)
        z = BatchNorm(name="embed1_bn", **common)(z, train=train)
        z2 = nn.Dense(self.embd_dim, name="embed2_affine")(z)
        if position == "near_affine":
            return z2
        z2 = jax.nn.relu(z2)
        z2 = BatchNorm(name="embed2_bn", **common)(z2, train=train)
        return z2

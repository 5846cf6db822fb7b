"""ResNet34 and RepVGG x-vectors (parity: pytorch/model/resnet_xvector.py,
pytorch/model/repvgg_xvector.py, recipe/cnsrc SE-ResNet).

2D trunk over [B, T, F] fbank maps -> flattened frame features -> pooling
-> two embedding layers (same head as the TDNN family).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.norm import BatchNorm
from ..nn.pooling import POOLINGS
from ..nn.repvgg import RepVGG
from ..nn.resnet import ResNet


class _EmbeddingHead(nn.Module):
    """stats-pool -> [fc1(affine/relu/bn)] -> fc2(affine/relu/bn) head.

    fc1 is optional, matching the reference resnet_xvector default
    (fc1=False: pooling feeds fc2 directly, resnet_xvector.py:99-120).
    """

    embd_dim: int = 512
    pooling: str = "statistics"
    pooling_params: Any = None
    fc1: bool = False
    momentum: float = 0.5  # reference norm_layer_params/bn_params default (resnet_xvector.py:37,57)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, h, mask, train, position):
        pp = dict(self.pooling_params or {})
        pool = POOLINGS[self.pooling](**pp, name="stats")
        if self.pooling in ("mqmha", "mqmha-linear", "xi"):
            stats = pool(h, mask=mask, train=train)
        else:
            stats = pool(h, mask=mask)
        common = dict(momentum=self.momentum, axis_name=self.axis_name)
        z = stats
        if self.fc1:
            z = nn.Dense(self.embd_dim, name="fc1_affine")(z)
            if position == "far":
                return z
            z = jax.nn.relu(z)
            z = BatchNorm(name="fc1_bn", **common)(z, train=train)
        elif position == "far":
            raise ValueError("position='far' requires fc1=True")
        z2 = nn.Dense(self.embd_dim, name="fc2_affine")(z)
        if position == "near_affine":
            return z2
        z2 = jax.nn.relu(z2)
        return BatchNorm(name="fc2_bn", **common)(z2, train=train)


class ResNetXvector(nn.Module):
    """ResNet34 x-vector (reference pytorch/model/resnet_xvector.py:15-374).

    Default = base32 voxceleb recipe (block basic, layers 3-4-6-3, 32ch).
    """

    block: str = "basic"
    layers: Sequence[int] = (3, 4, 6, 3)
    base_planes: int = 32
    use_se: bool = False
    full_pre_activation: bool = True
    embd_dim: int = 512
    pooling: str = "statistics"
    pooling_params: Any = None
    fc1: bool = False
    momentum: float = 0.5  # reference norm_layer_params/bn_params default (resnet_xvector.py:37,57)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        trunk = ResNet(
            block=self.block,
            layers=self.layers,
            base_planes=self.base_planes,
            use_se=self.use_se,
            full_pre_activation=self.full_pre_activation,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="resnet",
        )
        h = trunk(x, train=train)  # [B, T/8, F']
        sub_mask = None
        if mask is not None:
            t_out = h.shape[1]
            stride = max(1, x.shape[1] // t_out)
            sub_mask = mask[:, : t_out * stride : stride][:, :t_out]
        return _EmbeddingHead(
            embd_dim=self.embd_dim,
            pooling=self.pooling,
            pooling_params=self.pooling_params,
            fc1=self.fc1,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="head",
        )(h, sub_mask, train, position)


class RepVggXvector(nn.Module):
    """RepVGG x-vector (reference pytorch/model/repvgg_xvector.py:14-658).

    Defaults mirror the reference default_repvgg_config: RepSPK blocks,
    base_width 32, width_multiplier (1, 1, 1, 2.5), embd_dim 256.
    """

    num_blocks: Sequence[int] = (2, 4, 14, 1)
    width_multiplier: Sequence[float] = (1.0, 1.0, 1.0, 2.5)
    base_channels: int = 32
    block: str = "spk"  # spk (RepSPKBlock, reference default) | vgg
    deploy: bool = False
    use_se: bool = False
    embd_dim: int = 256
    pooling: str = "statistics"
    pooling_params: Any = None
    momentum: float = 0.5  # reference norm_layer_params/bn_params default (resnet_xvector.py:37,57)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        trunk = RepVGG(
            num_blocks=self.num_blocks,
            width_multiplier=self.width_multiplier,
            base_channels=self.base_channels,
            block=self.block,
            deploy=self.deploy,
            use_se=self.use_se,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="repvgg",
        )
        h = trunk(x, train=train)
        sub_mask = None
        if mask is not None:
            t_out = h.shape[1]
            stride = max(1, x.shape[1] // t_out)
            sub_mask = mask[:, : t_out * stride : stride][:, :t_out]
        return _EmbeddingHead(
            embd_dim=self.embd_dim,
            pooling=self.pooling,
            pooling_params=self.pooling_params,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="head",
        )(h, sub_mask, train, position)

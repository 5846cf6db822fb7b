"""2D ResNet backbone over spectrogram maps (parity: pytorch/libs/nnet/resnet.py).

TPU layout is NHWC: input ``[B, T, F]`` features become ``[B, T, F, 1]``
maps; convs are channels-last so XLA tiles them straight onto the MXU.
The frame-level output is flattened back to ``[B, T', F'*C]`` for pooling,
matching the reference's reshape in resnet_xvector.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm
from .tdnn import SEBlock2D


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (reference resnet.py:23-110).

    full_pre_activation=True (the reference default, resnet.py:59-105,
    He et al. 2016): bn-relu-conv twice, identity added WITHOUT a final
    relu; False = the original conv-bn-relu ordering.
    """

    planes: int
    stride: Tuple[int, int] = (1, 1)
    use_se: bool = False
    se_ratio: int = 16
    full_pre_activation: bool = True
    momentum: float = 0.1
    axis_name: Optional[str] = None

    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        bn = lambda name: BatchNorm(
            momentum=self.momentum, axis_name=self.axis_name, name=name
        )
        residual = x

        if self.full_pre_activation:
            y = bn("bn1")(x, train=train)
            y = jax.nn.relu(y)
            y = nn.Conv(
                self.planes, (3, 3), strides=self.stride, padding=[(1, 1), (1, 1)],
                use_bias=False, name="conv1",
            )(y)
            y = bn("bn2")(y, train=train)
            y = jax.nn.relu(y)
            y = nn.Conv(
                self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2"
            )(y)
            if self.use_se:
                y = SEBlock2D(ratio=self.se_ratio, name="se")(y)
            if residual.shape != y.shape:
                residual = nn.Conv(
                    self.planes, (1, 1), strides=self.stride, use_bias=False,
                    name="downsample_conv",
                )(residual)
                residual = bn("downsample_bn")(residual, train=train)
            return y + residual

        y = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv1",
        )(x)
        y = bn("bn1")(y, train=train)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2"
        )(y)
        y = bn("bn2")(y, train=train)
        if self.use_se:
            y = SEBlock2D(ratio=self.se_ratio, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False,
                name="downsample_conv",
            )(residual)
            residual = bn("downsample_bn")(residual, train=train)
        return jax.nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block (reference resnet.py:113-209)."""

    planes: int
    stride: Tuple[int, int] = (1, 1)
    use_se: bool = False
    se_ratio: int = 16
    momentum: float = 0.1
    axis_name: Optional[str] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        residual = x
        out_planes = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = BatchNorm(momentum=self.momentum, axis_name=self.axis_name, name="bn1")(
            y, train=train
        )
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv2",
        )(y)
        y = BatchNorm(momentum=self.momentum, axis_name=self.axis_name, name="bn2")(
            y, train=train
        )
        y = jax.nn.relu(y)
        y = nn.Conv(out_planes, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(momentum=self.momentum, axis_name=self.axis_name, name="bn3")(
            y, train=train
        )
        if self.use_se:
            y = SEBlock2D(ratio=self.se_ratio, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                out_planes, (1, 1), strides=self.stride, use_bias=False,
                name="downsample_conv",
            )(residual)
            residual = BatchNorm(
                momentum=self.momentum, axis_name=self.axis_name, name="downsample_bn"
            )(residual, train=train)
        return jax.nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet trunk for x-vectors (reference resnet.py:212-371).

    Input [B, T, F] -> frame-level output [B, T//8, ceil(F/8)*planes*8*exp].
    Default layers (3,4,6,3) + base 32 = the voxceleb ResNet34 recipe
    (base-channels 32, "base32" in BASELINE.md).
    """

    block: str = "basic"  # basic | bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    base_planes: int = 32
    use_se: bool = False
    se_ratio: int = 16
    full_pre_activation: bool = True  # reference default (resnet_xvector.py:38)
    momentum: float = 0.1
    axis_name: Optional[str] = None
    head_conv: bool = True  # 3x3 stem conv (head_conv in reference)
    head_maxpool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if x.ndim == 3:
            x = x[..., None]  # [B, T, F, 1]
        blk = BasicBlock if self.block == "basic" else Bottleneck
        p = self.base_planes

        if self.head_conv:
            x = nn.Conv(p, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="stem")(x)
            x = BatchNorm(momentum=self.momentum, axis_name=self.axis_name, name="stem_bn")(
                x, train=train
            )
            x = jax.nn.relu(x)
        if self.head_maxpool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        strides = [(1, 1), (2, 2), (2, 2), (2, 2)]
        for stage, (n_blocks, stride) in enumerate(zip(self.layers, strides)):
            planes = p * (2**stage)
            for b in range(n_blocks):
                kwargs = dict(
                    planes=planes,
                    stride=stride if b == 0 else (1, 1),
                    use_se=self.use_se,
                    se_ratio=self.se_ratio,
                    momentum=self.momentum,
                    axis_name=self.axis_name,
                    name=f"layer{stage + 1}_{b}",
                )
                if blk is BasicBlock:
                    kwargs["full_pre_activation"] = self.full_pre_activation
                x = blk(**kwargs)(x, train=train)

        # [B, T', F', C] -> [B, T', F'*C] frame-level features
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)


def resnet18(**kw) -> ResNet:
    return ResNet(block="basic", layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block="basic", layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3), **kw)

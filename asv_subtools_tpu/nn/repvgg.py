"""RepVGG backbone with deploy-time reparameterization.

Parity: pytorch/libs/nnet/repvgg.py (RepVGGBlock :29, RepVGG :173,
repvgg_model_convert :378, after https://arxiv.org/abs/2101.03697 /
RepSPK https://arxiv.org/abs/2110.09720).

TPU notes: NHWC layout; train-time = 3 branches (3x3+BN, 1x1+BN, id BN)
which XLA executes as three convs + adds; `reparameterize()` folds the
branches into a single 3x3 conv kernel/bias pytree for deploy — one MXU
conv per block at inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .norm import BatchNorm
from .tdnn import SEBlock2D


class RepVGGBlock(nn.Module):
    """Re-parameterizable block; ReLU after the branch sum.

    block_type "vgg": 3x3 + 1x1 + identity branches (RepVGGBlock,
    reference repvgg.py:29-170); deploy = one 3x3 conv.
    block_type "spk": 3x3 + dilated-3x3 (dilation 2) + identity branches
    (RepSPKBlock, reference repvgg.py:173-296, RepSPK paper); deploy = one
    dense 5x5 conv (the dilated kernel zero-interleaved into 5x5).

    Padding is explicit torch-style (symmetric), not "SAME": for stride-2
    blocks flax SAME pads asymmetrically and the grids diverge from the
    reference.
    """

    out_channels: int
    stride: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_se: bool = False
    deploy: bool = False
    block_type: str = "vgg"  # vgg | spk
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_c = x.shape[-1]
        spk = self.block_type == "spk"
        if self.deploy:
            k, pad = ((5, 5), 2) if spk else ((3, 3), 1)
            y = nn.Conv(
                self.out_channels, k, strides=self.stride,
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.groups, use_bias=True, name="reparam",
            )(x)
        else:
            dense = nn.Conv(
                self.out_channels, (3, 3), strides=self.stride,
                padding=[(1, 1), (1, 1)],
                feature_group_count=self.groups, use_bias=False, name="dense_conv",
            )(x)
            dense = BatchNorm(
                momentum=self.momentum, axis_name=self.axis_name, name="dense_bn"
            )(dense, train=train)
            if spk:
                other = nn.Conv(
                    self.out_channels, (3, 3), strides=self.stride,
                    padding=[(2, 2), (2, 2)], kernel_dilation=(2, 2),
                    feature_group_count=self.groups, use_bias=False,
                    name="dil_conv",
                )(x)
                other = BatchNorm(
                    momentum=self.momentum, axis_name=self.axis_name,
                    name="dil_bn",
                )(other, train=train)
            else:
                other = nn.Conv(
                    self.out_channels, (1, 1), strides=self.stride,
                    padding="VALID", feature_group_count=self.groups,
                    use_bias=False, name="one_conv",
                )(x)
                other = BatchNorm(
                    momentum=self.momentum, axis_name=self.axis_name,
                    name="one_bn",
                )(other, train=train)
            y = dense + other
            if in_c == self.out_channels and self.stride == (1, 1):
                ident = BatchNorm(
                    momentum=self.momentum, axis_name=self.axis_name, name="id_bn"
                )(x, train=train)
                y = y + ident
        y = jax.nn.relu(y)
        if self.use_se:
            y = SEBlock2D(ratio=4, name="se")(y)
        return y


class RepVGG(nn.Module):
    """RepVGG trunk over [B, T, F] features -> [B, T', F'*C] frames.

    Parity: RepVGG (reference repvgg.py:173-295). num_blocks/width per the
    RepVGG-A/B tables; strides downsample (2,2) at each stage entry.
    """

    num_blocks: Sequence[int] = (2, 4, 14, 1)
    width_multiplier: Sequence[float] = (0.75, 0.75, 0.75, 2.5)
    base_channels: int = 64
    override_groups_map: Any = None
    use_se: bool = False
    deploy: bool = False
    block: str = "vgg"  # vgg | spk (RepSPKBlock — the reference's default)
    strides: Sequence[Tuple[int, int]] = ((1, 1), (2, 2), (2, 2), (2, 2))
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if x.ndim == 3:
            x = x[..., None]
        groups_map = self.override_groups_map or {}
        # min(64, .) is the reference's magic constant, NOT base_channels
        # (repvgg.py:324: self.in_planes = min(64, int(64*width_multiplier[0]))
        # with width_multiplier pre-scaled by base_width/64)
        in_planes = min(64, int(self.base_channels * self.width_multiplier[0]))
        x = RepVGGBlock(
            in_planes, stride=(1, 1), use_se=self.use_se, deploy=self.deploy,
            block_type=self.block, momentum=self.momentum,
            axis_name=self.axis_name, name="stage0",
        )(x, train=train)
        layer_idx = 1
        for stage in range(4):
            planes = int(self.base_channels * (2**stage) * self.width_multiplier[stage])
            for b in range(self.num_blocks[stage]):
                stride = self.strides[stage] if b == 0 else (1, 1)
                groups = groups_map.get(layer_idx, 1)
                x = RepVGGBlock(
                    planes, stride=stride, groups=groups, use_se=self.use_se,
                    deploy=self.deploy, block_type=self.block,
                    momentum=self.momentum,
                    axis_name=self.axis_name, name=f"stage{stage + 1}_{b}",
                )(x, train=train)
                layer_idx += 1
        b_, t, f, c = x.shape
        return x.reshape(b_, t, f * c)


def _fuse_bn(kernel, bn_stats, bn_params, eps=1e-5):
    """Fold BN into conv kernel/bias. kernel [kh, kw, in, out] or None (id)."""
    mean = bn_stats["mean"]
    var = bn_stats["var"]
    gamma = bn_params.get("scale", np.ones_like(mean))
    beta = bn_params.get("bias", np.zeros_like(mean))
    std = np.sqrt(var + eps)
    t = gamma / std
    return kernel * t, beta - mean * t


def reparameterize_block(
    block_params: Dict, block_stats: Dict, in_channels: int, groups: int = 1,
    block_type: str = "vgg",
) -> Dict:
    """Fold a RepVGGBlock's three branches into one conv {kernel, bias}.

    vgg: 3x3 + padded-1x1 + id -> 3x3 (get_equivalent_kernel_bias,
    reference repvgg.py:113-170). spk: padded-3x3 + zero-interleaved
    dilated-3x3 + id -> dense 5x5 (reference repvgg.py:227-244).
    """
    k3, b3 = _fuse_bn(
        np.asarray(block_params["dense_conv"]["kernel"]),
        jax.tree_util.tree_map(np.asarray, block_stats["dense_bn"]),
        jax.tree_util.tree_map(np.asarray, block_params["dense_bn"]),
    )
    if block_type == "spk":
        kd, bd = _fuse_bn(
            np.asarray(block_params["dil_conv"]["kernel"]),
            jax.tree_util.tree_map(np.asarray, block_stats["dil_bn"]),
            jax.tree_util.tree_map(np.asarray, block_params["dil_bn"]),
        )
        k5 = np.zeros((5, 5) + kd.shape[2:], kd.dtype)
        k5[::2, ::2] = kd  # dilation-2 3x3 == zero-interleaved 5x5
        kernel = k5 + np.pad(k3, [(1, 1), (1, 1), (0, 0), (0, 0)])
        bias = b3 + bd
        ksize, center = 5, 2
    else:
        k1, b1 = _fuse_bn(
            np.asarray(block_params["one_conv"]["kernel"]),
            jax.tree_util.tree_map(np.asarray, block_stats["one_bn"]),
            jax.tree_util.tree_map(np.asarray, block_params["one_bn"]),
        )
        kernel = k3 + np.pad(k1, [(1, 1), (1, 1), (0, 0), (0, 0)])
        bias = b3 + b1
        ksize, center = 3, 1
    if "id_bn" in block_stats:
        out_c = kernel.shape[-1]
        in_per_group = in_channels // groups
        kid = np.zeros((ksize, ksize, in_per_group, out_c), kernel.dtype)
        for o in range(out_c):
            kid[center, center, o % in_per_group, o] = 1.0
        kid, bid = _fuse_bn(
            kid,
            jax.tree_util.tree_map(np.asarray, block_stats["id_bn"]),
            jax.tree_util.tree_map(np.asarray, block_params["id_bn"]),
        )
        kernel = kernel + kid
        bias = bias + bid
    return {"reparam": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}


def repvgg_model_convert(
    variables: Dict, model: RepVGG, sample_input_channels: int = 1
) -> Dict:
    """Convert train-mode RepVGG variables to deploy-mode (reparam kernels).

    Returns a `{"params": ...}` dict for the same RepVGG with deploy=True.
    Parity: repvgg_model_convert (reference repvgg.py:378-386).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, Dict] = {}
    # walk blocks in declaration order to track in_channels
    in_c = sample_input_channels
    names = ["stage0"]
    layer_widths = [min(64, int(model.base_channels * model.width_multiplier[0]))]
    for stage in range(4):
        planes = int(model.base_channels * (2**stage) * model.width_multiplier[stage])
        for b in range(model.num_blocks[stage]):
            names.append(f"stage{stage + 1}_{b}")
            layer_widths.append(planes)
    groups_map = model.override_groups_map or {}
    for i, name in enumerate(names):
        blk_p = dict(params[name])
        blk_s = stats.get(name, {})
        groups = groups_map.get(i, 1) if i > 0 else 1
        new_blk = reparameterize_block(
            blk_p, blk_s, in_c, groups, block_type=model.block
        )
        if "se" in blk_p:
            new_blk["se"] = blk_p["se"]
        out[name] = new_blk
        in_c = layer_widths[i]
    return {"params": out}


def repvgg_a0(**kw):
    return RepVGG(num_blocks=(2, 4, 14, 1), width_multiplier=(0.75, 0.75, 0.75, 2.5), **kw)


def repvgg_a1(**kw):
    return RepVGG(num_blocks=(2, 4, 14, 1), width_multiplier=(1, 1, 1, 2.5), **kw)


def repvgg_a2(**kw):
    return RepVGG(num_blocks=(2, 4, 14, 1), width_multiplier=(1.5, 1.5, 1.5, 2.75), **kw)


def repvgg_b0(**kw):
    return RepVGG(num_blocks=(4, 6, 16, 1), width_multiplier=(1, 1, 1, 2.5), **kw)


def repvgg_b1(**kw):
    return RepVGG(num_blocks=(4, 6, 16, 1), width_multiplier=(2, 2, 2, 4), **kw)

"""ECAPA-TDNN x-vector (parity: pytorch/model/ecapa_tdnn_xvector.py).

Emphasized Channel Attention, Propagation and Aggregation TDNN
(https://arxiv.org/abs/2005.07143), as in the reference: no pooled-stats
concat at the MFA layer (≈ paper's A.2 config), full pooling switchboard.

TPU-first: channels-last [B, T, C]; Res2Net's sequential scale-chunk chain
stays a static python loop over `scale` slices (8 small convs — XLA fuses
them); everything masked for length-bucketed batches.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.norm import BatchNorm
from ..nn.pooling import POOLINGS, pooling_output_dim
from ..nn.tdnn import ReluBatchNormTdnnLayer, TdnnAffine


class Res2NetBlock(nn.Module):
    """Res2Net multi-scale conv block (reference ecapa_tdnn_xvector.py:17-75).

    Splits channels into `scale` groups; group i is convolved after adding
    the previous group's output (hierarchical receptive field growth).
    """

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1
    momentum: float = 0.5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        in_c = x.shape[-1]
        if in_c % self.scale or self.out_channels % self.scale:
            raise ValueError(
                f"channels ({in_c} -> {self.out_channels}) must be a "
                f"multiple of scale ({self.scale})"
            )
        hidden = self.out_channels // self.scale
        half_k = self.kernel_size // 2
        context = tuple(
            range(-half_k * self.dilation, half_k * self.dilation + 1, self.dilation)
        )
        parts = jnp.split(x, self.scale, axis=-1)
        outs = [parts[0]]
        sp = None
        for i in range(self.scale - 1):
            sp = parts[i + 1] if i == 0 else sp + parts[i + 1]
            sp = ReluBatchNormTdnnLayer(
                hidden,
                context=context,
                momentum=self.momentum,
                axis_name=self.axis_name,
                name=f"block_{i}",
            )(sp, train=train, mask=mask)
            outs.append(sp)
        return jnp.concatenate(outs, axis=-1)


class SEConnect(nn.Module):
    """Bottlenecked SE gate over the global time mean.

    Parity: SE_Connect (reference ecapa_tdnn_xvector.py:96-110).
    """

    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        c = x.shape[-1]
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            s = jnp.sum(x * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        else:
            s = jnp.mean(x, axis=-2)
        s = jax.nn.relu(nn.Dense(self.bottleneck, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(c, name="fc2")(s))
        return x * s[..., None, :]


class SERes2Block(nn.Module):
    """1x1 conv -> Res2Net -> 1x1 conv -> SE, with residual.

    Parity: SE_Res2Block (reference ecapa_tdnn_xvector.py:118-152).
    """

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    momentum: float = 0.5
    axis_name: Optional[str] = None
    int8_inference: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        in_c = x.shape[-1]
        if in_c % self.scale:
            raise ValueError(
                f"SERes2Block input channels {in_c} must be divisible by "
                f"scale {self.scale}"
            )
        width = int(math.floor(in_c / self.scale))
        residual = x
        if in_c != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,), name="shortcut")(x)
        y = ReluBatchNormTdnnLayer(
            width * self.scale,
            momentum=self.momentum,
            axis_name=self.axis_name,
            int8_compute=self.int8_inference,
            name="conv1",
        )(x, train=train, mask=mask)
        y = Res2NetBlock(
            width * self.scale,
            scale=self.scale,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="res2net",
        )(y, train=train, mask=mask)
        y = ReluBatchNormTdnnLayer(
            width * self.scale,
            momentum=self.momentum,
            axis_name=self.axis_name,
            int8_compute=self.int8_inference,
            name="conv2",
        )(y, train=train, mask=mask)
        y = SEConnect(name="se")(y, mask=mask)
        return y + residual


class _SplitGlobalConv(nn.Module):
    """conv1x1 over [x; mean; std] without materializing the concat.

    Owns a kernel [1, 3C, F] + bias — byte-identical param tree to
    nn.Conv(features, (1,)) applied to the concatenation, so converted
    reference checkpoints load unchanged. The matmul is split blockwise:
    y = x @ Wx + (mean @ Wm + std @ Ws) + b, with the global terms staying
    [B, 1, F] until the broadcast add.
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
        d = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=-2, out_axis=-1),
            (1, 3 * d, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kx, km, ks = kernel[0, :d], kernel[0, d : 2 * d], kernel[0, 2 * d :]
        glob = mean @ km + std @ ks + bias  # [B, 1, F]
        return x @ kx + glob


class EcapaAttentiveStatsPool(nn.Module):
    """ECAPA channel-wise attentive stats pooling with global-context input.

    Parity: AttentiveStatsPool (reference ecapa_tdnn_xvector.py:159-190):
    attention input is [x; mean; std] when time_attention, logits are
    per-channel, softmax over time.
    """

    bottleneck: int = 128
    time_attention: bool = True
    norm_type: str = "batch_norm"  # batch_norm | layer_norm (transformer uses LN)
    # torch-default BN momentum: the reference never passes its bn_params
    # into this pooling's BatchNorm1d (ecapa_tdnn_xvector.py:164-171)
    momentum: float = 0.1
    axis_name: Optional[str] = None
    # inference: optionally fuse the whole pooling into one two-stream
    # Pallas kernel (nn/pallas_att_pooling.py). Measured on v5e at
    # B=128 T=998 C=1536: the op is VPU-elementwise-bound (exp + three
    # full-size multiply-reduces), so the two-stream kernel (6.7 ms) does
    # NOT beat XLA's fused loops (5.4 ms, ~89% of the HBM roof) despite
    # 5x fewer HBM bytes — XLA stays the default (None/False); True keeps
    # the verified kernel reachable for narrower-C models where the
    # VPU/byte balance differs.
    fused_inference: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        d = x.shape[-1]
        fused = (
            self.time_attention
            and self.norm_type == "batch_norm"
            and not train
            and not self.is_initializing()
            and d % 128 == 0
            and bool(self.fused_inference)
        )
        if fused:
            from ..nn.pallas_att_pooling import fused_attentive_stats_pool

            p1 = self.get_variable("params", "att1")
            pbn = self.get_variable("params", "att_bn")
            sbn = self.get_variable("batch_stats", "att_bn")
            p2 = self.get_variable("params", "att2")
            k = p1["kernel"][0]  # [3C, K] (_SplitGlobalConv layout)
            inv = jax.lax.rsqrt(sbn["var"].astype(jnp.float32) + 1e-5)
            bn_s = pbn["scale"].astype(jnp.float32) * inv
            bn_t = (
                pbn["bias"].astype(jnp.float32)
                - sbn["mean"].astype(jnp.float32) * bn_s
            )
            return fused_attentive_stats_pool(
                x,
                k[:d],
                k[d : 2 * d],
                k[2 * d :],
                p1["bias"],
                bn_s,
                bn_t,
                p2["kernel"][0],  # nn.Conv kernel [1, K, C]
                p2["bias"],
                mask=mask,
            ).astype(x.dtype)
        if self.time_attention:
            # global std uses the UNBIASED variance (ddof=1): the reference's
            # torch.var default (ecapa_tdnn_xvector.py:176-178)
            if mask is not None:
                m = mask.astype(x.dtype)[..., None]
                count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
                mean = jnp.sum(x * m, axis=-2, keepdims=True) / count
                var = jnp.sum(
                    (x - mean) ** 2 * m, axis=-2, keepdims=True
                ) / jnp.maximum(count - 1.0, 1.0)
            else:
                mean = jnp.mean(x, axis=-2, keepdims=True)
                var = jnp.var(x, axis=-2, keepdims=True, ddof=1)
            std = jnp.sqrt(var + 1e-5)
            # HBM-traffic optimization: conv1x1([x; mean; std]) would
            # materialize a [B, T, 3C] tensor (2/3 of this kernel's HBM
            # bytes — it runs at ~90% of the bandwidth roof). The same
            # linear map splits into x @ Wx + (mean @ Wm + std @ Ws) where
            # the mean/std terms are [B, 1, bottleneck] broadcasts. The
            # param layout stays nn.Conv-compatible ({kernel [1, 3C, F],
            # bias}) for the checkpoint converter.
            a = _SplitGlobalConv(
                features=self.bottleneck, name="att1"
            )(x, mean, std)
        else:
            a = nn.Conv(self.bottleneck, (1,), name="att1")(x)
        a = jax.nn.relu(a)
        if self.norm_type == "batch_norm":
            a = BatchNorm(
                momentum=self.momentum, axis_name=self.axis_name, name="att_bn"
            )(a, train=train, mask=mask)
        else:
            # torch LayerNorm eps (reference transformer_xvector.py:39)
            a = nn.LayerNorm(epsilon=1e-5, name="att_norm")(a)
        a = jnp.tanh(a)
        a = nn.Conv(d, (1,), name="att2")(a)
        if mask is not None:
            a = jnp.where(mask[..., None], a, -jnp.inf)
        alpha = jax.nn.softmax(a, axis=-2)
        mean = jnp.sum(alpha * x, axis=-2)
        var = jnp.sum(alpha * x * x, axis=-2) - mean**2
        std = jnp.sqrt(jnp.maximum(var, 1e-5))
        return jnp.concatenate([mean, std], axis=-1)


class EcapaTdnn(nn.Module):
    """ECAPA-TDNN backbone -> speaker embedding.

    Parity: ECAPA_TDNN (reference ecapa_tdnn_xvector.py:200-430). C1024 is
    `channels=1024`; the voxceleb recipe default. Returns the embedding at
    `position`: "near" = fc2 full layer output (default), "near_affine" =
    fc2 affine only, "far" = fc1 affine (requires fc1=True).
    """

    channels: int = 1024
    embd_dim: int = 192
    mfa_conv: int = 1536
    pooling: str = "ecpa-attentive"
    pooling_params: Any = None
    fc1: bool = False
    momentum: float = 0.5
    axis_name: Optional[str] = None
    aug_dropout: float = 0.0
    tail_dropout: float = 0.0
    # serving: channel-mix GEMMs (SERes2Block 1x1s + MFA, ~60% of graph
    # FLOPs) in dynamic int8 — embedding cosine vs bf16 verified in
    # tests/test_int8.py; OFF by default pending a chip win (PERF.md)
    int8_inference: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        c = self.channels
        common = dict(momentum=self.momentum, axis_name=self.axis_name)
        if self.aug_dropout > 0 and train:
            x = nn.Dropout(self.aug_dropout, deterministic=False)(x)
        x = ReluBatchNormTdnnLayer(
            c, context=(-2, -1, 0, 1, 2), name="layer1", **common
        )(x, train=train, mask=mask)
        i8 = self.int8_inference and not train
        x1 = SERes2Block(c, dilation=2, int8_inference=i8, name="layer2",
                         **common)(
            x, train=train, mask=mask
        )
        x2 = SERes2Block(c, dilation=3, int8_inference=i8, name="layer3",
                         **common)(
            x + x1, train=train, mask=mask
        )
        x3 = SERes2Block(c, dilation=4, int8_inference=i8, name="layer4",
                         **common)(
            x + x1 + x2, train=train, mask=mask
        )
        y = jnp.concatenate([x1, x2, x3], axis=-1)
        y = ReluBatchNormTdnnLayer(self.mfa_conv, int8_compute=i8,
                                   name="mfa", **common)(
            y, train=train, mask=mask
        )

        pp = dict(self.pooling_params or {})
        if self.pooling == "ecpa-attentive":
            # NOTE: momentum deliberately not forwarded — the reference
            # builds the pooling's internal BN with torch defaults
            # (momentum 0.1), not the ecapa-wide bn_params
            # (ecapa_tdnn_xvector.py:276-285: bn dict never passed).
            stats = EcapaAttentiveStatsPool(
                bottleneck=pp.get("hidden_size", 128),
                time_attention=pp.get("time_attention", True),
                name="stats",
                axis_name=self.axis_name,
            )(y, train=train, mask=mask)
        else:
            pool_cls = POOLINGS[self.pooling]
            pool = pool_cls(**pp, name="stats")
            if self.pooling in ("mqmha", "mqmha-linear"):
                stats = pool(y, mask=mask, train=train)
            else:
                stats = pool(y, mask=mask)
        stats = BatchNorm(name="bn_stats", **common)(stats, train=train)

        h = stats
        if self.fc1:
            fc1_affine = nn.Dense(self.embd_dim, name="fc1_affine")
            z1 = fc1_affine(h)
            if position == "far":
                return z1
            z1 = jax.nn.relu(z1)
            h = BatchNorm(name="fc1_bn", **common)(z1, train=train)
        elif position == "far":
            raise ValueError("position='far' requires fc1=True")
        fc2_affine = nn.Dense(self.embd_dim, name="fc2_affine")
        z = fc2_affine(h)
        if position == "near_affine":
            return z
        z = jax.nn.relu(z)
        z = BatchNorm(name="fc2_bn", **common)(z, train=train)
        if self.tail_dropout > 0 and train:
            z = nn.Dropout(self.tail_dropout, deterministic=False)(z)
        return z

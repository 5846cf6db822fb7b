"""ECAPA-TDNN, lawlict variant (parity: pytorch/model/ecapa-tdnn-xvector.py).

The reference ships TWO ECAPA implementations; this is the second one
(derived from github.com/lawlict/ECAPA-TDNN). It differs from the primary
`models.ecapa.EcapaTdnn` in real, checkpoint-visible ways:

* Res2 chain (`Res2Conv1dReluBn`, reference :20-55): the FIRST split is
  convolved and the LAST split passes through (the primary impl passes the
  first through); `scale-1` convs, conv -> relu -> bn with torch-default
  BN (momentum 0.1).
* SE gate (`SE_Connect`, reference :73-86): two Linear layers with a
  channels//s bottleneck (s=4), not the fixed-128 conv bottleneck.
* No MFA width change: `conv` keeps cat_channels -> cat_channels
  (reference :206-208), with bias, vs the primary's 1536-wide MFA.
* Attentive pooling (`AttentiveStatsPool`, reference :120-135): tanh (no
  relu/BN) bottleneck, NO global-context [x; mean; std] input, std clamped
  at 1e-9.
* `bn_stats` uses torch-default momentum 0.1 (reference :215 builds a bare
  BatchNorm1d); only fc1/fc2 get the momentum-0.5 bn_params (:166-171).

The macro residual structure (reference forward :268-276: out2 =
layer2(out1) + out1; out3 = layer3(out1+out2) + out1+out2; ...) is
algebraically the same cumulative-sum scheme as the primary model once the
block residual is folded inside the block, which is how it is written here.

TPU-first: channels-last [B, T, C], everything masked for length-bucketed
batches, static python loop over the res2 splits (XLA fuses the 7 small
convs).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.norm import BatchNorm
from ..nn.pooling import POOLINGS
from ..nn.tdnn import ReluBatchNormTdnnLayer


class LawlictRes2Block(nn.Module):
    """Res2Conv1dReluBn (reference ecapa-tdnn-xvector.py:20-55).

    Splits channels into `scale` groups; groups 0..scale-2 are convolved
    hierarchically (group i's input adds the previous group's output), the
    LAST group passes through and is appended at the END of the concat.
    Each conv: bias=False, conv -> relu -> bn (torch-default BN).
    """

    channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        if self.channels % self.scale:
            raise ValueError(
                f"channels ({self.channels}) must be a multiple of "
                f"scale ({self.scale})"
            )
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        half_k = self.kernel_size // 2
        context = tuple(
            range(-half_k * self.dilation, half_k * self.dilation + 1, self.dilation)
        )
        parts = jnp.split(x, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(nums):
            sp = parts[i] if i == 0 else sp + parts[i]
            sp = ReluBatchNormTdnnLayer(
                width,
                context=context,
                use_bias=False,
                momentum=0.1,
                axis_name=self.axis_name,
                name=f"block_{i}",
            )(sp, train=train, mask=mask)
            outs.append(sp)
        if self.scale != 1:
            outs.append(parts[nums])
        return jnp.concatenate(outs, axis=-1)


class SEConnectLinear(nn.Module):
    """SE gate with a channels//s Linear bottleneck.

    Parity: SE_Connect (reference ecapa-tdnn-xvector.py:73-86).
    """

    s: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        c = x.shape[-1]
        if c % self.s:
            raise ValueError(f"channels {c} % s {self.s} != 0")
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            g = jnp.sum(x * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        else:
            g = jnp.mean(x, axis=-2)
        g = jax.nn.relu(nn.Dense(c // self.s, name="linear1")(g))
        g = jax.nn.sigmoid(nn.Dense(c, name="linear2")(g))
        return x * g[..., None, :]


class LawlictSERes2Block(nn.Module):
    """1x1 Conv1dReluBn -> Res2Conv1dReluBn -> 1x1 Conv1dReluBn -> SE,
    with the model-level residual folded in (see module docstring).

    Parity: SE_Res2Block (reference ecapa-tdnn-xvector.py:106-113) + the
    `+ out_prev` in the model forward (:268-276).
    """

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        common = dict(use_bias=False, momentum=0.1, axis_name=self.axis_name)
        y = ReluBatchNormTdnnLayer(self.channels, name="conv1", **common)(
            x, train=train, mask=mask
        )
        y = LawlictRes2Block(
            self.channels,
            scale=self.scale,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            axis_name=self.axis_name,
            name="res2net",
        )(y, train=train, mask=mask)
        y = ReluBatchNormTdnnLayer(self.channels, name="conv2", **common)(
            y, train=train, mask=mask
        )
        y = SEConnectLinear(name="se")(y, mask=mask)
        return y + x


class LawlictAttentiveStatsPool(nn.Module):
    """tanh-bottleneck attentive mean+std pooling, no global context.

    Parity: AttentiveStatsPool (reference ecapa-tdnn-xvector.py:120-135):
    alpha = softmax(linear2(tanh(linear1(x))), time); std clamp 1e-9.
    """

    bottleneck: int = 128

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        d = x.shape[-1]
        a = jnp.tanh(nn.Conv(self.bottleneck, (1,), name="linear1")(x))
        a = nn.Conv(d, (1,), name="linear2")(a)
        if mask is not None:
            a = jnp.where(mask[..., None], a, -jnp.inf)
        alpha = jax.nn.softmax(a, axis=-2)
        mean = jnp.sum(alpha * x, axis=-2)
        var = jnp.sum(alpha * x * x, axis=-2) - mean**2
        std = jnp.sqrt(jnp.maximum(var, 1e-9))
        return jnp.concatenate([mean, std], axis=-1)


class EcapaLawlict(nn.Module):
    """lawlict ECAPA-TDNN backbone -> speaker embedding.

    Parity: ECAPA_TDNN (reference pytorch/model/ecapa-tdnn-xvector.py:
    145-340). Positions: "near" = fc2 full layer (default), "near_affine" =
    fc2 affine only, "far" = fc1 affine (requires fc1=True) — reference
    extract_embedding :305-324.
    """

    channels: int = 512
    embd_dim: int = 192
    pooling: str = "ecpa-attentive"
    pooling_params: Any = None
    fc1: bool = False
    fc_momentum: float = 0.5  # default_fc_params bn momentum (reference :166)
    axis_name: Optional[str] = None
    aug_dropout: float = 0.0
    tail_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
    ) -> jax.Array:
        c = self.channels
        if self.aug_dropout > 0 and train:
            x = nn.Dropout(self.aug_dropout, deterministic=False)(x)
        h = ReluBatchNormTdnnLayer(
            c,
            context=(-2, -1, 0, 1, 2),
            use_bias=False,
            momentum=0.1,
            axis_name=self.axis_name,
            name="layer1",
        )(x, train=train, mask=mask)
        common = dict(scale=8, kernel_size=3, axis_name=self.axis_name)
        o2 = LawlictSERes2Block(c, dilation=2, name="layer2", **common)(
            h, train=train, mask=mask
        )
        o3 = LawlictSERes2Block(c, dilation=3, name="layer3", **common)(
            h + o2, train=train, mask=mask
        )
        o4 = LawlictSERes2Block(c, dilation=4, name="layer4", **common)(
            h + o2 + o3, train=train, mask=mask
        )
        y = jnp.concatenate([o2, o3, o4], axis=-1)
        # conv (WITH bias) -> relu -> bn_conv, width-preserving (ref :206-208)
        y = ReluBatchNormTdnnLayer(
            3 * c, momentum=0.1, axis_name=self.axis_name, name="mfa"
        )(y, train=train, mask=mask)

        pp = dict(self.pooling_params or {})
        if self.pooling == "ecpa-attentive":
            stats = LawlictAttentiveStatsPool(
                bottleneck=pp.get("hidden_size", 128), name="stats"
            )(y, mask=mask)
        else:
            pool_cls = POOLINGS[self.pooling]
            pool = pool_cls(**pp, name="stats")
            if self.pooling in ("mqmha", "mqmha-linear"):
                stats = pool(y, mask=mask, train=train)
            else:
                stats = pool(y, mask=mask)
        stats = BatchNorm(
            momentum=0.1, axis_name=self.axis_name, name="bn_stats"
        )(stats, train=train)

        hvec = stats
        if self.fc1:
            fc1_affine = nn.Dense(self.embd_dim, name="fc1_affine")
            z1 = fc1_affine(hvec)
            if position == "far":
                return z1
            z1 = jax.nn.relu(z1)
            hvec = BatchNorm(
                momentum=self.fc_momentum, axis_name=self.axis_name, name="fc1_bn"
            )(z1, train=train)
        elif position == "far":
            raise ValueError("position='far' requires fc1=True")
        fc2_affine = nn.Dense(self.embd_dim, name="fc2_affine")
        z = fc2_affine(hvec)
        if position == "near_affine":
            return z
        z = jax.nn.relu(z)
        z = BatchNorm(
            momentum=self.fc_momentum, axis_name=self.axis_name, name="fc2_bn"
        )(z, train=train)
        if self.tail_dropout > 0 and train:
            z = nn.Dropout(self.tail_dropout, deterministic=False)(z)
        return z

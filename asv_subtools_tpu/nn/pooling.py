"""Temporal pooling zoo (parity: pytorch/libs/nnet/pooling.py).

All poolings map frame-level features ``[B, T, D]`` (channels-last) to a
fixed vector ``[B, out_dim]``. Every pooling is masked: ``mask [B, T]``
(True = valid) makes padded length-bucketed batches exact, replacing the
reference's per-sample python loop over lengths (pooling.py:39-57) with one
vectorized masked reduction — the TPU-native equivalent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm
from .tdnn import ReluBatchNormTdnnLayer, TdnnAffine

_EPS = 1.0e-10


def _masked_moments(x, mask, unbiased=False, eps=_EPS):
    """Masked mean/std over the time axis. x [B, T, D], mask [B, T] or None."""
    if mask is None:
        count = jnp.asarray(float(x.shape[-2]))
        mean = jnp.mean(x, axis=-2)
        var_num = jnp.sum((x - mean[..., None, :]) ** 2, axis=-2)
    else:
        m = mask.astype(x.dtype)[..., None]
        count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        mean = jnp.sum(x * m, axis=-2) / count
        var_num = jnp.sum(((x - mean[..., None, :]) ** 2) * m, axis=-2)
    denom = jnp.maximum(count - 1.0, 1.0) if unbiased else count
    std = jnp.sqrt(jnp.maximum(var_num / denom, eps))
    return mean, std


class StatisticsPooling(nn.Module):
    """Mean [+ stddev] pooling (reference pooling.py:15-90)."""

    stddev: bool = True
    unbiased: bool = False
    eps: float = _EPS

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        mean, std = _masked_moments(x, mask, unbiased=self.unbiased, eps=self.eps)
        return jnp.concatenate([mean, std], axis=-1) if self.stddev else mean


class FreeStatisticsPooling(nn.Module):
    """Statistics over ALL frames unconditionally (reference
    pooling.py:24-92): unlike StatisticsPooling it IGNORES any mask —
    padded frames enter the mean/std exactly as the reference computes
    them. Only for bit-parity with reference models evaluated on padded
    batches; the masked variant is the correct default."""

    stddev: bool = True
    unbiased: bool = False
    eps: float = _EPS

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        mean, std = _masked_moments(x, None, unbiased=self.unbiased,
                                    eps=self.eps)
        return jnp.concatenate([mean, std], axis=-1) if self.stddev else mean


class LDEPooling(nn.Module):
    """Learnable dictionary encoding pooling (reference pooling.py:130-163).

    out_dim = input_dim * c_num.
    """

    c_num: int = 64
    eps: float = _EPS

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        d = x.shape[-1]
        mu = self.param("mu", nn.initializers.normal(1.0), (d, self.c_num))
        s = self.param("s", nn.initializers.ones, (self.c_num,))
        r = x[..., None] - mu  # [B, T, D, C]
        dist = jnp.sum(r * r, axis=-2, keepdims=True)  # [B, T, 1, C]
        logits = -(s**2 + self.eps) * dist
        w = jax.nn.softmax(logits, axis=-1)  # over dictionary components
        if mask is not None:
            m = mask.astype(x.dtype)[..., None, None]
            e = jnp.sum(w * r * m, axis=-3) / jnp.maximum(
                jnp.sum(m, axis=-3), 1.0
            )
        else:
            e = jnp.mean(w * r, axis=-3)  # [B, D, C]
        return e.reshape(e.shape[:-2] + (d * self.c_num,))


class XiVectorPooling(nn.Module):
    """Xi-vector Gaussian-posterior pooling (reference pooling.py:165-218).

    A small TDNN predicts per-frame log-precisions; the pooled embedding is
    the posterior mean given a learnable prior (mean, log-precision), i.e.
    a precision-weighted softmax over frames plus the prior pseudo-frame.
    """

    hidden_size: int = 256
    stddev: bool = False
    train_mean: bool = True
    train_prec: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        d = x.shape[-1]
        prior_mean = self.param("prior_mean", nn.initializers.zeros, (d,))
        prior_logprec = self.param("prior_logprec", nn.initializers.zeros, (d,))
        if not self.train_mean:
            prior_mean = jax.lax.stop_gradient(prior_mean)
        if not self.train_prec:
            prior_logprec = jax.lax.stop_gradient(prior_logprec)

        h = ReluBatchNormTdnnLayer(self.hidden_size, name="lin1_relu_bn")(
            x, train=train, mask=mask
        )
        logprec = TdnnAffine(d, name="lin2")(h)
        logprec = 2.0 * jnp.log(jax.nn.softplus(logprec) + _EPS)

        # Append the prior as one extra pseudo-frame, softmax over T+1.
        b_shape = x.shape[:-2]
        pm = jnp.broadcast_to(prior_mean, b_shape + (1, d))
        pl = jnp.broadcast_to(prior_logprec, b_shape + (1, d))
        feats = jnp.concatenate([x, pm], axis=-2)
        precs = jnp.concatenate([logprec, pl], axis=-2)
        if mask is not None:
            m = jnp.concatenate(
                [mask, jnp.ones(b_shape + (1,), mask.dtype)], axis=-1
            ).astype(bool)
            precs = jnp.where(m[..., None], precs, -jnp.inf)
        attn = jax.nn.softmax(precs, axis=-2)
        phi = jnp.sum(feats * attn, axis=-2)
        if self.stddev:
            sigma2 = jnp.sum(feats * feats * attn, axis=-2)
            sigma = jnp.sqrt(jnp.maximum(sigma2 - phi * phi, _EPS))
            return jnp.concatenate([phi, sigma], axis=-1)
        return phi


class AttentionAlphaComponent(nn.Module):
    """Frame attention weights alpha = softmax_T(v' f(Wx + b) [+ /t]).

    Parity: AttentionAlphaComponent (reference pooling.py:220-320): supports
    multi-head, split vs global input, shared vs full final affine, 1 or 2
    affine layers, and fixed/learnable per-head temperatures.

    Returns alpha with shape [B, T, num_head * final_dim].
    """

    num_head: int = 1
    split_input: bool = True
    share: bool = True
    affine_layers: int = 2
    hidden_size: int = 64
    context: Sequence[int] = (0,)
    use_bias: bool = True
    temperature: bool = False
    fixed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        input_dim = x.shape[-1]
        if self.num_head > 1 and self.split_input and input_dim % self.num_head:
            raise ValueError("input_dim must divide num_head when split_input")
        if self.share:
            final_dim = 1
        elif self.split_input:
            final_dim = input_dim // self.num_head
        else:
            final_dim = input_dim

        first_groups, last_groups = 1, 1
        if self.affine_layers == 2:
            hidden = self.hidden_size * self.num_head
            if self.num_head > 1:
                last_groups = self.num_head
                if self.split_input:
                    first_groups = self.num_head
            x_att = jax.nn.relu(
                TdnnAffine(
                    hidden,
                    context=self.context,
                    use_bias=self.use_bias,
                    groups=first_groups,
                    name="first_affine",
                )(x)
            )
        elif self.affine_layers == 1:
            if self.num_head > 1 and self.split_input:
                last_groups = self.num_head
            x_att = x
        else:
            raise ValueError("affine_layers must be 1 or 2")

        logits = TdnnAffine(
            final_dim * self.num_head,
            context=self.context,
            use_bias=self.use_bias,
            groups=last_groups,
            name="last_affine",
        )(x_att)  # [B, T, H*final]

        if self.num_head > 1 and self.temperature:
            if self.fixed:
                t = jnp.asarray(
                    [max(1.0, (i // 2) * 5.0) for i in range(self.num_head)],
                    logits.dtype,
                )
            else:
                t_raw = self.param(
                    "t", nn.initializers.zeros, (self.num_head,)
                )
                t = 1.0 + t_raw**2
            b, tlen = logits.shape[0], logits.shape[-2]
            logits = logits.reshape(b, tlen, self.num_head, -1) / t[:, None]
            logits = logits.reshape(b, tlen, -1)

        if mask is not None:
            logits = jnp.where(mask[..., None], logits, -jnp.inf)
        return jax.nn.softmax(logits, axis=-2)


def _attn_stats(x_heads, alpha_heads, stddev, stddev_attention, mask=None):
    """Weighted stats. x_heads/alpha_heads: [B, T, H, D_h] (alpha broadcasts)."""
    mean = jnp.sum(alpha_heads * x_heads, axis=-3)  # [B, H, D_h]
    if not stddev:
        return mean
    if stddev_attention:
        e2 = jnp.sum(alpha_heads * x_heads * x_heads, axis=-3)
        var = e2 - mean * mean
    else:
        diff = x_heads - mean[..., None, :, :]
        if mask is not None:
            m = mask[..., None, None].astype(x_heads.dtype)
            var = jnp.sum(diff * diff * m, axis=-3) / jnp.maximum(
                jnp.sum(m, axis=-3), 1.0
            )
        else:
            var = jnp.mean(diff * diff, axis=-3)
    std = jnp.sqrt(jnp.maximum(var, _EPS))
    return mean, std


class AttentiveStatisticsPooling(nn.Module):
    """Single-head attentive statistics pooling (reference pooling.py:322-369)."""

    affine_layers: int = 2
    hidden_size: int = 64
    context: Sequence[int] = (0,)
    stddev: bool = True
    stddev_attention: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        alpha = AttentionAlphaComponent(
            num_head=1,
            share=True,
            affine_layers=self.affine_layers,
            hidden_size=self.hidden_size,
            context=self.context,
            name="attention",
        )(x, mask=mask)  # [B, T, 1]
        mean = jnp.sum(alpha * x, axis=-2)
        if not self.stddev:
            return mean
        if self.stddev_attention:
            e2 = jnp.sum(alpha * x * x, axis=-2)
            var = e2 - mean * mean
        else:
            diff = x - mean[..., None, :]
            if mask is not None:
                m = mask.astype(x.dtype)[..., None]
                var = jnp.sum(diff * diff * m, axis=-2) / jnp.maximum(
                    jnp.sum(m, axis=-2), 1.0
                )
            else:
                var = jnp.mean(diff * diff, axis=-2)
        std = jnp.sqrt(jnp.maximum(var, _EPS))
        return jnp.concatenate([mean, std], axis=-1)


class MultiHeadAttentionPooling(nn.Module):
    """Split-input multi-head attentive stats (reference pooling.py:371-439).

    out_dim = 2 * input_dim (stddev) — heads partition the feature dim.
    """

    num_head: int = 4
    stddev: bool = True
    stddev_attention: bool = True
    share: bool = True
    affine_layers: int = 1
    hidden_size: int = 64
    temperature: bool = False
    fixed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        b, t, d = x.shape
        h = self.num_head
        alpha = AttentionAlphaComponent(
            num_head=h,
            split_input=True,
            share=self.share,
            affine_layers=self.affine_layers,
            hidden_size=self.hidden_size,
            use_bias=False,
            temperature=self.temperature,
            fixed=self.fixed,
            name="attention",
        )(x, mask=mask)
        alpha_h = alpha.reshape(b, t, h, -1)
        x_h = x.reshape(b, t, h, d // h)
        out = _attn_stats(x_h, alpha_h, self.stddev, self.stddev_attention, mask)
        if self.stddev:
            mean, std = out
            return jnp.concatenate(
                [mean.reshape(b, d), std.reshape(b, d)], axis=-1
            )
        return out.reshape(b, d)


class GlobalMultiHeadAttentionPooling(nn.Module):
    """Global multi-head attentive stats (reference pooling.py:441-514).

    Each head sees all features; out_dim = 2 * input_dim * num_head.
    """

    num_head: int = 4
    stddev: bool = True
    stddev_attention: bool = True
    share: bool = True
    affine_layers: int = 2
    hidden_size: int = 64
    temperature: bool = False
    fixed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        b, t, d = x.shape
        h = self.num_head
        alpha = AttentionAlphaComponent(
            num_head=h,
            split_input=False,
            share=self.share,
            affine_layers=self.affine_layers,
            hidden_size=self.hidden_size,
            use_bias=True,
            temperature=self.temperature,
            fixed=self.fixed,
            name="attention",
        )(x, mask=mask)
        alpha_h = alpha.reshape(b, t, h, -1)  # [B,T,H,1] or [B,T,H,D]
        x_h = x[..., None, :]  # [B, T, 1, D]
        out = _attn_stats(x_h, alpha_h, self.stddev, self.stddev_attention, mask)
        if self.stddev:
            mean, std = out
            return jnp.concatenate(
                [mean.reshape(b, h * d), std.reshape(b, h * d)], axis=-1
            )
        return out.reshape(b, h * d)


class MultiResolutionMultiHeadAttentionPooling(GlobalMultiHeadAttentionPooling):
    """Global multi-head attention with per-head temperatures.

    Parity: reference pooling.py:516-588 (temperature=True, fixed scales).
    """

    temperature: bool = True


class MQMHASP(nn.Module):
    """Multi-query multi-head attention statistics pooling.

    Parity: MQMHASP (reference pooling.py:590-702), after
    https://arxiv.org/pdf/2110.05042.pdf. out_dim = in_dim * num_q * 2.
    """

    num_q: int = 2
    num_head: int = 4
    hidden_size: int = 128
    stddev: bool = True
    share: bool = True
    affine_layers: int = 2
    time_attention: bool = False
    norm_type: str = "batch_norm"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        b, t, d = x.shape
        h, q = max(1, self.num_head), max(1, self.num_q)
        if d % h:
            raise ValueError("in_dim must be divisible by num_head")

        if self.time_attention:
            mean, std = _masked_moments(x, mask)
            reps = [x, jnp.broadcast_to(mean[..., None, :], x.shape)]
            if self.stddev:
                reps.append(jnp.broadcast_to(std[..., None, :], x.shape))
            # group per head: [B, T, H, (2|3) * d/h]
            parts = [r.reshape(b, t, h, d // h) for r in reps]
            x_in = jnp.concatenate(parts, axis=-1).reshape(b, t, -1)
        else:
            x_in = x

        att_odim = 1 if self.share else d // h
        if self.affine_layers == 2:
            hidd = self.hidden_size * h * q
            y = TdnnAffine(hidd, groups=h, name="att1")(x_in)
            y = jax.nn.relu(y)
            if self.norm_type == "batch_norm":
                y = BatchNorm(name="att_norm")(y, train=train, mask=mask)
            elif self.norm_type == "layer_norm":
                y = nn.GroupNorm(num_groups=h * q, name="att_norm")(y)
            else:
                raise ValueError(f"Unsupported norm type {self.norm_type}")
            y = jnp.tanh(y)
            logits = TdnnAffine(att_odim * h * q, groups=h * q, name="att2")(y)
        elif self.affine_layers == 1:
            logits = TdnnAffine(att_odim * h * q, groups=h, name="att1")(x_in)
        else:
            raise ValueError("affine_layers must be 1 or 2")

        if mask is not None:
            logits = jnp.where(mask[..., None], logits, -jnp.inf)
        alpha = jax.nn.softmax(logits, axis=-2)  # [B, T, H*Q*att_odim]
        alpha = alpha.reshape(b, t, h, q, -1)  # [..., 1 or d/h]
        x_h = x.reshape(b, t, h, 1, d // h)
        mean = jnp.sum(alpha * x_h, axis=-4)  # [B, H, Q, d/h]
        mean_flat = mean.reshape(b, -1)
        if self.stddev:
            e2 = jnp.sum(alpha * x_h * x_h, axis=-4)
            std = jnp.sqrt(jnp.maximum(e2 - mean * mean, _EPS))
            return jnp.concatenate([mean_flat, std.reshape(b, -1)], axis=-1)
        return mean_flat


class MQMHASPLinear(nn.Module):
    """Query-at-a-time MQMHASP (reference pooling.py:704-750)."""

    num_q: int = 2
    num_head: int = 4
    hidden_size: int = 128
    stddev: bool = True
    share: bool = True
    affine_layers: int = 2

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        outs = [
            MQMHASP(
                num_q=1,
                num_head=self.num_head,
                hidden_size=self.hidden_size,
                stddev=self.stddev,
                share=self.share,
                affine_layers=self.affine_layers,
                name=f"query_{i}",
            )(x, mask=mask, train=train)
            for i in range(max(1, self.num_q))
        ]
        return jnp.concatenate(outs, axis=-1)


POOLINGS = {
    "statistics": StatisticsPooling,
    "free-statistics": FreeStatisticsPooling,
    "lde": LDEPooling,
    "attentive": AttentiveStatisticsPooling,
    "multi-head": MultiHeadAttentionPooling,
    "global-multi": GlobalMultiHeadAttentionPooling,
    "multi-resolution": MultiResolutionMultiHeadAttentionPooling,
    "mqmha": MQMHASP,
    "mqmha-linear": MQMHASPLinear,
    "xi": XiVectorPooling,
}


def pooling_output_dim(name: str, input_dim: int, **kwargs) -> int:
    """Output dim of a pooling by name — mirrors reference get_output_dim()."""
    stddev = kwargs.get("stddev", True)
    if name == "statistics":
        return input_dim * (2 if stddev else 1)
    if name == "lde":
        return input_dim * kwargs.get("c_num", 64)
    if name == "xi":
        return input_dim * (2 if kwargs.get("stddev", False) else 1)
    if name in ("attentive", "multi-head"):
        return input_dim * (2 if stddev else 1)
    if name in ("global-multi", "multi-resolution"):
        return input_dim * kwargs.get("num_head", 4) * (2 if stddev else 1)
    if name in ("mqmha", "mqmha-linear"):
        return input_dim * kwargs.get("num_q", 2) * (2 if stddev else 1)
    raise ValueError(f"Unknown pooling {name!r}")

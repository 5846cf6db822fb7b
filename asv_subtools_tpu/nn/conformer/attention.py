"""Attention variants (parity: pytorch/libs/nnet/transformer/attention.py).

MultiHeadedAttention (:16), RelPositionMultiHeadedAttention (:157,
Transformer-XL with u/v biases), RoPESelfAttention (:255),
T5RelPositionBias (:310, bucketed learned bias), GAU (:394, gated
attention unit).

TPU-first: one fused qkv projection; [B, H, T, Dh] einsum attention on the
MXU; masks enter as additive -inf; everything static-shape.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .embedding import apply_rope, rel_position_encoding, rope_freqs

NEG_INF = -1.0e9


def _out_proj(module: nn.Module, d: int, h: jax.Array) -> jax.Array:
    """Attention output projection: Dense, or a kernel-3 SAME conv1d over
    time when conv_out (attention.py:43-45; applied at :113-114)."""
    if module.conv_out:
        return nn.Conv(d, (3,), padding="SAME", name="out")(h)
    return nn.Dense(d, name="out")(h)


def attention_normalize(
    module: nn.Module,
    scores_raw: jax.Array,
    mask: Optional[jax.Array],
    d_k: int,
    *,
    norm_method: str = "softmax",
    scale_adapt: bool = False,
    g_sa: bool = False,
    diag_mask: bool = False,
    train_len: float = 512.0,
) -> jax.Array:
    """AttentionNormalize (attention.py:640-733), reference-exact.

    scores_raw is the UN-scaled q@k^T with any additive biases already at
    raw scale (the reference adds t5/gaussian priors before the 1/sqrt(d_k)
    normalize). Options:
      - scale_adapt: learned log-scale (init log(d_k^-0.5)) instead of the
        fixed 1/sqrt(d_k)
      - g_sa: learned gaussian locality prior -| |dis^2*omiga| - |bias| |
        added to the raw scores (attention.py:675-683)
      - diag_mask: mask out the diagonal (:691-692)
      - norm_method: softmax | relu_plus (relu(a)^2/len, arXiv:2202.10447)
        | softmax_plus (scores * log(len)/train_len with LEARNED
        log(train_len), kexue.fm/archives/8823)
    mask is boolean (True = keep), broadcastable to scores. Returns attn
    with invalid entries zeroed.
    """
    if g_sa:
        t1, t2 = scores_raw.shape[-2], scores_raw.shape[-1]
        omiga = module.param("g_sa_omiga", nn.initializers.constant(0.001), ())
        gbias = module.param("g_sa_bias", nn.initializers.constant(-0.001), (1,))
        qpos = jnp.arange(t2 - t1, t2)[:, None]
        kpos = jnp.arange(t2)[None, :]
        dis = ((kpos - qpos) ** 2).astype(scores_raw.dtype)
        prior = -jnp.abs(jnp.abs(dis * omiga) - jnp.abs(gbias))
        scores_raw = scores_raw + prior
    if scale_adapt:
        log_scale = module.param(
            "att_scale", nn.initializers.constant(math.log(d_k**-0.5)), ()
        )
        scores = scores_raw * jnp.exp(log_scale)
    else:
        scores = scores_raw / math.sqrt(d_k)
    if diag_mask:
        t1, t2 = scores.shape[-2], scores.shape[-1]
        off_diag = ~jnp.eye(t1, t2, dtype=bool)
        mask = off_diag if mask is None else jnp.logical_and(mask, off_diag)

    if norm_method == "softmax":
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
    else:
        if mask is not None:
            length = jnp.maximum(
                jnp.sum(mask, axis=-1, keepdims=True).astype(scores.dtype), 1.0
            )
        else:
            length = jnp.asarray(float(scores.shape[-1]), scores.dtype)
        if norm_method == "relu_plus":
            if mask is not None:
                scores = jnp.where(mask, scores, 0.0)
            attn = jax.nn.relu(scores) ** 2 / length
        elif norm_method == "softmax_plus":
            log_train_len = module.param(
                "train_len", nn.initializers.constant(math.log(train_len)), ()
            )
            scores = scores * (jnp.log(length) / log_train_len)
            if mask is not None:
                scores = jnp.where(mask, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)
        else:
            raise ValueError(f"unknown norm_method {norm_method!r}")
    if mask is not None:
        attn = jnp.where(mask, attn, 0.0)
    return attn


def _attend(q, k, v, mask, dropout_rate, deterministic, module, extra_score=None):
    """Scaled dot-product attention. q/k/v [B, H, T, Dh]; mask [B, 1, T, T]
    or [B, 1, 1, T] additive-compatible boolean (True = keep). extra_score
    (T5 bias) enters at RAW scale: the reference t5 module pre-multiplies by
    sqrt(d_k) which the subsequent normalize divides out (attention.py:38,
    135-137) — under scale_adapt the two no longer cancel, so we reproduce
    the raw-score formulation exactly."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if extra_score is not None:
        scores = scores + extra_score * math.sqrt(d_k)
    attn = attention_normalize(
        module, scores, mask, d_k,
        norm_method=module.norm_method, scale_adapt=module.scale_adapt,
        g_sa=module.g_sa, diag_mask=module.diag_mask,
        train_len=module.train_len,
    )
    if dropout_rate > 0.0 and not deterministic:
        attn = nn.Dropout(rate=dropout_rate, deterministic=False)(attn)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


class MultiHeadedAttention(nn.Module):
    """Standard MHA (attention.py:16-155)."""

    num_heads: int = 4
    dropout_rate: float = 0.0
    conv_out: bool = False  # out proj is a k=3 conv1d (attention.py:43-45)
    norm_method: str = "softmax"
    scale_adapt: bool = False
    g_sa: bool = False
    diag_mask: bool = False
    train_len: float = 512.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        pos_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
        extra_score: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        out = _attend(q, k, v, mask, self.dropout_rate, deterministic, self,
                      extra_score=extra_score)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return _out_proj(self, d, out)


class RelPositionMultiHeadedAttention(nn.Module):
    """Relative-position MHA with u/v biases (attention.py:157-253).

    rel_shift=False (default) mirrors the reference/wenet convention: the
    positional term matrix_bd = (q+v) @ pos^T uses ABSOLUTE key positions
    with pos_emb of length T and NO Transformer-XL rel-shift (the
    reference removed it, attention.py:246-249). rel_shift=True enables
    the true Transformer-XL alignment with a [2T-1] embedding.
    """

    num_heads: int = 4
    dropout_rate: float = 0.0
    rel_shift: bool = False
    conv_out: bool = False  # out proj is a k=3 conv1d (attention.py:43-45)
    norm_method: str = "softmax"
    scale_adapt: bool = False
    g_sa: bool = False
    diag_mask: bool = False
    train_len: float = 512.0

    @staticmethod
    def _rel_shift(x):
        """[B, H, T, 2T-1] -> [B, H, T, T]: out[q, k] = x[q, (T-1)-(q-k)]
        (Transformer-XL relative-index alignment, espnet formulation)."""
        b, h, t, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B, H, T, 2T]
        x = x.reshape(b, h, 2 * t, t)[:, :, 1:, :]  # drop first row
        return x.reshape(b, h, t, 2 * t - 1)[..., :t]

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        pos_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
        extra_score: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

        if pos_emb is None:
            if self.rel_shift:
                pos_emb = rel_position_encoding(t, d)
            else:
                from .embedding import sinusoid_table

                pos_emb = jnp.asarray(sinusoid_table(t, d))
        p = nn.Dense(d, use_bias=False, name="pos")(pos_emb)  # [P, D]
        p = p.reshape(-1, h, dh).transpose(1, 0, 2)  # [H, P, Dh]

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dh))
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dh))

        q_u = (q + u).transpose(0, 2, 1, 3)  # [B, H, T, Dh]
        q_v = (q + vb).transpose(0, 2, 1, 3)
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        bd = jnp.einsum("bhqd,hpd->bhqp", q_v, p)  # [B, H, T, P]
        if self.rel_shift:
            bd = self._rel_shift(bd)
        scores = ac + bd  # raw scale; normalize handles 1/sqrt(dh)
        if extra_score is not None:  # T5 relative bias (add_t5rel_bias)
            scores = scores + extra_score * math.sqrt(dh)
        attn = attention_normalize(
            self, scores, mask, dh,
            norm_method=self.norm_method, scale_adapt=self.scale_adapt,
            g_sa=self.g_sa, diag_mask=self.diag_mask, train_len=self.train_len,
        )
        if self.dropout_rate > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout_rate, deterministic=False)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return _out_proj(self, d, out)


class RoPESelfAttention(nn.Module):
    """Rotary-position self-attention (attention.py:255-308)."""

    num_heads: int = 4
    dropout_rate: float = 0.0
    rotary_value: bool = True
    conv_out: bool = False  # out proj is a k=3 conv1d (attention.py:43-45)
    norm_method: str = "softmax"
    scale_adapt: bool = False
    g_sa: bool = False
    diag_mask: bool = False
    train_len: float = 512.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        pos_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        cos, sin = rope_freqs(t, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if self.rotary_value:
            v = apply_rope(v, cos, sin)
        out = _attend(q, k, v, mask, self.dropout_rate, deterministic, self)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return _out_proj(self, d, out)


class T5RelPositionBias(nn.Module):
    """Bucketed learned relative-position bias (attention.py:310-392)."""

    num_buckets: int = 32
    max_distance: int = 128
    scale: float = 1.0

    @staticmethod
    def _bucket(rel, num_buckets, max_distance):
        """Reference-exact non-causal bucketing
        (attention.py:332-357 _relative_position_bucket): n = -(k - q);
        future keys (n < 0) take the upper half, |n| is bucketed linearly
        below num_buckets//4 and logarithmically up to max_distance. The
        diagonal (n == 0) lands in bucket 0."""
        half = num_buckets // 2
        n = -rel
        ret = jnp.where(n < 0, half, 0)
        n = jnp.abs(n)
        max_exact = half // 2
        val_if_large = max_exact + (
            jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
            / math.log(max_distance / max_exact)
            * (half - max_exact)
        ).astype(jnp.int32)
        val_if_large = jnp.minimum(val_if_large, half - 1)
        return ret + jnp.where(n < max_exact, n, val_if_large)

    @nn.compact
    def __call__(self, t: int) -> jax.Array:
        """Returns additive bias [1, 1, T, T]."""
        emb = self.param(
            "rel_bias", nn.initializers.normal(0.02), (self.num_buckets, 1)
        )
        qpos = jnp.arange(t)[:, None]
        kpos = jnp.arange(t)[None, :]
        buckets = self._bucket(kpos - qpos, self.num_buckets, self.max_distance)
        bias = emb[buckets, 0]  # [T, T]
        return (bias * self.scale)[None, None, :, :]


class GAU(nn.Module):
    """Gated attention unit (attention.py:394-520; FLASH paper) —
    single-head shared-key attention with per-dim query/key scaling,
    gated output. Replaces both attention and FFN in gau-mode encoders."""

    expansion_units: int = 512
    key_dim: int = 64
    dropout_rate: float = 0.0
    use_rope: bool = True
    conv_out: bool = False  # kernel-3 conv output proj (attention.py:437-441)
    norm_method: str = "softmax"
    scale_adapt: bool = False
    g_sa: bool = False
    diag_mask: bool = False
    train_len: float = 512.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        pos_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
        extra_score: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, t, d = x.shape
        e = self.expansion_units
        s = self.key_dim
        uv = nn.Dense(2 * e + s, name="uv")(x)
        uv = jax.nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        # per-dim scale/offset query & key from the shared base
        gamma = self.param("gamma", nn.initializers.normal(0.02), (2, s))
        beta = self.param("beta", nn.initializers.zeros, (2, s))
        q = base * gamma[0] + beta[0]
        k = base * gamma[1] + beta[1]
        if self.use_rope:
            cos, sin = rope_freqs(t, s)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        scores = jnp.einsum("bqd,bkd->bqk", q, k)  # raw scale
        if extra_score is not None:
            # T5 relative bias (GAU path: attention.py:574-576, raw scale
            # with the module's sqrt(d_k) factor)
            ex = extra_score[:, 0] if extra_score.ndim == 4 else extra_score
            scores = scores + ex * math.sqrt(s)
        m = None
        if mask is not None:
            m = mask[:, 0] if mask.ndim == 4 else mask
        attn = attention_normalize(
            self, scores, m, s,
            norm_method=self.norm_method, scale_adapt=self.scale_adapt,
            g_sa=self.g_sa, diag_mask=self.diag_mask, train_len=self.train_len,
        )
        if self.dropout_rate > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout_rate, deterministic=False)(attn)
        out = u * jnp.einsum("bqk,bke->bqe", attn, v)
        if self.conv_out:
            return nn.Conv(d, (3,), padding="SAME", name="out")(out)
        return nn.Dense(d, name="out")(out)

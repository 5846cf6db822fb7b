"""Transformer / Conformer encoders (parity:
pytorch/libs/nnet/transformer/{encoder.py, encoder_layer.py}).

TransformerEncoder (encoder.py:423), ConformerEncoder (:536) with macaron
feed-forward, conv module, rel/RoPE/abs/T5 positions, GAU mode, and the
RandomCombine layer-drop combiner (:834). Chunk masks for streaming
(mask.py) are provided in mask.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..activations import get_activation
from ..norm import BatchNorm
from .attention import (
    GAU,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    RoPESelfAttention,
    T5RelPositionBias,
)
from .convolution import ConvolutionModule
from .embedding import abs_position_encoding, rel_position_encoding
from .scaling import BasicNorm, activation_balancer
from .subsampling import SUBSAMPLINGS


def _make_norm(norm_type: str, name: str, train: bool = False):
    """Block-level norm factory (reference encoder_layer.py:178-197:
    layer_norm -> LayerNorm, batch_norm -> Trans_Bat, else BasicNorm; the
    ReConformer configs use norm_type="basic_norm"). Returns a callable
    `x -> normed x`. Trans_Bat (layer_norm.py:8-31) is a plain BatchNorm1d
    over the transposed [B, D, T] layout — channels-last that is simply a
    feature-axis BatchNorm with statistics over (B, T), padded frames
    included (the reference does not mask them)."""
    if norm_type == "batch_norm":
        bn = BatchNorm(momentum=0.1, epsilon=1e-5, name=name)
        return lambda h: bn(h, train=train)
    if norm_type == "basic_norm":
        return BasicNorm(name=name)
    if norm_type != "layer_norm":
        raise ValueError(f"unknown norm_type {norm_type!r}")
    return nn.LayerNorm(epsilon=1e-5, name=name)


class PositionwiseFeedForward(nn.Module):
    hidden_units: int = 2048
    dropout_rate: float = 0.1
    activation: str = "relu"
    use_balancer: bool = False  # ReConformer (positionwise_feed_forward.py:26-33)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        act = get_activation(self.activation)
        h = nn.Dense(self.hidden_units, name="w1")(x)
        if self.use_balancer:
            h = activation_balancer(h)
        h = act(h)
        if self.dropout_rate > 0 and not deterministic:
            h = nn.Dropout(self.dropout_rate, deterministic=False)(h)
        return nn.Dense(d, name="w2")(h)


class MultiLayeredConv1d(nn.Module):
    """Conv1d positionwise layer (multi_layer_conv.py:9-61)."""

    hidden_units: int = 2048
    kernel_size: int = 3
    dropout_rate: float = 0.1
    activation: str = "relu"
    use_balancer: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        act = get_activation(self.activation)
        h = nn.Conv(self.hidden_units, (self.kernel_size,), padding="SAME", name="w1")(x)
        if self.use_balancer:
            h = activation_balancer(h)
        h = act(h)
        if self.dropout_rate > 0 and not deterministic:
            h = nn.Dropout(self.dropout_rate, deterministic=False)(h)
        return nn.Conv(d, (self.kernel_size,), padding="SAME", name="w2")(h)


class Conv1dLinear(nn.Module):
    """Conv1d + Linear positionwise layer (multi_layer_conv.py:63-112):
    MultiLayeredConv1d with the second conv replaced by a linear."""

    hidden_units: int = 2048
    kernel_size: int = 3
    dropout_rate: float = 0.1
    activation: str = "relu"
    use_balancer: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        act = get_activation(self.activation)
        h = nn.Conv(self.hidden_units, (self.kernel_size,), padding="SAME", name="w1")(x)
        if self.use_balancer:
            h = activation_balancer(h)
        h = act(h)
        if self.dropout_rate > 0 and not deterministic:
            h = nn.Dropout(self.dropout_rate, deterministic=False)(h)
        return nn.Dense(d, name="w2")(h)


def _make_attention(att_type, pos_enc_type, heads, dropout, gau_units, gau_key,
                    name, norm_args=None, conv_out=False, rotary_value=True,
                    att_conv_out=False):
    # attention_norm_args (transformer_xvector.py:112-115; the shipped
    # voxceleb conformer launcher uses norm_method=softmax_plus)
    na = dict(norm_args or {})
    kw = {
        k: na[k]
        for k in ("norm_method", "scale_adapt", "g_sa", "diag_mask", "train_len")
        if k in na
    }
    if att_type == "gau":
        return GAU(
            expansion_units=gau_units, key_dim=gau_key, dropout_rate=dropout,
            use_rope=(pos_enc_type == "rot_pos"),
            conv_out=conv_out or att_conv_out,
            name=name, **kw,
        )
    # attention_conv_out (encoder.py:94, attention.py:43-45): the MHA-family
    # out projection becomes a k=3 conv1d. Unlike GAU, convfnn head blocks
    # do NOT force it (encoder.py:612-646 keeps the standard selfattn).
    if pos_enc_type == "rel_pos":
        return RelPositionMultiHeadedAttention(
            num_heads=heads, dropout_rate=dropout, conv_out=att_conv_out,
            name=name, **kw
        )
    if pos_enc_type == "rot_pos":
        return RoPESelfAttention(num_heads=heads, dropout_rate=dropout,
                                 rotary_value=rotary_value,
                                 conv_out=att_conv_out, name=name, **kw)
    return MultiHeadedAttention(num_heads=heads, dropout_rate=dropout,
                                conv_out=att_conv_out, name=name, **kw)


class ConformerBlock(nn.Module):
    """One conformer layer: 0.5*FF -> MHA -> Conv -> 0.5*FF -> norm.

    Parity: ConformerEncoderLayer (encoder_layer.py:140-337). With
    macaron=False and conv_module=False it degrades to a standard
    pre-norm transformer layer (TransformerEncoderLayer :13-139).
    """

    attention_heads: int = 4
    linear_units: int = 2048
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    pos_enc_type: str = "rel_pos"
    att_type: str = "multi"
    gau_units: int = 512
    gau_key: int = 64
    add_t5rel_bias: bool = False
    attention_norm_args: Any = None  # dict: norm_method/scale_adapt/g_sa/...
    macaron: bool = True
    use_cnn: bool = True
    cnn_kernel: int = 15
    normalize_before: bool = True
    concat_after: bool = False
    rotary_value: bool = True  # rotate v too (RoPESelfAttention default)
    attention_conv_out: bool = False  # k=3 conv1d attention out (encoder.py:94)
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    activation_type: str = "swish"
    cnn_norm_type: str = "layer_norm"  # reference cnn_module_norm default
    norm_type: str = "layer_norm"  # block norms: layer_norm | basic_norm
    use_balancer: bool = False  # ReConformer ActivationBalancer in ff/conv
    re_scale: bool = False  # learned residual-branch scales (ReConformer)
    causal_conv: bool = False  # causal conv module (streaming chunks)
    convfnn: bool = False  # conv-FFN head block (encoder convfnn_blocks)
    layer_dropout: float = 0.0  # stochastic-depth bypass (encoder_layer.py:80-87)
    re_layer: bool = False  # ReConformerEncoderLayer (encoder_layer.py:140-):
    # NO per-branch norms, full-scale macaron FF, and a final
    # balancer+BasicNorm; branch weights are Scaled* (folded at conversion)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        att_mask: Optional[jax.Array] = None,
        pad_mask: Optional[jax.Array] = None,
        pos_emb: Optional[jax.Array] = None,
        extra_score: Optional[jax.Array] = None,
        train: bool = False,
        warmup: jax.Array | float = 1.0,
    ) -> jax.Array:
        det = not train

        # zipformer-style layer bypass (encoder_layer.py:224-232, :331-333):
        # alpha = min(0.1+warmup, 1) with prob 1-layer_dropout else 0.1 in
        # training; the whole block blends x_out*alpha + x_in*(1-alpha).
        alpha = None
        if train:
            warmup_scale = jnp.minimum(0.1 + warmup, 1.0)
            if self.layer_dropout > 0.0:
                keep = (
                    jax.random.uniform(self.make_rng("dropout"), ())
                    <= 1.0 - self.layer_dropout
                )
                alpha = jnp.where(keep, warmup_scale, 0.1)
            else:
                alpha = warmup_scale
        x_orig = x

        def drop(h):
            if self.dropout_rate > 0 and train:
                return nn.Dropout(self.dropout_rate, deterministic=False)(h)
            return h

        def res_scale(name):
            if not self.re_scale:
                return 1.0
            return self.param(name, nn.initializers.ones, ())

        # ReConformer layers add macaron FF at FULL scale (encoder_layer
        # ReConformerEncoderLayer.forward: x = residual + dropout(ff(x)))
        ff_scale = 0.5 if (self.macaron and not self.re_layer) else 1.0

        def pre_norm(name, h):
            if self.re_layer or not self.normalize_before:
                return h
            return _make_norm(self.norm_type, name, train)(h)

        def post_norm(name, h):
            if self.re_layer or self.normalize_before:
                return h
            return _make_norm(self.norm_type, name, train)(h)
        # convfnn head blocks force a conv positionwise layer (gau mode: a
        # conv_out GAU instead) — encoder.py:612-646
        pw_type = self.positionwise_layer_type
        if self.convfnn and pw_type != "gau":
            pw_type = "conv1d"

        def apply_pw(h, name, att_mask=None):
            if pw_type == "gau":
                na = dict(self.attention_norm_args or {})
                kw = {
                    k: na[k]
                    for k in ("norm_method", "scale_adapt", "g_sa", "diag_mask",
                              "train_len")
                    if k in na
                }
                # GAU positionwise (get_gau_layer as FFN, encoder.py:262-270):
                # hidden = linear_units, called with the attention mask.
                # QUIRK: the reference builds positionwise GAUs through
                # get_positionwise_layer, which never forwards the model's
                # gau_key — its own default (64) always wins (encoder.py:
                # 158-169 passes 8 positionals + attention_norm_args only).
                return GAU(
                    expansion_units=self.linear_units, key_dim=64,
                    dropout_rate=self.dropout_rate,
                    use_rope=(self.pos_enc_type == "rot_pos"),
                    conv_out=self.convfnn, name=name, **kw,
                )(h, mask=att_mask, deterministic=det)
            if pw_type == "linear":
                return PositionwiseFeedForward(
                    hidden_units=self.linear_units, dropout_rate=self.dropout_rate,
                    activation=self.activation_type,
                    use_balancer=self.use_balancer, name=name,
                )(h, deterministic=det)
            cls = MultiLayeredConv1d if pw_type == "conv1d" else Conv1dLinear
            return cls(
                hidden_units=self.linear_units,
                kernel_size=self.positionwise_conv_kernel_size,
                dropout_rate=self.dropout_rate, activation=self.activation_type,
                use_balancer=self.use_balancer, name=name,
            )(h, deterministic=det)

        if self.macaron:
            res = x
            h = pre_norm("norm_ff_macaron", x)
            h = apply_pw(h, "ff_macaron", att_mask=att_mask)
            x = res + res_scale("scale_ff_macaron") * ff_scale * drop(h)
            x = post_norm("norm_ff_macaron", x)

        # self-attention
        res = x
        h = pre_norm("norm_mha", x)
        att = _make_attention(
            self.att_type, self.pos_enc_type, self.attention_heads,
            self.attention_dropout_rate, self.gau_units, self.gau_key, "self_attn",
            norm_args=self.attention_norm_args,
            conv_out=self.convfnn,  # convfnn gau blocks use conv_out GAUs
            rotary_value=self.rotary_value,
            att_conv_out=self.attention_conv_out,
        )
        if self.add_t5rel_bias:
            # per-LAYER learned bias: each reference attention layer owns
            # its own T5RelPositionBias (attention.py:38, no sharing)
            extra_score = T5RelPositionBias(name="t5_bias")(x.shape[1])
        if extra_score is not None:
            h_att = att(h, mask=att_mask, pos_emb=pos_emb, deterministic=det,
                        extra_score=extra_score)
        else:
            h_att = att(h, mask=att_mask, pos_emb=pos_emb, deterministic=det)
        if self.concat_after:
            x = res + nn.Dense(x.shape[-1], name="concat_linear")(
                jnp.concatenate([h, h_att], axis=-1)
            )
        else:
            x = res + res_scale("scale_mha") * drop(h_att)
        x = post_norm("norm_mha", x)

        if self.use_cnn:
            res = x
            h = pre_norm("norm_conv", x)
            h = ConvolutionModule(
                kernel_size=self.cnn_kernel, norm_type=self.cnn_norm_type,
                causal=self.causal_conv, use_balancer=self.use_balancer,
                re_module=self.re_layer, activation=self.activation_type,
                axis_name=self.axis_name, name="conv_module",
            )(h, mask=pad_mask, train=train)
            x = res + res_scale("scale_conv") * drop(h)
            x = post_norm("norm_conv", x)

        res = x
        h = pre_norm("norm_ff", x)
        h = apply_pw(h, "ff", att_mask=att_mask)
        x = res + res_scale("scale_ff") * ff_scale * drop(h)
        x = post_norm("norm_ff", x)

        if self.re_layer:
            # norm_final = BasicNorm(balancer(x)), ALWAYS applied
            # (ReConformerEncoderLayer.forward tail)
            x = BasicNorm(name="norm_final")(activation_balancer(x))
        elif self.use_cnn and self.normalize_before:
            x = _make_norm(self.norm_type, "norm_final", train)(x)
        if alpha is not None:
            x = alpha * x + (1.0 - alpha) * x_orig
        return x


def _random_pure_weights(rng, num, n, final_weight):
    """One-hot weights [num, n]: final layer with prob final_weight, else a
    uniform non-final layer (encoder.py _get_random_pure_weights)."""
    r1, r2 = jax.random.split(rng)
    nonfinal = jax.random.randint(r1, (num,), 0, n - 1)
    idx = jnp.where(jax.random.uniform(r2, (num,)) < final_weight, n - 1, nonfinal)
    return jax.nn.one_hot(idx, n)


def _random_mixed_weights(rng, num, n, final_weight, stddev):
    """softmax(N(0, stddev) + final_log_weight on the last column)
    (encoder.py _get_random_mixed_weights)."""
    final_log_weight = float(np.log(final_weight / (1.0 - final_weight) * (n - 1)))
    logprobs = jax.random.normal(rng, (num, n)) * stddev
    logprobs = logprobs.at[:, -1].add(final_log_weight)
    return jax.nn.softmax(logprobs, axis=1)


class RandomCombine(nn.Module):
    """Stochastic layer combination (encoder.py:834-1050; iterated-loss /
    Deja-Vu style): in TRAINING, combine the aux-layer outputs with
    randomized weights — with prob `pure_prob` a one-hot choice (final
    layer with prob `final_weight`, else a uniform non-final layer), else
    a softmax of noisy log-weights biased toward the final layer. Weights
    are drawn per FRAME (combiner_type="random_frame", reference
    forward_rand_frame) or per UTTERANCE ("random_layer",
    forward_rand_layer). In EVAL it returns the final layer's output
    (forward :899-903 — NOT an average)."""

    num_inputs: int
    combiner_type: str = "random_layer"
    final_weight: float = 0.5
    pure_prob: float = 0.333
    stddev: float = 2.0

    @nn.compact
    def __call__(self, layer_outputs: Sequence[jax.Array], train: bool = False):
        n = len(layer_outputs)
        if not train or n == 1:
            return layer_outputs[-1]
        b, t = layer_outputs[0].shape[0], layer_outputs[0].shape[1]
        num = b * t if self.combiner_type == "random_frame" else b
        rng = self.make_rng("dropout")
        r_pure, r_mix, r_sel = jax.random.split(rng, 3)
        if self.pure_prob <= 0.0:
            w = _random_mixed_weights(r_mix, num, n, self.final_weight, self.stddev)
        elif self.pure_prob >= 1.0:
            w = _random_pure_weights(r_pure, num, n, self.final_weight)
        else:
            p = _random_pure_weights(r_pure, num, n, self.final_weight)
            m = _random_mixed_weights(r_mix, num, n, self.final_weight, self.stddev)
            w = jnp.where(jax.random.uniform(r_sel, (num, 1)) < self.pure_prob, p, m)
        stacked = jnp.stack(layer_outputs, axis=0)  # [N, B, T, D]
        if self.combiner_type == "random_frame":
            w = w.reshape(b, t, n)
            return jnp.einsum("btn,nbtd->btd", w, stacked)
        return jnp.einsum("bn,nbtd->btd", w, stacked)


class ConformerEncoder(nn.Module):
    """Conformer encoder stack (encoder.py:536-683).

    Input [B, T, F] (+ mask) -> [B, T', attention_dim] (+ subsampled mask).
    combiner_type: norm | mfa (concat aux layers) | random_layer.
    """

    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    layer_dropout: float = 0.0  # stochastic-depth rate (encoder.py:436)
    input_layer: str = "conv2d"
    pos_enc_type: str = "rel_pos"
    att_type: str = "multi"
    gau_units: int = 512
    gau_key: int = 64
    add_t5rel_bias: bool = False
    attention_norm_args: Any = None  # dict: norm_method/scale_adapt/g_sa/...
    macaron: bool = True
    use_cnn: bool = True
    cnn_kernel: int = 15
    cnn_norm_type: str = "layer_norm"
    normalize_before: bool = True
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    convfnn_blocks: int = 0  # head blocks with conv positionwise (encoder.py:612)
    activation_type: str = "swish"
    combiner_type: str = "norm"
    aux_layer_period: int = 3
    aux_layer_start: int = 1
    static_chunk_size: int = 0  # >0: chunk-causal attention (streaming)
    left_chunk_size: int = -1
    use_dynamic_chunk: bool = False  # wenet dynamic-chunk training (mask.py:72)
    use_dynamic_left_chunk: bool = False
    concat_after: bool = False  # x + linear([x; att(x)]) (encoder_layer.py:86)
    rotary_value: bool = True  # rot_pos: rotate v as well (encoder.py:98)
    rope_abs_plus: bool = False  # rot_pos: add abs sinusoid PE too (embedding.py:193)
    attention_conv_out: bool = False  # k=3 conv1d attention out (encoder.py:94)
    re_scale: bool = False  # learned residual scales (our extension)
    re_layer: bool = False  # exact ReConformerEncoderLayer structure
    norm_type: str = "layer_norm"  # layer_norm | basic_norm (ReConformer)
    use_balancer: bool = False  # ActivationBalancer in ff/conv (ReConformer)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        warmup: jax.Array | float = 1.0,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        sub = SUBSAMPLINGS[self.input_layer](
            odim=self.attention_dim, dropout_rate=self.dropout_rate, name="embed"
        )
        h, mask = sub(x, mask=mask, deterministic=not train)
        t = h.shape[1]

        pos_emb = None
        if self.pos_enc_type == "abs_pos":
            h = abs_position_encoding(h)
        elif self.pos_enc_type == "rot_pos":
            # RoPositionalEncoding.forward scales x by sqrt(d) like abs_pos
            # (embedding.py:179-192); the rotation itself happens inside
            # RoPESelfAttention on q/k(/v). rope_abs_plus additionally adds
            # the standard absolute sinusoid table (embedding.py:193-196),
            # i.e. exactly abs_position_encoding.
            if self.rope_abs_plus:
                h = abs_position_encoding(h)
            else:
                h = h * float(np.sqrt(self.attention_dim))
        elif self.pos_enc_type == "rel_pos":
            # wenet RelPositionalEncoding scales x by sqrt(d); pos_emb is the
            # standard table at positions 0..T-1 (no XL rel-shift)
            from .embedding import sinusoid_table

            h = h * float(np.sqrt(self.attention_dim))
            pos_emb = jnp.asarray(sinusoid_table(t, self.attention_dim))

        pad_mask = mask
        from .mask import add_optional_chunk_mask

        chunk_rng = None
        if self.use_dynamic_chunk and train:
            chunk_rng = self.make_rng("dropout")
        att_mask = add_optional_chunk_mask(
            mask, t, self.static_chunk_size, self.left_chunk_size,
            use_dynamic_chunk=self.use_dynamic_chunk,
            use_dynamic_left_chunk=self.use_dynamic_left_chunk,
            rng=chunk_rng,
        )

        aux_outputs = []
        # reference get_combiner (encoder.py:322-349): aux taps start at
        # num_blocks // aux_layer_start (integer division — with the
        # unexposed default aux_layer_start=1 the range is EMPTY and only
        # the final layer is collected), step aux_layer_period, final
        # layer always appended.
        aux_layers = [
            i
            for i in range(
                self.num_blocks // self.aux_layer_start,
                self.num_blocks - 1,
                self.aux_layer_period,
            )
            if i != self.num_blocks - 1
        ]
        for i in range(self.num_blocks):
            h = ConformerBlock(
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                pos_enc_type=self.pos_enc_type,
                att_type=self.att_type,
                gau_units=self.gau_units,
                gau_key=self.gau_key,
                add_t5rel_bias=self.add_t5rel_bias,
                attention_norm_args=self.attention_norm_args,
                macaron=self.macaron,
                use_cnn=self.use_cnn,
                cnn_kernel=self.cnn_kernel,
                cnn_norm_type=self.cnn_norm_type,
                norm_type=self.norm_type,
                use_balancer=self.use_balancer,
                normalize_before=self.normalize_before,
                concat_after=self.concat_after,
                rotary_value=self.rotary_value,
                attention_conv_out=self.attention_conv_out,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                activation_type=self.activation_type,
                re_scale=self.re_scale,
                causal_conv=self.static_chunk_size > 0,
                convfnn=i < self.convfnn_blocks,
                re_layer=self.re_layer,
                layer_dropout=self.layer_dropout,
                axis_name=self.axis_name,
                name=f"block_{i}",
            )(h, att_mask=att_mask, pad_mask=pad_mask, pos_emb=pos_emb,
              train=train, warmup=warmup)
            if i in aux_layers or i == self.num_blocks - 1:
                aux_outputs.append(h)

        if self.combiner_type == "mfa":
            out = jnp.concatenate(aux_outputs, axis=-1)
        elif self.combiner_type in ("random_layer", "random_frame"):
            out = RandomCombine(
                num_inputs=len(aux_outputs), combiner_type=self.combiner_type,
                final_weight=0.5, pure_prob=0.333, stddev=2.0, name="combiner",
            )(aux_outputs, train=train)
        else:  # norm: the combiner returns the final layer (forward_norm)
            out = h
        # after_norm exists iff normalize_before or mfa (encoder.py:204-214)
        # and is applied to the COMBINED output — for mfa its width is
        # attention_dim * len(aux_layers).
        if self.normalize_before or self.combiner_type == "mfa":
            out = _make_norm(self.norm_type, "after_norm", train)(out)
        return out, mask


class TransformerEncoder(ConformerEncoder):
    """Plain transformer encoder (encoder.py:423-534): no macaron, no conv,
    abs positions, relu FFN."""

    pos_enc_type: str = "abs_pos"
    macaron: bool = False
    use_cnn: bool = False
    activation_type: str = "relu"

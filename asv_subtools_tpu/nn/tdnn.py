"""TDNN-family building blocks (parity: pytorch/libs/nnet/components.py).

TPU-first design
----------------
* Layout is channels-last ``[B, T, D]`` (the reference uses ``[B, D, T]``):
  XLA maps channels-last conv1d/matmuls directly onto the MXU, and the last
  axis aligns with the 128-lane register file.
* ``TdnnAffine`` with an evenly-spaced context (e.g. ``[-2, 0, 2]``) lowers
  to a dilated conv; an arbitrary context is a stack of shifted slices
  feeding one big matmul — never a scalar gather loop.
* The F-TDNN semi-orthogonal constraint (reference components.py:218-263)
  is a pure function over the parameter pytree applied between steps, not a
  mutation inside the module.
* Every module takes an optional ``mask [B, T]`` (True = valid frame) so
  padded buckets do not pollute BatchNorm statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .activations import get_activation
from .norm import BatchNorm


def _context_info(context: Sequence[int]) -> Tuple[bool, int, int]:
    """Return (evenly_spaced, dilation, kernel_size) for a sorted context."""
    ctx = list(context)
    if ctx != sorted(ctx):
        raise ValueError(f"context must be sorted, got {context}")
    if len(ctx) == 1:
        return True, 1, 1
    gaps = {ctx[i + 1] - ctx[i] for i in range(len(ctx) - 1)}
    if len(gaps) == 1:
        return True, gaps.pop(), len(ctx)
    return False, 1, len(ctx)


class TdnnAffine(nn.Module):
    """Affine over a temporal context: y_t = b + sum_i W_i x_{t+ctx_i}.

    Parity: reference TdnnAffine (pytorch/libs/nnet/components.py:20-155).
    ``pad=True`` keeps the frame count constant (zero padding at the edges,
    like the reference); ``pad=False`` shrinks T by (right-left) context.

    x: [B, T, D] -> [B, T', output_dim].
    """

    output_dim: int
    context: Sequence[int] = (0,)
    pad: bool = True
    stride: int = 1
    use_bias: bool = True
    groups: int = 1
    param_dtype: Any = jnp.float32
    # serving: run the ksize-1 channel-mix GEMM in dynamic int8 (s8xs8->s32
    # on the MXU at 2x bf16 rate); same param tree, quantized on the fly
    int8_compute: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ctx = tuple(self.context)
        even, dilation, ksize = _context_info(ctx)
        in_dim = x.shape[-1]
        if in_dim % self.groups != 0 or self.output_dim % self.groups != 0:
            raise ValueError("groups must divide input and output dims")

        if (
            self.int8_compute
            and even
            and ksize == 1
            and self.stride == 1
            and self.groups == 1
            and not self.is_initializing()
        ):
            from .int8 import dynamic_int8_dot

            p = self.get_variable("params", "conv")
            return dynamic_int8_dot(
                x, p["kernel"][0], p["bias"] if self.use_bias else None
            ).astype(x.dtype)

        if even:
            left, right = -ctx[0], ctx[-1]
            pad_arg = [(left, right)] if self.pad else [(0, 0)]
            y = nn.Conv(
                features=self.output_dim,
                kernel_size=(ksize,),
                strides=(self.stride,),
                kernel_dilation=(dilation,),
                padding=pad_arg,
                use_bias=self.use_bias,
                feature_group_count=self.groups,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
            return y

        # Irregular context: shifted slices -> one matmul on the MXU.
        left, right = -ctx[0], ctx[-1]
        t = x.shape[-2]
        if self.pad:
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(left, right), (0, 0)])
            t_out = t
        else:
            xp = x
            t_out = t - left - right
        cols = [
            jax.lax.dynamic_slice_in_dim(xp, c + left, t_out, axis=-2) for c in ctx
        ]
        stacked = jnp.concatenate(cols, axis=-1)  # [B, T', D*len(ctx)]
        y = nn.Dense(
            self.output_dim,
            use_bias=self.use_bias,
            param_dtype=self.param_dtype,
            name="affine",
        )(stacked)
        if self.stride > 1:
            y = y[..., :: self.stride, :]
        return y


class ActivationBatchNorm(nn.Module):
    """[activation ->] BatchNorm (or the bn-relu order), as one block.

    Parity: _BaseActivationBatchNorm (reference components.py:337-433).
    """

    activation: Optional[str] = "relu"
    bn: bool = True
    bn_relu: bool = False  # True = bn before relu
    momentum: float = 0.1
    axis_name: Optional[str] = None
    special_init: bool = False
    # reference bn_params["affine"]: the snowdar-family default is False
    # (components.py default_tdnn_layer_params), ECAPA's is True
    affine: bool = True

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        act = get_activation(self.activation)
        bn_kw = dict(momentum=self.momentum, axis_name=self.axis_name,
                     use_scale=self.affine, use_bias=self.affine, name="bn")
        if self.bn_relu:
            if self.bn:
                x = BatchNorm(**bn_kw)(x, train=train, mask=mask)
            if act is not None:
                x = act(x)
        else:
            if act is not None:
                x = act(x)
            if self.bn:
                x = BatchNorm(**bn_kw)(x, train=train, mask=mask)
        return x


class ReluBatchNormTdnnLayer(nn.Module):
    """TdnnAffine + ReLU + BN — the standard x-vector layer.

    Parity: ReluBatchNormTdnnLayer (reference components.py:434-465).
    """

    output_dim: int
    context: Sequence[int] = (0,)
    activation: Optional[str] = "relu"
    bn: bool = True
    bn_relu: bool = False
    momentum: float = 0.1
    axis_name: Optional[str] = None
    pad: bool = True
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    int8_compute: bool = False
    bn_affine: bool = True

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        x = TdnnAffine(
            self.output_dim,
            context=self.context,
            pad=self.pad,
            stride=self.stride,
            groups=self.groups,
            use_bias=self.use_bias,
            int8_compute=self.int8_compute and not train,
            name="affine",
        )(x)
        return ActivationBatchNorm(
            activation=self.activation,
            bn=self.bn,
            bn_relu=self.bn_relu,
            momentum=self.momentum,
            axis_name=self.axis_name,
            affine=self.bn_affine,
            name="act_bn",
        )(x, train=train, mask=mask)


# ---------------------------------------------------------------------------
# F-TDNN: factorized TDNN with semi-orthogonal constraint
# ---------------------------------------------------------------------------


class FTdnnBlock(nn.Module):
    """Factorized TDNN block: bottleneck affine -> affine + ReLU + BN
    (+ scaled identity bypass).

    Parity: FTdnnBlock (reference components.py:168-215). The first factor
    carries the semi-orthogonal constraint, applied out-of-band via
    `apply_semi_orth_constraint` on the parameter pytree. `bypass_scale`
    adds `scale * input` after the BN (components.py:208-211) — only valid
    when input_dim == output_dim.
    """

    output_dim: int
    bottleneck_dim: int
    context_size: int = 0  # 0 => context [0]; else [-c, 0] then [0, c]
    bypass_scale: float = 0.0
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        identity = x
        c = self.context_size
        ctx1 = (-c, 0) if c > 0 else (0,)
        ctx2 = (0, c) if c > 0 else (0,)
        x = TdnnAffine(
            self.bottleneck_dim, context=ctx1, use_bias=False, name="factor1"
        )(x)
        x = TdnnAffine(self.output_dim, context=ctx2, use_bias=True, name="factor2")(x)
        x = jax.nn.relu(x)
        x = BatchNorm(momentum=self.momentum, axis_name=self.axis_name, name="bn")(
            x, train=train, mask=mask
        )
        if self.bypass_scale != 0.0:
            x = x + self.bypass_scale * identity
        return x


def semi_orth_objective(kernel: jax.Array) -> jax.Array:
    """||M M^T - scale*I||^2 diagnostic for a conv kernel [W, I, O]."""
    m = _kernel_to_matrix(kernel)
    p = m @ m.T
    scale = jnp.trace(p @ p) / jnp.maximum(jnp.trace(p), 1e-10)
    i = jnp.eye(p.shape[0], dtype=p.dtype)
    return jnp.sum((p - scale * i) ** 2)


def _kernel_to_matrix(kernel: jax.Array) -> jax.Array:
    """Conv kernel [W, I, O] -> matrix [O, W*I] (rows = output units)."""
    w, i, o = kernel.shape
    return kernel.reshape(w * i, o).T


def _matrix_to_kernel(m: jax.Array, shape: Tuple[int, int, int]) -> jax.Array:
    w, i, o = shape
    return m.T.reshape(w, i, o)


def semi_orth_update(kernel: jax.Array) -> jax.Array:
    """One step of Kaldi's floating-scale semi-orthogonal update.

    Parity: FTdnnBlock.get_semi_orth_weight (reference components.py:228-263):
      P = M M^T, scale^2 = tr(P P) / tr(P), M <- M - 4*alpha*(P - scale^2 I) M,
      alpha = update_speed / scale^2, update_speed 0.125 halved past
      ratio 1.02 and again past 1.1.

    Exact for gapless contexts (golden-tested vs the reference in
    test_train_parity.py). Deliberate deviation for gapped contexts
    (e.g. [-3, 0]): the reference applies the update to the RAW conv
    weight (components.py:236-237) whose masked taps hold never-trained
    random init values that leak into P; our kernels store real taps
    only, i.e. the clean Kaldi ConstrainOrthonormalInternal behavior.
    """
    shape = kernel.shape
    # f32 floor (bf16 training must not run the trace ratios in bf16), but
    # keep f64 when given f64 so the golden parity test stays tight
    compute_dtype = jnp.promote_types(kernel.dtype, jnp.float32)
    m = _kernel_to_matrix(kernel).astype(compute_dtype)
    if m.shape[0] > m.shape[1]:
        m = m.T
        transposed = True
    else:
        transposed = False
    p = m @ m.T
    trace_p = jnp.trace(p)
    trace_pp = jnp.trace(p @ p)
    scale2 = trace_pp / jnp.maximum(trace_p, 1e-10)
    d = p.shape[0]
    ratio = trace_pp * d / jnp.maximum(trace_p * trace_p, 1e-10)
    # reference components.py:230-252: base 0.125, HALVED once past 1.02
    # and again past 1.1 (slow down when far from orthonormal)
    update_speed = 0.125 * jnp.where(
        ratio > 1.1, 0.25, jnp.where(ratio > 1.02, 0.5, 1.0)
    )
    p = p - scale2 * jnp.eye(d, dtype=p.dtype)
    alpha = update_speed / jnp.maximum(scale2, 1e-10)
    m = m - 4.0 * alpha * (p @ m)
    if transposed:
        m = m.T
    return _matrix_to_kernel(m.astype(kernel.dtype), shape)


def apply_semi_orth_constraint(params: Any) -> Any:
    """Apply the semi-orth update to every FTdnnBlock factor1 kernel in a pytree.

    Call every 4th step while training (reference step_semi_orth
    components.py:218-226 applies it when step%4==0).
    """

    # flax param tree: {"factor1": {"conv": {"kernel": ...}}}
    def update(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "factor1" in keys and keys[-1] == "kernel" and leaf.ndim == 3:
            return semi_orth_update(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(update, params)


# ---------------------------------------------------------------------------
# SE blocks
# ---------------------------------------------------------------------------


class SEBlock(nn.Module):
    """Squeeze-and-excitation over time: scale channels by a gated global mean.

    Parity: SEBlock (reference components.py:565-598). x: [B, T, D].
    """

    ratio: int = 4
    inner_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        d = x.shape[-1]
        hidden = self.inner_dim if self.inner_dim is not None else d // self.ratio
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]
            s = jnp.sum(x * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        else:
            s = jnp.mean(x, axis=-2)
        s = jax.nn.relu(nn.Dense(hidden, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(d, name="fc2")(s))
        return x * s[..., None, :]


class SEBlock2D(nn.Module):
    """SE over (T, F) maps for 2D backbones. x: [B, T, F, C].

    Parity: SEBlock_2D (reference components.py:600-640).
    """

    ratio: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2))
        s = jax.nn.relu(nn.Dense(max(1, c // self.ratio), name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(c, name="fc2")(s))
        return x * s[..., None, None, :]


# ---------------------------------------------------------------------------
# Misc components
# ---------------------------------------------------------------------------


class AdaptivePCMN(nn.Module):
    """Adaptive parametric cepstral mean normalization.

    Parity: AdaptivePCMN (reference components.py:501-563): y = alpha(x)*m_t
    + beta(x)*x with coefficients predicted from a left/right context window.
    """

    left_context: int = -10
    right_context: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        ctx = tuple(range(self.left_context, self.right_context + 1))
        n = len(ctx)
        # mean over the context window per frame
        pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(-self.left_context, self.right_context), (0, 0)])
        csum = jnp.cumsum(pad, axis=-2)
        csum = jnp.concatenate([jnp.zeros_like(csum[..., :1, :]), csum], axis=-2)
        t = x.shape[-2]
        window_mean = (
            jax.lax.dynamic_slice_in_dim(csum, n, t, axis=-2)
            - jax.lax.dynamic_slice_in_dim(csum, 0, t, axis=-2)
        ) / float(n)
        alpha = 1.0 + nn.tanh(TdnnAffine(d, context=ctx, name="alpha")(x))
        beta = -1.0 + nn.tanh(TdnnAffine(d, context=ctx, name="beta")(x))
        return alpha * x + beta * window_mean


class SoftmaxAffineLayer(nn.Module):
    """Affine + [log-]softmax head (reference components.py:310-336)."""

    output_dim: int
    log: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Dense(self.output_dim, name="affine")(x)
        return jax.nn.log_softmax(y, axis=-1) if self.log else jax.nn.softmax(y, axis=-1)


class GruAffine(nn.Module):
    """GRU over the time axis (reference GruAffine components.py:271-308).

    Implemented with nn.GRUCell under nn.scan — XLA turns the scan into a
    fused while-loop on device.
    """

    output_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cell = nn.GRUCell(features=self.output_dim, name="cell")
        scan = nn.RNN(cell, name="rnn")
        return scan(x)


class ImportantScale(nn.Module):
    """Per-feature learned scaling (reference ImportantScale components.py:479).

    y = (w**2 / max(w**2)) * x — a soft feature-importance gate.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (d,))
        s = w * w
        return x * (s / jnp.maximum(jnp.max(s), 1e-12))


class MultiAffine(nn.Module):
    """num_affine parallel affines averaged after a nonlinearity
    (reference MultiAffine components.py:642-689)."""

    output_dim: int
    num_affine: int = 2
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = get_activation(self.activation)
        outs = []
        for i in range(self.num_affine):
            y = nn.Dense(self.output_dim, name=f"affine_{i}")(x)
            outs.append(act(y) if act is not None else y)
        return sum(outs) / self.num_affine


class ChunkSeparationAffine(nn.Module):
    """Split the time axis into two halves processed by separate affines,
    then re-interleaved (reference ChunkSeparationAffine components.py:691).
    """

    output_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        t = x.shape[-2]
        half = t // 2
        a = nn.Dense(self.output_dim, name="first")(x[..., :half, :])
        b = nn.Dense(self.output_dim, name="second")(x[..., half:, :])
        return jnp.concatenate([a, b], axis=-2)


def mixup(
    x: jax.Array, rng: jax.Array, alpha: float = 1.0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batch mixup: returns (mixed_x, lam, permuted_index).

    Parity: Mixup (reference components.py:717-750) — lam ~ Beta(alpha, alpha),
    partner = randperm(batch). The caller mixes the loss with
    `lam * loss(y) + (1-lam) * loss(y[index])` (MixupLoss, loss.py:524).
    """
    k1, k2 = jax.random.split(rng)
    lam = jax.random.beta(k1, alpha, alpha)
    batch = x.shape[0]
    index = jax.random.permutation(k2, batch)
    mixed = lam * x + (1.0 - lam) * x[index]
    return mixed, lam, index

"""Classification losses for speaker/language recognition.

Parity: pytorch/libs/nnet/loss.py. Each loss is a flax module owning its
classifier weight; `__call__(embedding, targets, ...)` returns
``(loss, logits)`` where logits are the pre-margin scaled cosines (the
reference's `posterior`, used for accuracy reporting).

TPU notes: the cosine matmul [B, D] x [D, C] is the hot op and runs on the
MXU in fp32 (margin trig is numerically fragile in bf16 — the reference
forces fp32 under AMP at loss.py:300,654; we mirror that by upcasting).
Margin/lambda schedules are traced scalars so `step()` updates do not
retrigger compilation.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1.0e-10


def cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    label_smoothing: float = 0.0,
    reduction: str = "mean",
) -> jax.Array:
    """Standard CE over int targets, with label smoothing."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    num_classes = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def accuracy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32))


class SoftmaxLoss(nn.Module):
    """Affine + CE (reference loss.py:88-117); optional temperature."""

    num_targets: int
    t: float = 1.0
    label_smoothing: float = 0.0

    @nn.compact
    def __call__(
        self, embeddings: jax.Array, targets: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        logits = nn.Dense(self.num_targets, name="affine")(embeddings)
        loss = cross_entropy(logits / self.t, targets, self.label_smoothing)
        return loss, logits


class FocalLoss(nn.Module):
    """Focal loss (reference loss.py:162-189).

    The reference's NLLLoss reduction defaults to SUM, not mean."""

    num_targets: int
    gamma: float = 2.0
    reduction: str = "sum"

    @nn.compact
    def __call__(
        self, embeddings: jax.Array, targets: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        logits = nn.Dense(self.num_targets, name="affine")(embeddings)
        p = jax.nn.softmax(logits, axis=-1)
        logp = jnp.log(jnp.clip(p, _EPS))
        focal = (1.0 - p) ** self.gamma * logp
        nll = -jnp.take_along_axis(focal, targets[..., None], axis=-1)[..., 0]
        red = jnp.sum if self.reduction == "sum" else jnp.mean
        return red(nll), logits


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _at_least_f32(x):
    """fp32 island for margin trig (reference loss.py:300,654) — but keep
    f64 untouched so float64 parity tests stay f64 end-to-end."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class MarginSoftmaxLoss(nn.Module):
    """AM/AAM/SM1/SM2/SM3 margin softmax with the reference's extras.

    Parity: MarginSoftmaxLoss (reference loss.py:191-395): double margin,
    ring loss, MHE regularizer, inter loss, curricular component, and the
    `step(lambda_m, add_margin)` margin-warm hooks (as traced args).
    """

    num_targets: int
    m: float = 0.2
    s: float = 30.0
    t: float = 1.0
    method: str = "am"  # am | aam | sm1 | sm2 | sm3
    double: bool = False
    feature_normalize: bool = True
    mhe_loss: bool = False
    mhe_w: float = 0.01
    inter_loss: float = 0.0
    ring_loss: float = 0.0
    curricular: bool = False
    label_smoothing: float = 0.0
    eps: float = _EPS

    @nn.compact
    def __call__(
        self,
        embeddings: jax.Array,
        targets: jax.Array,
        train: bool = True,
        lambda_m: jax.Array | float = 1.0,
        margin_offset: jax.Array | float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        d = embeddings.shape[-1]
        c = self.num_targets
        weight = self.param("weight", nn.initializers.normal(0.01), (c, d))

        x32 = _at_least_f32(embeddings)
        w32 = _at_least_f32(weight)
        cos = _normalize(x32) @ _normalize(w32).T  # [B, C] fp32 on MXU

        cdt = cos.dtype  # >= f32 (the island's compute dtype; f64 under x64)
        if self.feature_normalize:
            scale = jnp.asarray(self.s, cdt)
        else:
            scale = jnp.linalg.norm(x32, axis=-1, keepdims=True)
        logits = scale * cos  # pre-margin: reported posterior

        if not train:
            return cross_entropy(logits, targets, self.label_smoothing), logits

        m = jnp.maximum(jnp.asarray(self.m, cdt) + margin_offset, 0.0)
        onehot = jax.nn.one_hot(targets, c, dtype=cdt)
        cos_t = jnp.sum(cos * onehot, axis=-1, keepdims=True)

        if self.method == "am":
            pen_t = cos_t - m
            cos_others = cos + m if self.double else cos
        elif self.method == "aam":
            pen_t = jnp.cos(jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) + m)
            cos_others = (
                jnp.cos(jnp.arccos(jnp.clip(cos, -1.0, 1.0)) - m)
                if self.double
                else cos
            )
        elif self.method == "sm1":
            pen_t = (1.0 + m) * cos_t - m
            cos_others = cos
        elif self.method == "sm2":
            pen_t = cos_t - (1.0 - cos_t**2) * m
            cos_others = cos
        elif self.method == "sm3":
            pen_t = cos_t - (1.0 - cos_t) ** 2 * m
            cos_others = cos
        else:
            raise ValueError(f"Unknown margin method {self.method!r}")

        lam = jnp.asarray(lambda_m, cdt)
        pen_t = lam * pen_t + (1.0 - lam) * cos_t
        if self.double:
            cos_others = lam * cos_others + (1.0 - lam) * cos

        if self.curricular:
            # CurricularFace: hard negatives (cos_j > pen_t) get cos_j*(t + cos_j).
            # Reference CurricularMarginComponent (loss.py:477-492,
            # momentum 0.01): t_new = (1-mom)*mean(cos_t) + mom*t_prev,
            # updated BEFORE the hard-example rescale uses it.
            t_buf = self.variable(
                "batch_stats", "curricular_t", lambda: jnp.zeros((), jnp.float32)
            )
            tv = 0.99 * jax.lax.stop_gradient(jnp.mean(cos_t)) + 0.01 * t_buf.value
            hard = cos_others > pen_t
            cos_others = jnp.where(hard, cos_others * (tv + cos_others), cos_others)
            t_buf.value = tv

        out = scale * jnp.where(onehot > 0, pen_t, cos_others)
        loss = cross_entropy(out / self.t, targets, self.label_smoothing)

        if self.ring_loss > 0:
            r = self.param("ring_r", nn.initializers.constant(20.0), ())
            loss = loss + self.ring_loss * jnp.mean((scale - r) ** 2) / 2.0
        if self.mhe_loss:
            # minimum hyperspherical energy over non-target class weights
            wn = _normalize(w32)
            wt = wn[targets]  # [B, D]
            d2 = jnp.sum((wn[None, :, :] - wt[:, None, :]) ** 2, axis=-1)  # [B, C]
            d2 = jnp.where(onehot > 0, jnp.inf, jnp.clip(d2, self.eps))
            energy = jnp.where(onehot > 0, 0.0, 1.0 / d2)
            loss = loss + self.mhe_w * jnp.sum(energy) / (
                targets.shape[0] * (c - 1)
            )
        if self.inter_loss > 0:
            p = jax.nn.softmax(scale * cos, axis=-1)
            p_t = jnp.sum(p * onehot, axis=-1)
            inter = jnp.log((jnp.sum(p, axis=-1) - p_t) / (c - 1) + self.eps)
            loss = loss + self.inter_loss * jnp.mean(inter)
        return loss, logits


class MarginSoftmaxLossV1(nn.Module):
    """Sub-center + inter-topK / batch-mean adaptive margin variant.

    Parity: MarginSoftmaxLoss_v1 (reference loss.py:562-730): sub_k
    sub-centers (max over k), topk/batch_mean adaptive inter-class margin,
    softmax or rectangle loss formulation.
    """

    num_targets: int
    sub_k: int = 1
    method: str = "am"  # am | aam
    m: float = 0.2
    adapt_method: Optional[str] = None  # topk | batch_mean | None
    ada_m: float = 0.1
    s: float = 30.0
    topk: int = 5
    lambda_bm: float = 0.1
    loss_type: str = "softmax"  # softmax | rectangle
    label_smoothing: float = 0.0
    eps: float = _EPS

    @nn.compact
    def __call__(
        self,
        embeddings: jax.Array,
        targets: jax.Array,
        train: bool = True,
        lambda_m: jax.Array | float = 1.0,
        margin_offset: jax.Array | float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        d = embeddings.shape[-1]
        c = self.num_targets
        k = max(1, self.sub_k)
        weight = self.param("weight", nn.initializers.normal(0.01), (c * k, d))

        x32 = embeddings.astype(jnp.float32)
        cos_sub = _normalize(x32) @ _normalize(weight.astype(jnp.float32)).T
        if k > 1:
            cos = jnp.max(cos_sub.reshape(-1, c, k), axis=-1)
        else:
            cos = cos_sub
        logits = self.s * cos

        if not train:
            return cross_entropy(logits, targets, self.label_smoothing), logits

        add_m = jnp.maximum(jnp.asarray(self.m, jnp.float32) + margin_offset, 0.0)
        ada_scale = self.ada_m / self.m
        onehot = jax.nn.one_hot(targets, c, dtype=jnp.float32)
        cos_t = jnp.sum(cos * onehot, axis=-1, keepdims=True)
        cos_n = jnp.where(onehot > 0, -jnp.inf, cos)

        if self.adapt_method == "topk":
            th = jax.lax.stop_gradient(
                jax.lax.top_k(cos_n, self.topk)[0][:, -1:]
            )
            hard = jax.lax.stop_gradient((cos_n >= th).astype(jnp.float32))
            hard_margin = ada_scale * add_m * hard
        elif self.adapt_method == "batch_mean":
            th = jax.lax.stop_gradient(jnp.mean(cos_t)) - self.lambda_bm
            hard = jax.lax.stop_gradient((cos_n >= th).astype(jnp.float32))
            hard_margin = ada_scale * add_m * hard - ada_scale * add_m / 2.0
        elif self.adapt_method is None:
            hard_margin = jnp.zeros_like(cos)
        else:
            raise ValueError(f"Unknown adapt_method {self.adapt_method!r}")

        if self.method == "am":
            pen_t = cos_t
            pen_n = cos_n + hard_margin + add_m
            pen = jnp.where(onehot > 0, pen_t, pen_n)
        else:  # aam
            pen_t = jnp.cos(jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) + add_m)
            if self.adapt_method:
                pen_n = jnp.cos(
                    jnp.arccos(jnp.clip(cos, -1.0, 1.0)) - hard_margin
                )
            else:
                pen_n = cos
            pen = jnp.where(onehot > 0, pen_t, pen_n)

        lam = jnp.asarray(lambda_m, jnp.float32)
        if self.loss_type == "softmax":
            pen = lam * pen + (1.0 - lam) * cos
            return (
                cross_entropy(self.s * pen, targets, self.label_smoothing),
                logits,
            )
        if self.loss_type == "rectangle":
            bs = targets.shape[0]
            pen_n_only = jnp.where(onehot > 0, -jnp.inf, pen)
            avg_nlog = jax.nn.logsumexp(self.s * pen_n_only) - math.log(bs)
            rect = jax.nn.softplus(
                -self.s * jnp.where(onehot > 0, pen, 0.0).sum(-1) + avg_nlog
            )
            loss = jnp.sum(rect) / bs
            ce = cross_entropy(self.s * cos, targets, self.label_smoothing)
            return (1.0 - lam) * ce + lam * loss, logits
        raise ValueError(f"Unsupported loss type {self.loss_type!r}")


class LogisticAffinityLoss(nn.Module):
    """Pairwise logistic affinity loss (reference loss.py:496-522)."""

    init_w: float = 5.0
    init_b: float = -1.0

    @nn.compact
    def __call__(
        self, embeddings: jax.Array, targets: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        w = self.param("w", nn.initializers.constant(self.init_w), ())
        b = self.param("b", nn.initializers.constant(self.init_b), ())
        e = _normalize(embeddings.astype(jnp.float32))
        scores = w * (e @ e.T) + b
        same = (targets[:, None] == targets[None, :]).astype(jnp.float32)
        sign = 2.0 * same - 1.0
        loss = -jnp.mean(jax.nn.log_sigmoid(sign * scores))
        return loss, scores


class OCSoftmax(nn.Module):
    """One-class softmax for anti-spoofing (reference loss.py:734-769).

    Labels follow the reference: bona fide -> 1, spoof -> 0.

    convention="reference" reproduces the shipped code exactly
    (loss.py:763-765): bona-fide center-cosines pushed BELOW r_real and
    spoof ABOVE r_fake. Note this is a latent defect — with r_fake <
    r_real those two constraints overlap on (r_fake, r_real), so the loss
    reaches ~0 with NO class separation (verified empirically: train loss
    0.08, eval EER at chance). convention="paper" is Zhang et al. (2021)
    eq. 8 as published: bona fide pushed ABOVE r_real, spoof BELOW
    r_fake, separated by construction; the bona-fide detection score is
    then the (positive) center cosine.
    """

    num_targets: int = 0  # unused (one-class); SpeakerNet plumbing compat
    r_real: float = 0.9
    r_fake: float = 0.2
    alpha: float = 20.0
    convention: str = "reference"  # reference | paper

    @nn.compact
    def __call__(
        self, embeddings: jax.Array, targets: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        d = embeddings.shape[-1]
        center = self.param(
            "center", nn.initializers.variance_scaling(0.25, "fan_in", "uniform"), (1, d)
        )
        x = _normalize(embeddings.astype(jnp.float32))
        w = _normalize(center.astype(jnp.float32))
        scores = (x @ w.T)[:, 0]
        is_real = targets == 1
        if self.convention == "paper":
            margin = jnp.where(
                is_real, self.r_real - scores, scores - self.r_fake
            )
        else:
            margin = jnp.where(
                is_real, scores - self.r_real, self.r_fake - scores
            )
        loss = jnp.mean(jax.nn.softplus(self.alpha * margin))
        return loss, scores[:, None]


def mixup_loss(loss_fn, logits_or_emb, targets, lam, index):
    """lam * loss(y) + (1-lam) * loss(y[index]) (reference MixupLoss loss.py:524)."""
    return lam * loss_fn(logits_or_emb, targets) + (1.0 - lam) * loss_fn(
        logits_or_emb, targets[index]
    )


class MarginWarm:
    """Margin warm-up schedule (reference loss.py:399-465).

    Between start_epoch and end_epoch the margin offset decays exponentially
    from `offset_margin` (usually negative) to 0, while lambda increases
    linearly from `init_lambda` to 1. Pure host-side schedule: returns
    (offset_margin, lambda_m) floats to feed as traced loss args.
    """

    def __init__(
        self,
        start_epoch: int,
        end_epoch: int,
        offset_margin: float = 0.0,
        init_lambda: float = 1.0,
        epoch_iter: Optional[int] = None,
    ):
        if end_epoch < start_epoch:
            raise ValueError("end_epoch must be >= start_epoch")
        if not 0.0 <= init_lambda <= 1.0:
            raise ValueError("init_lambda must be in [0, 1]")
        self.start_epoch = start_epoch
        self.end_epoch = end_epoch
        self.offset_margin = offset_margin
        self.init_lambda = init_lambda
        self.epoch_iter = epoch_iter
        if epoch_iter:
            self.update_step_range(epoch_iter, overwrite=True)

    def update_step_range(self, epoch_iter: int, overwrite: bool = False):
        if not overwrite and self.epoch_iter:
            raise ValueError("epoch_iter already set")
        self.epoch_iter = epoch_iter
        self.increase_start_iter = (self.start_epoch - 1) * epoch_iter
        self.fix_start_iter = (self.end_epoch - 1) * epoch_iter
        self.step_range = max(1, self.fix_start_iter - self.increase_start_iter)

    def step(self, cur_step: int) -> Tuple[float, float]:
        if not self.epoch_iter or self.epoch_iter < 0:
            raise ValueError("epoch_iter must be set before stepping")
        if cur_step >= self.fix_start_iter:
            return 0.0, 1.0
        if cur_step <= self.increase_start_iter:
            return self.offset_margin, self.init_lambda
        pos = cur_step - self.increase_start_iter
        ratio = math.exp((pos / self.step_range) * math.log(1e-3))
        lam = self.init_lambda + (pos / self.step_range) * (1.0 - self.init_lambda)
        return self.offset_margin * ratio, lam


class LambdaMAnneal:
    """A-softmax-style lambda annealing, the reference's step_params["m"]
    path (snowdar_xvector.py:355-357, 384-387):

      lambda_factor = max(lambda_0, lambda_b * (1 + gamma*step)^(-alpha))
      lambda_m      = 1 / (1 + lambda_factor)

    Same host-side interface as MarginWarm: step(cur_step) ->
    (margin_offset, lambda_m), so the Trainer accepts either."""

    def __init__(self, lambda_0: float = 0.0, lambda_b: float = 1000.0,
                 alpha: float = 5.0, gamma: float = 1e-4):
        self.lambda_0 = lambda_0
        self.lambda_b = lambda_b
        self.alpha = alpha
        self.gamma = gamma

    def step(self, cur_step: int) -> Tuple[float, float]:
        factor = max(
            self.lambda_0,
            self.lambda_b * (1.0 + self.gamma * cur_step) ** (-self.alpha),
        )
        return 0.0, 1.0 / (1.0 + factor)


LOSSES = {
    "softmax": SoftmaxLoss,
    "focal": FocalLoss,
    "margin_softmax": MarginSoftmaxLoss,
    "margin_softmax_v1": MarginSoftmaxLossV1,
    "logistic_affinity": LogisticAffinityLoss,
    "ocsoftmax": OCSoftmax,
}

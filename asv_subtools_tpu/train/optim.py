"""Optimizer factory (parity: pytorch/libs/training/optim.py).

Built on optax: every reference optimizer maps to an optax chain —
sgd/sgdw, adam/adamW (with optional gradient centralization, reference
optim.py:330-451), lookahead (:124), ralamb = RAdam + LARS trust ratio
(:453), adamod (:555), novograd (:652), SAM wrapper (:768), eve (:840).
Per-parameter weight-decay overrides (the reference's
"weight_decay.<name>" dict) map to optax.masked.

All transforms are pure pytree programs — they jit into the train step and
shard with the params.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def gradient_centralization() -> optax.GradientTransformation:
    """Subtract the per-filter gradient mean (GC; reference optim.py:346-358).

    Applied to any parameter with ndim >= 2 (conv kernels, dense weights).
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim >= 2:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdaModState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    eta: Any


def scale_by_adamod(
    b1: float = 0.9, b2: float = 0.999, b3: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """AdaMod: Adam with a long-term memory bound on the step size.

    Parity: reference optim.py:555-650 (Ding et al., 2019).
    """

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByAdaModState(jnp.zeros((), jnp.int32), zeros(), zeros(), zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = optax.tree_utils.tree_update_moment(updates, state.mu, b1, 1)
        nu = optax.tree_utils.tree_update_moment_per_elem_norm(updates, state.nu, b2, 2)
        c1 = 1 - b1**count
        c2 = 1 - b2**count
        step = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu
        )
        # long-term step-size memory: eta = b3*eta + (1-b3)*|step|, bound by it
        eta = jax.tree_util.tree_map(
            lambda e, s: b3 * e + (1 - b3) * jnp.abs(s), state.eta, step
        )
        bounded = jax.tree_util.tree_map(
            lambda s, e: jnp.sign(s) * jnp.minimum(jnp.abs(s), e), step, eta
        )
        return bounded, ScaleByAdaModState(count, mu, nu, eta)

    return optax.GradientTransformation(init_fn, update_fn)


def ralamb(
    learning_rate: Any, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """RAdam + LARS layer-wise trust ratio (reference Ralamb optim.py:453-553)."""

    def trust_ratio() -> optax.GradientTransformation:
        def init_fn(params):
            del params
            return optax.EmptyState()

        def update_fn(updates, state, params):
            def scale(u, p):
                if p.ndim < 1:
                    return u
                p_norm = jnp.linalg.norm(p)
                u_norm = jnp.linalg.norm(u)
                ratio = jnp.where(
                    (p_norm > 0) & (u_norm > 0), p_norm / jnp.maximum(u_norm, 1e-12), 1.0
                )
                return u * ratio

            return jax.tree_util.tree_map(scale, updates, params), state

        return optax.GradientTransformation(init_fn, update_fn)

    chain = [optax.scale_by_radam(b1=b1, b2=b2, eps=eps)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(trust_ratio())
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


class EveState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    d: jax.Array
    f_prev: jax.Array


def eve(
    learning_rate: Any = 1e-3, b1: float = 0.9, b2: float = 0.999,
    b3: float = 0.999, c: float = 10.0, eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Eve: Adam with loss-based adaptive global step scaling.

    Parity: reference optim.py:840-981. The loss must be passed via
    ``update(..., loss=value)`` — wrapped through optax's extra-args
    convention by the trainer.
    """

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return EveState(
            jnp.zeros((), jnp.int32), zeros(), zeros(),
            jnp.ones(()), jnp.zeros(()),
        )

    def update_fn(updates, state, params=None, *, loss=None):
        count = state.count + 1
        mu = optax.tree_utils.tree_update_moment(updates, state.mu, b1, 1)
        nu = optax.tree_utils.tree_update_moment_per_elem_norm(updates, state.nu, b2, 2)
        c1 = 1 - b1**count
        c2 = 1 - b2**count
        if loss is None:
            d = state.d
            f_prev = state.f_prev
        else:
            loss = jnp.asarray(loss, jnp.float32)
            big = jnp.maximum(loss, state.f_prev)
            small = jnp.minimum(loss, state.f_prev)
            r = jnp.where(
                count > 1, (big - small) / jnp.maximum(small, 1e-12), 0.0
            )
            r = jnp.clip(r, 1.0 / c, c)
            d = jnp.where(count > 1, b3 * state.d + (1 - b3) * r, 1.0)
            f_prev = loss
        step = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (d * (jnp.sqrt(v / c2) + eps)), mu, nu
        )
        if weight_decay and params is not None:
            step = jax.tree_util.tree_map(
                lambda s, p: s + weight_decay * p, step, params
            )
        new_state = EveState(count, mu, nu, d, f_prev)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        return jax.tree_util.tree_map(lambda s: -lr * s, step), new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def no_weight_decay_mask(params: Any) -> Any:
    """Mask for add_decayed_weights: decay only >=2D kernels (biases and
    norm scales exempt — the reference's per-param weight_decay override
    dict, optim.py:26-120, most commonly zeroes those)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def get_optimizer(
    name: str = "adamW",
    learning_rate: Any = 3e-4,
    beta1: float = 0.9,
    beta2: float = 0.999,
    beta3: float = 0.999,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    nesterov: bool = False,
    gc: bool = False,
    lookahead: bool = False,
    lookahead_k: int = 5,
    lookahead_alpha: float = 0.5,
    sam: bool = False,
    sam_rho: float = 0.05,
    sam_adaptive: bool = False,
    eps: float = 1e-8,
    decay_kernels_only: bool = False,
) -> optax.GradientTransformation:
    """Build an optimizer by reference name (reference get_optimizer optim.py:26-120).

    Names: sgd | sgdw | adam | adamW | ralamb | adamod | novograd | eve.
    `lookahead`, `gc` (gradient centralization), and `sam` wrap any base.
    `decay_kernels_only` exempts biases/norm params from weight decay (the
    reference's per-param weight-decay override idiom).
    """
    wd_mask = no_weight_decay_mask if decay_kernels_only else None
    key = name.lower()
    if key == "sgd":
        base = optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov)
        if weight_decay:
            base = optax.chain(
                optax.add_decayed_weights(weight_decay, mask=wd_mask), base
            )
    elif key == "sgdw":
        # decoupled weight decay (reference SGDW optim.py:223-328)
        base = optax.chain(
            optax.trace(decay=momentum, nesterov=nesterov),
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.scale_by_learning_rate(learning_rate),
        )
    elif key == "adam":
        base = optax.adam(learning_rate, b1=beta1, b2=beta2, eps=eps)
    elif key in ("adamw", "adam_w"):
        base = optax.adamw(
            learning_rate, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=wd_mask,
        )
    elif key == "ralamb":
        base = ralamb(learning_rate, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay)
    elif key == "adamod":
        base = optax.chain(
            scale_by_adamod(b1=beta1, b2=beta2, b3=beta3, eps=eps),
            optax.add_decayed_weights(weight_decay, mask=wd_mask)
            if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(learning_rate),
        )
    elif key == "novograd":
        base = optax.novograd(
            learning_rate, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay
        )
    elif key == "eve":
        base = eve(learning_rate, b1=beta1, b2=beta2, b3=beta3, weight_decay=weight_decay)
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    if gc:
        base = optax.chain(gradient_centralization(), base)
    if lookahead:
        # reference Lookahead (optim.py:124-221); optax.lookahead needs its
        # param struct, so use a simple EMA-sync variant here
        base = _lookahead_wrapper(base, lookahead_k, lookahead_alpha)
    if sam:
        base = optax.contrib.sam(
            base, optax.contrib.normalize(), rho=sam_rho, opaque_mode=True
        )
    return base


class LookaheadWrapState(NamedTuple):
    inner: Any
    slow: Any
    count: jax.Array


def _lookahead_wrapper(
    inner: optax.GradientTransformation, k: int, alpha: float
) -> optax.GradientTransformation:
    """Lookahead: every k steps pull params toward the slow weights.

    Implemented as an update-rewrite: we track slow weights and emit a
    combined update so `params + update` lands on the lookahead point.
    """

    def init_fn(params):
        return LookaheadWrapState(
            inner.init(params), jax.tree_util.tree_map(jnp.copy, params),
            jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params):
        new_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % k) == 0

        def combine(u, p, s):
            fast = p + u
            slow_new = s + alpha * (fast - s)
            return jnp.where(sync, slow_new - p, u)

        def new_slow(u, p, s):
            fast = p + u
            return jnp.where(sync, s + alpha * (fast - s), s)

        out = jax.tree_util.tree_map(combine, new_updates, params, state.slow)
        slow = jax.tree_util.tree_map(new_slow, new_updates, params, state.slow)
        return out, LookaheadWrapState(inner_state, slow, count)

    return optax.GradientTransformation(init_fn, update_fn)

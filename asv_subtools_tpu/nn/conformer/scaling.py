"""ReConformer ("reworked conformer") stabilization ops.

Parity: reference pytorch/libs/nnet/transformer/scaling.py
(ActivationBalancerFunction :30-100, DoubleSwish :378-415 — the k2/icefall
pruned_transducer_stateless2 recipe) and layer_norm.py BasicNorm (:82-160).

TPU-first: the balancer is pure gradient surgery (identity forward), so it
is a `jax.custom_vjp` — the forward pass fuses away entirely under XLA and
only the backward pass pays the per-channel statistics, which are cheap
reductions fused into the gradient computation.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def activation_balancer(
    x,
    channel_dim: int = -1,
    min_positive: float = 0.05,
    max_positive: float = 0.95,
    max_factor: float = 0.01,
    min_abs: float = 0.2,
    max_abs: float = 100.0,
):
    """Identity forward; backward nudges each channel toward having its
    pre-activation positive within [min_positive, max_positive] of the time
    and mean |x| within [min_abs, max_abs] (ActivationBalancerFunction).
    """
    return x


def _balancer_fwd(x, channel_dim, min_positive, max_positive, max_factor,
                  min_abs, max_abs):
    dim = channel_dim % x.ndim
    sum_dims = tuple(d for d in range(x.ndim) if d != dim)
    xgt0 = x > 0
    proportion_positive = jnp.mean(
        xgt0.astype(x.dtype), axis=sum_dims, keepdims=True
    )
    factor1 = (
        jax.nn.relu(min_positive - proportion_positive)
        * (max_factor / min_positive)
        if min_positive != 0.0
        else jnp.zeros_like(proportion_positive)
    )
    factor2 = (
        jax.nn.relu(proportion_positive - max_positive)
        * (max_factor / (max_positive - 1.0))
        if max_positive != 1.0
        else jnp.zeros_like(proportion_positive)
    )
    factor = factor1 + factor2
    mean_abs = jnp.mean(jnp.abs(x), axis=sum_dims, keepdims=True)
    below = mean_abs < min_abs
    above = mean_abs > max_abs
    return x, (factor, xgt0, below, above)


def _balancer_bwd(channel_dim, min_positive, max_positive, max_factor,
                  min_abs, max_abs, res, g):
    factor, xgt0, below, above = res
    dtype = g.dtype
    scale_factor = (
        (below.astype(dtype) - above.astype(dtype))
        * (xgt0.astype(dtype) - 0.5)
        * (max_factor * 2.0)
    )
    neg_delta_grad = jnp.abs(g) * (factor.astype(dtype) + scale_factor)
    return (g - neg_delta_grad,)


activation_balancer.defvjp(_balancer_fwd, _balancer_bwd)


class BasicNorm(nn.Module):
    """LayerNorm replacement: x * (mean(x^2) + exp(eps))^-0.5 with a
    learnable log-epsilon ballast (BasicNorm, layer_norm.py:82-160)."""

    eps: float = 0.25
    learn_eps: bool = True

    @nn.compact
    def __call__(self, x):
        init = lambda key: jnp.log(jnp.asarray(self.eps, jnp.float32))
        if self.learn_eps:
            log_eps = self.param("eps", init)
        else:
            log_eps = jnp.log(jnp.asarray(self.eps, x.dtype))
        scales = (
            jnp.mean(x * x, axis=-1, keepdims=True)
            + jnp.exp(log_eps).astype(x.dtype)
        ) ** -0.5
        return x * scales

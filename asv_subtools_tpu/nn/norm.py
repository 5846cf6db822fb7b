"""Normalization layers: masked, cross-replica-syncable BatchNorm.

The reference relies on torch BatchNorm1d/SyncBatchNorm
(pytorch/libs/nnet/components.py:337-433, libs/support/utils.py:414-421).
Here BatchNorm is a single masked implementation whose batch statistics can
be all-reduced across a mesh axis (`axis_name`) — SyncBN is just "give it the
data-parallel axis name" inside pjit/shard_map; XLA compiles the psum onto
ICI. Padded frames are excluded from the statistics via `mask`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _at_least_f32(x: jax.Array) -> jax.Array:
    """Upcast low-precision inputs to f32 for the statistics; keep f64
    untouched (float64 parity tests under jax_enable_x64)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class BatchNorm(nn.Module):
    """Masked BatchNorm over all axes except the last (features).

    Args:
      momentum: torch-style update rate (new = (1-m)*old + m*batch).
      axis_name: mesh axis to sync batch statistics across (SyncBN).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        if train:
            xf = _at_least_f32(x)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is not None:
                m = mask.astype(xf.dtype)[..., None]
                count = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=reduce_axes)
                s2 = jnp.sum(xf * xf * m, axis=reduce_axes)
            else:
                count = jnp.asarray(float(x.size // features))
                s1 = jnp.sum(xf, axis=reduce_axes)
                s2 = jnp.sum(xf * xf, axis=reduce_axes)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            if not self.is_initializing():
                m_ = self.momentum
                # torch uses the unbiased variance for the running estimate
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - m_) * ra_mean.value + m_ * mean
                ra_var.value = (1 - m_) * ra_var.value + m_ * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (_at_least_f32(x) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype or x.dtype)


class LayerNorm(nn.LayerNorm):
    pass

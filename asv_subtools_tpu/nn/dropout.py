"""Dropout variants (parity: pytorch/libs/nnet/dropout.py).

All are flax modules using the 'dropout' RNG collection; `train=False` is a
no-op. Layout is [B, T, D].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ContextDropout(nn.Module):
    """Drop whole frames (time steps) — reference dropout.py:13-29."""

    p: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if not train or self.p <= 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.p, x.shape[:-1] + (1,))
        return x * keep / (1.0 - self.p)


class RandomDropout(nn.Module):
    """Dropout whose rate is sampled uniformly in [0, p] per call.

    Parity: RandomDropout (reference dropout.py:31-79).
    """

    p: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if not train or self.p <= 0.0:
            return x
        r1, r2 = jax.random.split(self.make_rng("dropout"))
        rate = jax.random.uniform(r1, (), minval=0.0, maxval=self.p)
        keep = jax.random.bernoulli(r2, 1.0 - rate, x.shape)
        return x * keep / jnp.maximum(1.0 - rate, 1e-6)


class NoiseDropout(nn.Module):
    """Multiplicative uniform/gaussian noise (reference dropout.py:81-153)."""

    p: float = 0.1
    noise_type: str = "uniform"  # uniform | gaussian
    continuous: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if not train or self.p <= 0.0:
            return x
        rng = self.make_rng("dropout")
        if self.noise_type == "uniform":
            noise = jax.random.uniform(
                rng, x.shape, minval=-self.p, maxval=self.p
            )
        elif self.noise_type == "gaussian":
            noise = self.p * jax.random.normal(rng, x.shape)
        else:
            raise ValueError(f"Unknown noise type {self.noise_type!r}")
        return x * (1.0 + noise)


class SpecAugmentDropout(nn.Module):
    """SpecAugment-as-a-layer: random time/freq zero masks on [B, T, D].

    Parity: the frame/freq dropout layers (reference dropout.py:155-234)
    and the feature-level SpecAugment (pytorch/libs/egs/augmentation.py:21).
    """

    frequency: float = 0.2  # max fraction of feature bins to mask
    frame: float = 0.2  # max fraction of frames to mask
    rows: int = 1  # number of freq masks
    cols: int = 1  # number of time masks

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        if not train or (self.frequency <= 0 and self.frame <= 0):
            return x
        rng = self.make_rng("dropout")
        t, d = x.shape[-2], x.shape[-1]
        batch_shape = x.shape[:-2]

        def band_mask(key, size, max_frac, n_masks):
            """Multiplicative {0,1} mask [batch..., size] with n random bands."""
            out = jnp.ones(batch_shape + (size,), x.dtype)
            max_w = max(1, int(size * max_frac))
            keys = jax.random.split(key, 2 * n_masks)
            for i in range(n_masks):
                w = jax.random.randint(keys[2 * i], batch_shape, 0, max_w + 1)
                start = jax.random.randint(
                    keys[2 * i + 1], batch_shape, 0, max(1, size - max_w)
                )
                idx = jnp.arange(size)
                band = (idx >= start[..., None]) & (idx < (start + w)[..., None])
                out = out * (1.0 - band.astype(x.dtype))
            return out

        kf, kt = jax.random.split(rng)
        if self.frequency > 0:
            x = x * band_mask(kf, d, self.frequency, self.rows)[..., None, :]
        if self.frame > 0:
            x = x * band_mask(kt, t, self.frame, self.cols)[..., None]
        return x


DROPOUTS = {
    "default": nn.Dropout,
    "context": ContextDropout,
    "random": RandomDropout,
    "noise": NoiseDropout,
    "specaug": SpecAugmentDropout,
}

"""Input subsampling layers (parity:
pytorch/libs/nnet/transformer/subsampling.py:39-530).

linear (no subsampling), conv2d2 (SVConv2dSubsampling2), conv2d (4x),
conv2d6, conv2d8. NHWC layout: [B, T, F] -> conv over (T, F) -> flatten
freq into channels -> Dense to attention_dim. Masks are strided to the
subsampled rate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _subsample_mask(mask: Optional[jax.Array], t_out: int, factor: int, offset: int = 0):
    if mask is None:
        return None
    sub = mask[:, offset::factor]
    return sub[:, :t_out]


class LinearNoSubsampling(nn.Module):
    """Dense + LayerNorm, 1x rate (subsampling.py LinearNoSubsampling)."""

    odim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        x = nn.Dense(self.odim, name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.dropout_rate > 0 and not deterministic:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        return x, mask


class Conv2dSubsampling2(nn.Module):
    """1/2 rate: stride 2 over time only, then stride 1
    (SVConv2dSubsampling2, subsampling.py:365-384 — conv1 stride is (2,1),
    so frequency only loses the two 3-kernel margins: F' = F - 4)."""

    odim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, t, f = x.shape
        h = x[..., None]
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 1), padding="VALID", name="conv1")(h))
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(1, 1), padding="VALID", name="conv2")(h))
        b2, t2, f2, c = h.shape
        h = nn.Dense(self.odim, name="proj")(h.reshape(b2, t2, f2 * c))
        # time index map: t' = conv(3,s2) then conv(3,s1): t2 = ((t-1)//2 -2)
        return h, _subsample_mask(mask, t2, 2, offset=2)


class Conv2dSubsampling4(nn.Module):
    """1/4 rate: two stride-2 convs (wenet Conv2dSubsampling4)."""

    odim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h = x[..., None]
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", name="conv1")(h))
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", name="conv2")(h))
        b2, t2, f2, c = h.shape
        h = nn.Dense(self.odim, name="proj")(h.reshape(b2, t2, f2 * c))
        return h, _subsample_mask(mask, t2, 4, offset=6)


class Conv2dSubsampling6(nn.Module):
    """1/6 rate: stride-2 then stride-3 (Conv2dSubsampling6)."""

    odim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h = x[..., None]
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", name="conv1")(h))
        h = jax.nn.relu(nn.Conv(self.odim, (5, 5), strides=(3, 3), padding="VALID", name="conv2")(h))
        b2, t2, f2, c = h.shape
        h = nn.Dense(self.odim, name="proj")(h.reshape(b2, t2, f2 * c))
        return h, _subsample_mask(mask, t2, 6, offset=10)


class Conv2dSubsampling8(nn.Module):
    """1/8 rate: three stride-2 convs (Conv2dSubsampling8)."""

    odim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h = x[..., None]
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", name="conv1")(h))
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", name="conv2")(h))
        h = jax.nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", name="conv3")(h))
        b2, t2, f2, c = h.shape
        h = nn.Dense(self.odim, name="proj")(h.reshape(b2, t2, f2 * c))
        return h, _subsample_mask(mask, t2, 8, offset=14)


class ReConv2dSubsampling4(nn.Module):
    """1/4 rate, ReConformer flavor (ReConv2dSubsampling4,
    subsampling.py:150-250): three convs at channels 8/32/128 — the first
    stride-1 with padding 1, then two stride-2 VALID — each followed by a
    DoubleSwish (the interleaved ActivationBalancers shape gradients only
    and are forward-identity), then a projection (ScaledLinear, folded to a
    plain Dense by the converter), a fixed-eps BasicNorm and an output
    balancer. Same time map and mask striding as conv2d."""

    odim: int = 256
    dropout_rate: float = 0.1
    layer1_channels: int = 8
    layer2_channels: int = 32
    layer3_channels: int = 128

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        from ..activations import double_swish
        from .scaling import BasicNorm, activation_balancer

        h = x[..., None]
        h = nn.Conv(self.layer1_channels, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), name="conv1")(h)
        h = double_swish(activation_balancer(h))
        h = nn.Conv(self.layer2_channels, (3, 3), strides=(2, 2),
                    padding="VALID", name="conv2")(h)
        h = double_swish(activation_balancer(h))
        h = nn.Conv(self.layer3_channels, (3, 3), strides=(2, 2),
                    padding="VALID", name="conv3")(h)
        h = double_swish(activation_balancer(h))
        b2, t2, f2, c = h.shape
        h = nn.Dense(self.odim, name="proj")(h.reshape(b2, t2, f2 * c))
        h = BasicNorm(learn_eps=False, name="out_norm")(h)
        h = activation_balancer(h, -1, 0.45, 0.55)
        return h, _subsample_mask(mask, t2, 4, offset=6)


SUBSAMPLINGS = {
    "linear": LinearNoSubsampling,
    "conv2d2": Conv2dSubsampling2,
    "conv2d": Conv2dSubsampling4,
    "re_conv2d": ReConv2dSubsampling4,
    "conv2d6": Conv2dSubsampling6,
    "conv2d8": Conv2dSubsampling8,
}

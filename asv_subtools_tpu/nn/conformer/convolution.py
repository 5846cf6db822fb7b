"""Conformer convolution module (parity:
pytorch/libs/nnet/transformer/convolution.py).

pointwise conv (2x, GLU) -> depthwise conv -> norm -> swish -> pointwise.
Channels-last; the depthwise conv is a feature_group_count conv1d.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..norm import BatchNorm
from .scaling import BasicNorm, activation_balancer


class ConvolutionModule(nn.Module):
    kernel_size: int = 15
    norm_type: str = "batch_norm"  # batch_norm | layer_norm | basic_norm
    causal: bool = False
    momentum: float = 0.1
    axis_name: Optional[str] = None
    use_balancer: bool = False  # ReConformer (reference convolution.py:77-122)
    re_module: bool = False  # ReConvolutionModule (convolution.py:139-243):
    # balancers replace the norm entirely; activation is double_swish; the
    # ScaledConv1d weights fold into the plain convs at conversion time
    activation: str = "swish"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        d = x.shape[-1]
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        h = nn.Conv(2 * d, (1,), name="pointwise1")(x)
        if self.use_balancer:
            h = activation_balancer(
                h, -1, 0.05, 1.0, 0.01, 0.2, 10.0
            )
        h = nn.glu(h, axis=-1)
        if self.causal:
            pad = [(self.kernel_size - 1, 0)]
        else:
            pad = "SAME"
        h = nn.Conv(
            d, (self.kernel_size,), padding=pad, feature_group_count=d,
            name="depthwise",
        )(h)
        if self.re_module:
            # ReConvolutionModule: no norm between depthwise and the
            # activation — only the (forward-identity) balancer
            pass
        elif self.norm_type == "batch_norm":
            h = BatchNorm(momentum=self.momentum, axis_name=self.axis_name, name="norm")(
                h, train=train, mask=mask
            )
        elif self.norm_type == "basic_norm":
            h = BasicNorm(name="norm")(h)
        elif self.norm_type == "layer_norm":
            h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        else:
            raise ValueError(f"unknown norm_type {self.norm_type!r}")
        if self.use_balancer:
            h = activation_balancer(h, -1, 0.05, 1.0, 0.01, 0.2, 100.0)
        if self.activation == "double_swish":
            from ..activations import double_swish

            h = double_swish(h)
        else:
            h = h * jax.nn.sigmoid(h)  # swish
        h = nn.Conv(d, (1,), name="pointwise2")(h)
        if mask is not None:
            h = h * mask[..., None].astype(h.dtype)
        return h

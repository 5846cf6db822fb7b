"""Conformer/Transformer x-vector (parity: pytorch/model/transformer_xvector.py).

Conformer encoder -> transform_out (swish+LN layer to 1536) -> attentive
stats pooling -> fc2 embedding, matching the reference's default head
(transformer_xvector.py:92-260). The voxceleb recipe config is
6L-256D-4H with conv2d (4x) or conv2d2 (2x) subsampling.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.conformer import ConformerEncoder, TransformerEncoder
from ..nn.pooling import POOLINGS
from .ecapa import EcapaAttentiveStatsPool


class ConformerXvector(nn.Module):
    """Conformer speaker embedding model."""

    embd_dim: int = 256
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    input_layer: str = "conv2d"  # conv2d = 4x subsampling, conv2d2 = 2x
    pos_enc_type: str = "rel_pos"
    att_type: str = "multi"
    transformer_type: str = "conformer"  # conformer | transformer
    out_dim: int = 1536
    pooling: str = "ecpa-attentive"
    pooling_params: Any = None
    dropout_rate: float = 0.1
    combiner_type: str = "norm"
    encoder_params: Any = None  # extra ConformerEncoder kwargs (reference
    # transformer_params dict, transformer_xvector.py:92-140) — e.g. the
    # ReConformer set: {"norm_type": "basic_norm", "use_balancer": True,
    # "re_scale": True, "activation_type": "double_swish"}
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        position: str = "near",
        warmup: jax.Array | float = 1.0,
    ) -> jax.Array:
        re_defaults = {}
        if self.transformer_type == "re_conformer":
            # ReConformerEncoder (encoder.py:684-760): basic_norm +
            # balancers + double_swish, NO per-branch norms (re_layer),
            # post-norm-free stack (normalize_before=False asserted),
            # conv1d positionwise kernel 3. Scaled* weights fold into
            # plain kernels at conversion.
            enc_cls = ConformerEncoder
            re_defaults = {
                "norm_type": "basic_norm", "normalize_before": False,
                "use_balancer": True, "activation_type": "double_swish",
                "positionwise_conv_kernel_size": 3, "re_layer": True,
            }
        elif self.transformer_type == "conformer":
            enc_cls = ConformerEncoder
        else:
            enc_cls = TransformerEncoder
        enc = enc_cls(
            attention_dim=self.attention_dim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=self.num_blocks,
            dropout_rate=self.dropout_rate,
            input_layer=self.input_layer,
            pos_enc_type=self.pos_enc_type,
            att_type=self.att_type,
            combiner_type=self.combiner_type,
            axis_name=self.axis_name,
            name="transformer",
            **{**re_defaults, **dict(self.encoder_params or {})},
        )
        h, sub_mask = enc(x, mask=mask, train=train, warmup=warmup)

        # transform_out: affine + swish + LayerNorm (ln_replace default)
        h = nn.Dense(self.out_dim, name="transform_out_affine")(h)
        h = h * jax.nn.sigmoid(h)  # swish
        h = nn.LayerNorm(epsilon=1e-5, name="transform_out_norm")(h)

        pp = dict(self.pooling_params or {})
        if self.pooling == "ecpa-attentive":
            stats = EcapaAttentiveStatsPool(
                bottleneck=pp.get("hidden_size", 128),
                time_attention=pp.get("time_attention", False),
                norm_type=pp.get("norm_type", "layer_norm"),
                axis_name=self.axis_name,
                name="stats",
            )(h, train=train, mask=sub_mask)
        else:
            pool = POOLINGS[self.pooling](**pp, name="stats")
            if self.pooling in ("mqmha", "mqmha-linear", "xi"):
                stats = pool(h, mask=sub_mask, train=train)
            else:
                stats = pool(h, mask=sub_mask)
        stats = nn.LayerNorm(epsilon=1e-5, name="bn_stats")(stats)

        z = nn.Dense(self.embd_dim, name="fc2_affine")(stats)
        if position == "near_affine":
            return z
        z = jax.nn.relu(z)
        z = nn.LayerNorm(epsilon=1e-5, name="fc2_norm")(z)
        return z

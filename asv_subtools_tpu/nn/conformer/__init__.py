"""Transformer/Conformer encoder stack (wenet-style, TPU-native)."""

from .attention import (
    GAU,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    RoPESelfAttention,
    T5RelPositionBias,
)
from .convolution import ConvolutionModule
from .embedding import (
    abs_position_encoding,
    apply_rope,
    rel_position_encoding,
    rope_freqs,
    sinusoid_table,
)
from .encoder import (
    ConformerBlock,
    ConformerEncoder,
    MultiLayeredConv1d,
    PositionwiseFeedForward,
    RandomCombine,
    TransformerEncoder,
)
from .mask import add_optional_chunk_mask, make_pad_mask, subsequent_chunk_mask
from .subsampling import SUBSAMPLINGS

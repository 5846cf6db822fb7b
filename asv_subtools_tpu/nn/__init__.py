"""NN component library: TDNN blocks, pooling zoo, losses, norms, dropouts.

TPU-native re-design of pytorch/libs/nnet/ — channels-last [B, T, D],
masked everywhere, flax linen modules.
"""

from .activations import double_swish, get_activation, mish, swish
from .dropout import (
    DROPOUTS,
    ContextDropout,
    NoiseDropout,
    RandomDropout,
    SpecAugmentDropout,
)
from .loss import (
    LOSSES,
    FocalLoss,
    LogisticAffinityLoss,
    MarginSoftmaxLoss,
    MarginSoftmaxLossV1,
    LambdaMAnneal,
    MarginWarm,
    OCSoftmax,
    SoftmaxLoss,
    accuracy,
    cross_entropy,
    mixup_loss,
)
from .norm import BatchNorm, LayerNorm
from .pooling import (
    POOLINGS,
    AttentionAlphaComponent,
    AttentiveStatisticsPooling,
    GlobalMultiHeadAttentionPooling,
    LDEPooling,
    MQMHASP,
    MQMHASPLinear,
    MultiHeadAttentionPooling,
    MultiResolutionMultiHeadAttentionPooling,
    StatisticsPooling,
    XiVectorPooling,
    pooling_output_dim,
)
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101
from .tdnn import (
    ActivationBatchNorm,
    AdaptivePCMN,
    ChunkSeparationAffine,
    GruAffine,
    ImportantScale,
    MultiAffine,
    FTdnnBlock,
    ReluBatchNormTdnnLayer,
    SEBlock,
    SEBlock2D,
    SoftmaxAffineLayer,
    TdnnAffine,
    apply_semi_orth_constraint,
    mixup,
    semi_orth_objective,
    semi_orth_update,
)

"""Model zoo: x-vector family backbones + SpeakerNet training head.

Parity map (reference pytorch/model/):
  xvector.py            -> Xvector
  snowdar_xvector.py    -> SnowdarXvector (extend/skip/SE switchboard)
  extended_xvector.py   -> ExtendedXvector
  factored_xvector.py   -> FactoredXvector (F-TDNN, semi-orth)
  ecapa_tdnn_xvector.py -> EcapaTdnn
  ecapa-tdnn-xvector.py -> EcapaLawlict (the lawlict second impl)
  resnet_xvector.py     -> ResNetXvector
  repvgg_xvector.py     -> RepVggXvector
  transformer_xvector.py-> ConformerXvector (models/conformer.py)
"""

from .conformer import ConformerXvector
from .ecapa import EcapaTdnn
from .ecapa_lawlict import EcapaLawlict
from .framework import (
    SpeakerNet,
    chunk_utterance,
    count_params,
    extract_embedding_chunked,
    l2_norm,
)
from .multitask import (
    DALRegularizer,
    FDXvector,
    MultiTaskNet,
    MultiTaskXvector,
    fd_adversarial_loss,
    phone_frame_loss,
)
from .resnet_xvector import RepVggXvector, ResNetXvector
from .xvector import ExtendedXvector, FactoredXvector, SnowdarXvector, Xvector

MODELS = {
    "xvector": Xvector,
    "snowdar_xvector": SnowdarXvector,
    "extended_xvector": ExtendedXvector,
    "factored_xvector": FactoredXvector,
    "ecapa_tdnn": EcapaTdnn,
    "ecapa_lawlict": EcapaLawlict,
    "resnet_xvector": ResNetXvector,
    "repvgg_xvector": RepVggXvector,
    "conformer_xvector": ConformerXvector,
    "multi_task_xvector": MultiTaskXvector,
    "fd_xvector": FDXvector,
}

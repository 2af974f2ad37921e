from .transformer import (
    SelfAttention,
    TransformerBlock,
    Transformer,
    SequenceEncoder,
    time_positional_encoding,
)
from .convmixer import ConvMixer
from .vit import ViT
from .mlp import MLP
from .clip import CLIPModel, CLIPConfig
from .pretraining import MaskedLightCurveEncoder
from .clip_mlp import ClipMLPHead

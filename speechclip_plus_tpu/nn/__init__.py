from .attention import MultiheadAttention, dot_product_attention
from .dropout import FastDropout
from .mlp import MLPLayers
from .transformer import (
    MultiheadAttentionAndNorm,
    TransformerEncoder,
    TransformerEncoderLayer,
)

__all__ = [
    "MultiheadAttention",
    "dot_product_attention",
    "FastDropout",
    "MLPLayers",
    "TransformerEncoder",
    "TransformerEncoderLayer",
    "MultiheadAttentionAndNorm",
]

from .attention import MultiheadAttention, dot_product_attention
from .mlp import MLPLayers
from .transformer import (
    MultiheadAttentionAndNorm,
    TransformerEncoder,
    TransformerEncoderLayer,
)

__all__ = [
    "MultiheadAttention",
    "dot_product_attention",
    "MLPLayers",
    "TransformerEncoder",
    "TransformerEncoderLayer",
    "MultiheadAttentionAndNorm",
]

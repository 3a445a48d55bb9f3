from .layers import Conv, Linear, RMSNorm, AdaLayerNormZero, GroupNorm, LayerNorm
from .attention import dot_product_attention
from .embeddings import timestep_embedding, PatchEmbed
from .rope import apply_rope, rope_frequencies

__all__ = [
    "Conv",
    "Linear",
    "RMSNorm",
    "AdaLayerNormZero",
    "GroupNorm",
    "LayerNorm",
    "dot_product_attention",
    "timestep_embedding",
    "PatchEmbed",
    "apply_rope",
    "rope_frequencies",
]

"""Diffusion model families (flax.linen, NHWC, bf16-friendly)."""

from . import flops
from .image_transformer_v2 import (
    GlobalAttentionSpec,
    ImageTransformerDenoiserModelV2,
    LevelSpec,
    MappingSpec,
    NeighborhoodAttentionSpec,
    NoAttentionSpec,
    ShiftedWindowAttentionSpec,
)
from .image_transformer_v1 import ImageTransformerDenoiserModelV1
from .image_v1 import ImageDenoiserModelV1

__all__ = [
    "ImageDenoiserModelV1",
    "ImageTransformerDenoiserModelV1",
    "ImageTransformerDenoiserModelV2",
    "GlobalAttentionSpec", "NeighborhoodAttentionSpec",
    "ShiftedWindowAttentionSpec", "NoAttentionSpec",
    "LevelSpec", "MappingSpec", "flops",
]

"""Diffusion model families (flax.linen, NHWC, bf16-friendly)."""

from .image_transformer_v2 import (
    GlobalAttentionSpec,
    ImageTransformerDenoiserModelV2,
    LevelSpec,
    MappingSpec,
    NeighborhoodAttentionSpec,
    NoAttentionSpec,
    ShiftedWindowAttentionSpec,
)

__all__ = [
    "ImageTransformerDenoiserModelV2",
    "GlobalAttentionSpec", "NeighborhoodAttentionSpec",
    "ShiftedWindowAttentionSpec", "NoAttentionSpec",
    "LevelSpec", "MappingSpec",
]

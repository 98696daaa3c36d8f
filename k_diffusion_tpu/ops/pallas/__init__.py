"""Hand-written Pallas TPU kernels (the NATTEN / FlashAttention-2
replacements; reference image_transformer_v2.py:343-443)."""

from .na2d import na2d, na2d_reference
from .flash import flash_attention
from .fused_ffn import fused_geglu_ffn

__all__ = ["na2d", "na2d_reference", "flash_attention", "fused_geglu_ffn"]

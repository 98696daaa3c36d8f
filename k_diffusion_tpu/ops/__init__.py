"""Compute ops for the TPU framework: fused-friendly norm/activation/RoPE
primitives (XLA fuses these elementwise chains into the surrounding matmuls,
replacing the reference's torch.compile-wrapped kernels) and the attention
family (Pallas kernels with XLA fallbacks)."""

from .norms import rms_norm, scale_for_cosine_sim
from .geglu import linear_geglu
from . import rope
from .rope import (
    apply_rotary_emb,
    axial_rope_freqs,
    axial_rope_theta,
    bounding_box,
    centers,
    downscale_pos,
    make_axial_pos,
)
from . import pallas
from .attention import (
    global_attention,
    neighborhood_attention,
    neighborhood_mask_1d,
    shifted_window_attention,
    make_shifted_window_masks,
    window_partition,
    window_unpartition,
)

__all__ = [
    "rms_norm", "scale_for_cosine_sim", "linear_geglu",
    "apply_rotary_emb", "axial_rope_freqs", "bounding_box", "centers",
    "downscale_pos", "make_axial_pos",
    "pallas",
    "global_attention", "neighborhood_attention", "neighborhood_mask_1d",
    "shifted_window_attention", "make_shifted_window_masks",
    "window_partition", "window_unpartition",
]

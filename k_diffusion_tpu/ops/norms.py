"""Normalization primitives.

Behavior parity: reference image_transformer_v2.py:98-121 (rms_norm,
scale_for_cosine_sim). The reference wraps these in torch.compile to fuse
them; under jax.jit XLA fuses the f32 upcast + rsqrt chain into the adjacent
matmuls by construction, so these are plain functions.
"""

import jax.numpy as jnp
from jax import lax


def rms_norm(x, scale, eps=1e-6):
    """x * scale / rms(x) with the reduction in float32 regardless of the
    compute dtype (reference image_transformer_v2.py:98-103)."""
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    mean_sq = jnp.mean(lax.square(x.astype(dtype)), axis=-1, keepdims=True)
    scale = scale.astype(dtype) * lax.rsqrt(mean_sq + eps)
    return x * scale.astype(x.dtype)


def scale_for_cosine_sim(q, k, scale, eps=1e-6):
    """Normalizes q and k to norm sqrt(scale) per head (cosine-similarity
    attention with learned per-head scale; reference
    image_transformer_v2.py:106-114). ``scale`` must broadcast against the
    per-head rsqrt sums."""
    dtype = jnp.promote_types(q.dtype, jnp.float32)
    sum_sq_q = jnp.sum(lax.square(q.astype(dtype)), axis=-1, keepdims=True)
    sum_sq_k = jnp.sum(lax.square(k.astype(dtype)), axis=-1, keepdims=True)
    sqrt_scale = jnp.sqrt(scale.astype(dtype))
    scale_q = sqrt_scale * lax.rsqrt(sum_sq_q + eps)
    scale_k = sqrt_scale * lax.rsqrt(sum_sq_k + eps)
    return q * scale_q.astype(q.dtype), k * scale_k.astype(k.dtype)

"""Axial rotary position embeddings and position grids.

Behavior parity: reference image_transformer_v2.py:171-248 (half-split
rotation, fixed log-spaced freqs pi..10pi) and models/axial_rope.py:31-68
(centered position grid in an aspect-preserving [-1,1] bounding box).

The reference implements an in-place custom autograd Function for RoPE to
save memory (image_transformer_v2.py:202-231); under XLA the pure-functional
rotation is fused into the attention prologue and buffer reuse is handled by
the compiler, so no custom VJP is needed.
"""

import math

import jax.numpy as jnp


def apply_rotary_emb(x, theta, conj=False):
    """Rotates the first 2*theta.shape[-1] channels of x by theta
    (half-split convention: y1 = x1 cos - x2 sin, y2 = x2 cos + x1 sin)."""
    out_dtype = x.dtype
    dtype = jnp.promote_types(jnp.promote_types(x.dtype, theta.dtype), jnp.float32)
    d = theta.shape[-1]
    assert d * 2 <= x.shape[-1]
    x1, x2, x3 = x[..., :d], x[..., d:d * 2], x[..., d * 2:]
    x1, x2, theta = x1.astype(dtype), x2.astype(dtype), theta.astype(dtype)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    sin = -sin if conj else sin
    y1 = (x1 * cos - x2 * sin).astype(out_dtype)
    y2 = (x2 * cos + x1 * sin).astype(out_dtype)
    return jnp.concatenate([y1, y2, x3], axis=-1)


def axial_rope_freqs(dim, n_heads, dtype=jnp.float32):
    """Fixed log-spaced frequencies pi..10pi shared out across heads
    (reference image_transformer_v2.py:234-240). Returns (n_heads, dim//4)."""
    log_min = math.log(math.pi)
    log_max = math.log(10.0 * math.pi)
    freqs = jnp.exp(jnp.linspace(log_min, log_max, n_heads * (dim // 4) + 1, dtype=dtype)[:-1])
    return freqs.reshape(dim // 4, n_heads).T


def axial_rope_theta(pos, freqs):
    """pos (..., 2) x freqs (n_heads, d//4) -> theta (..., n_heads, d//2):
    h-axis angles then w-axis angles (reference image_transformer_v2.py:245-248)."""
    theta_h = pos[..., None, 0:1] * freqs.astype(pos.dtype)
    theta_w = pos[..., None, 1:2] * freqs.astype(pos.dtype)
    return jnp.concatenate([theta_h, theta_w], axis=-1)


def centers(start, stop, num, dtype=jnp.float32):
    """Midpoints of num equal subintervals of [start, stop]
    (reference axial_rope.py:31-33)."""
    edges = jnp.linspace(start, stop, num + 1, dtype=dtype)
    return (edges[:-1] + edges[1:]) / 2


def bounding_box(h, w, pixel_aspect_ratio=1.0):
    """Aspect-preserving [-1,1] bounding box (reference axial_rope.py:42-57)."""
    w_adj = w
    h_adj = h * pixel_aspect_ratio
    ar_adj = w_adj / h_adj
    y_min, y_max, x_min, x_max = -1.0, 1.0, -1.0, 1.0
    if ar_adj > 1:
        y_min, y_max = -1 / ar_adj, 1 / ar_adj
    elif ar_adj < 1:
        x_min, x_max = -ar_adj, ar_adj
    return y_min, y_max, x_min, x_max


def make_axial_pos(h, w, pixel_aspect_ratio=1.0, align_corners=False, dtype=jnp.float32):
    """(h, w, 2) grid of normalized positions (reference axial_rope.py:60-68,
    reshaped as used at image_transformer_v2.py:726)."""
    y_min, y_max, x_min, x_max = bounding_box(h, w, pixel_aspect_ratio)
    if align_corners:
        h_pos = jnp.linspace(y_min, y_max, h, dtype=dtype)
        w_pos = jnp.linspace(x_min, x_max, w, dtype=dtype)
    else:
        h_pos = centers(y_min, y_max, h, dtype=dtype)
        w_pos = centers(x_min, x_max, w, dtype=dtype)
    grid = jnp.stack(jnp.meshgrid(h_pos, w_pos, indexing="ij"), axis=-1)
    return grid


def downscale_pos(pos):
    """Mean-pools a (h, w, 2) position grid 2x2 (reference
    image_transformer_v2.py:52-54)."""
    h, w, e = pos.shape
    pos = pos.reshape(h // 2, 2, w // 2, 2, e)
    return pos.mean(axis=(1, 3))


def rotate_half_interleaved(x):
    """v1-style rotate-half on interleaved pairs (reference
    models/axial_rope.py:13-17)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    y = jnp.stack([-x2, x1], axis=-1)
    return y.reshape(x.shape)


def apply_rotary_emb_interleaved(freqs, t, start_index=0, scale=1.0):
    """v1-style RoPE: t*cos + rotate_half(t)*sin on interleaved pairs
    (reference models/axial_rope.py:20-28)."""
    freqs = freqs.astype(t.dtype)
    rot_dim = freqs.shape[-1]
    end_index = start_index + rot_dim
    assert rot_dim <= t.shape[-1]
    t_left = t[..., :start_index]
    t_mid = t[..., start_index:end_index]
    t_right = t[..., end_index:]
    t_mid = (t_mid * jnp.cos(freqs) * scale
             + rotate_half_interleaved(t_mid) * jnp.sin(freqs) * scale)
    return jnp.concatenate([t_left, t_mid, t_right], axis=-1)


def freqs_pixel_log_init(max_freq=10.0):
    """Log-spaced per-head frequency init for the learned v1 AxialRoPE
    (reference models/axial_rope.py:78-83)."""
    def init(key, shape, dtype=jnp.float32):
        log_min = math.log(math.pi)
        log_max = math.log(max_freq * math.pi / 2)
        freqs = jnp.linspace(log_min, log_max, shape[-1], dtype=dtype)
        return jnp.broadcast_to(freqs, shape)
    return init

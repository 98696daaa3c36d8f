"""Attention family: global, 2-D neighborhood (NATTEN-equivalent), and
shifted-window attention, in NHWC / (batch, seq, heads, head_dim) layouts.

These are the XLA reference paths; `k_diffusion_tpu.ops.pallas` provides the
hand-written TPU kernels (flash + sliding-window) that replace the reference's
FlashAttention-2 / NATTEN CUDA dependencies (reference
image_transformer_v2.py:343-476), with these functions as the correctness
spec (mirroring the reference's own fused/unfused dual paths).

All functions take an explicit ``scale`` (the HDiT uses cosine-similarity
attention with scale=1.0, the per-head learned scale having been folded into
q/k by ``scale_for_cosine_sim``).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def global_attention(q, k, v, scale=1.0):
    """Full attention. q/k/v: (batch, seq, heads, head_dim)."""
    return jax.nn.dot_product_attention(q, k, v, scale=scale)


@lru_cache
def neighborhood_mask_1d(n, kernel_size):
    """1-D NATTEN mask: query i attends to the size-``kernel_size`` window
    whose start is clamped inside [0, n - kernel_size] (so edge queries see a
    full window shifted inward, exactly NATTEN's semantics)."""
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    start = np.clip(i - (kernel_size - 1) // 2, 0, max(n - kernel_size, 0))
    # numpy (not jnp): the result is cached across jit traces, and a jnp
    # constant created inside one trace must not leak into another
    return (j >= start) & (j < start + kernel_size)


def neighborhood_attention(q, k, v, kernel_size, scale=1.0):
    """2-D neighborhood (sliding-window) attention, XLA fallback path.

    q/k/v: (batch, h, w, heads, head_dim). Each query attends to a
    kernel_size x kernel_size neighborhood, clamped at the edges. This is the
    masked-SDPA spec for the Pallas kernel (O(N^2) memory; fine for tests and
    small levels).
    """
    b, h, w, heads, e = q.shape
    mask_h = neighborhood_mask_1d(h, min(kernel_size, h))
    mask_w = neighborhood_mask_1d(w, min(kernel_size, w))
    mask = jnp.asarray(
        (mask_h[:, None, :, None] & mask_w[None, :, None, :]).reshape(h * w, h * w))
    qs = q.reshape(b, h * w, heads, e)
    ks = k.reshape(b, h * w, heads, e)
    vs = v.reshape(b, h * w, heads, e)
    out = jax.nn.dot_product_attention(qs, ks, vs, mask=mask[None, None], scale=scale)
    return out.reshape(b, h, w, heads, e)


def window_partition(x, window_size):
    """(b, h, w, ...) -> (b, h//ws, w//ws, ws*ws, ...) window sequences
    (reference image_transformer_v2.py:253-263)."""
    b, h, w = x.shape[:3]
    rest = x.shape[3:]
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, *rest)
    x = jnp.moveaxis(x, 2, 3)
    return x.reshape(b, h // ws, w // ws, ws * ws, *rest)

def window_unpartition(x, window_size):
    """Inverse of window_partition."""
    b, nh, nw, _ = x.shape[:4]
    rest = x.shape[4:]
    ws = window_size
    x = x.reshape(b, nh, nw, ws, ws, *rest)
    x = jnp.moveaxis(x, 3, 2)
    return x.reshape(b, nh * ws, nw * ws, *rest)


@lru_cache
def make_shifted_window_masks(n_h_w, n_w_w, w_h, w_w, shift):
    """Block-diagonal cross-window masks for shifted-window attention
    (reference image_transformer_v2.py:286-316): after rolling by ``shift``,
    the top row / left column of windows stitch together pixels from opposite
    image edges, which must not attend to each other. Returns
    (n_h_w, n_w_w, w_h*w_w, w_h*w_w) bool, True = may attend.
    Host-side numpy, constant-folded into the compiled program."""
    ph = np.arange(n_h_w)[:, None, None, None, None, None]
    pw = np.arange(n_w_w)[None, :, None, None, None, None]
    qh = np.arange(w_h)[None, None, :, None, None, None]
    qw = np.arange(w_w)[None, None, None, :, None, None]
    kh = np.arange(w_h)[None, None, None, None, :, None]
    kw = np.arange(w_w)[None, None, None, None, None, :]
    is_top_patch = ph == 0
    is_left_patch = pw == 0
    q_above = qh < shift
    k_above = kh < shift
    q_left = qw < shift
    k_left = kw < shift
    m_corner = is_left_patch & is_top_patch & (q_left == k_left) & (q_above == k_above)
    m_left = is_left_patch & ~is_top_patch & (q_left == k_left)
    m_top = ~is_left_patch & is_top_patch & (q_above == k_above)
    m_rest = ~is_left_patch & ~is_top_patch
    m = m_corner | m_left | m_top | m_rest
    m = np.broadcast_to(m, (n_h_w, n_w_w, w_h, w_w, w_h, w_w))
    # numpy, cached across traces (see neighborhood_mask_1d)
    return np.ascontiguousarray(m.reshape(n_h_w, n_w_w, w_h * w_w, w_h * w_w))


def shifted_window_attention(q, k, v, window_size, window_shift, scale=1.0):
    """Shifted-window attention, pure XLA (roll + window + masked SDPA),
    exactly the reference's no-custom-kernel path
    (reference image_transformer_v2.py:319-337).

    q/k/v: (batch, h, w, heads, head_dim).
    """
    b, h, w, heads, e = q.shape
    ws = window_size
    if window_shift:
        roll = lambda t: jnp.roll(t, (window_shift, window_shift), axis=(1, 2))
        q, k, v = roll(q), roll(k), roll(v)
    qw = window_partition(q, ws)  # (b, nh, nw, ws*ws, heads, e)
    kw = window_partition(k, ws)
    vw = window_partition(v, ws)
    nh, nw = qw.shape[1], qw.shape[2]
    mask = make_shifted_window_masks(nh, nw, ws, ws, window_shift)
    qs = qw.reshape(b * nh * nw, ws * ws, heads, e)
    ks = kw.reshape(b * nh * nw, ws * ws, heads, e)
    vs = vw.reshape(b * nh * nw, ws * ws, heads, e)
    mask_b = jnp.broadcast_to(
        jnp.asarray(mask)[None, :, :, None], (b, nh, nw, 1, ws * ws, ws * ws)
    ).reshape(b * nh * nw, 1, ws * ws, ws * ws)
    out = jax.nn.dot_product_attention(qs, ks, vs, mask=mask_b, scale=scale)
    out = out.reshape(b, nh, nw, ws * ws, heads, e)
    out = window_unpartition(out, ws)
    if window_shift:
        out = jnp.roll(out, (-window_shift, -window_shift), axis=(1, 2))
    return out

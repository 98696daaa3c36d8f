"""Flat (non-hierarchical) ViT denoiser, version 1
(reference k_diffusion/models/image_transformer_v1.py, 344 LoC).

Sequence-layout flax re-design. Architecture parity notes (reference line
refs):
- QKNorm: learned per-head log-scale clamped to log(100); applied scale is
  exp(0.5*s - 0.25*log(d_head)) via rms_norm on q and k (:108-128). The
  reference clamps the parameter in-place each forward; here the clamp is
  functional (a jnp.minimum in the forward).
- Learned axial RoPE with log-spaced init pi..5pi, interleaved-pair rotation
  over the full head dim (models/axial_rope.py:86-109).
- AdaRMSNorm conditioning from the mapping output (:131-142); GEGLU FF with
  zero-init down proj (:176-192); mapping network of 2 RMSNorm-sandwiched FF
  blocks tagged 'mapping' (:246-293).
- Patching to (c*ph*pw) tokens with aspect-corrected axial positions
  (:207-226); zero-init out_proj (:298).
- Param taxonomy: same 4 groups as v2 (:304-315).
"""

from typing import Any, Tuple

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..layers import FourierFeatures
from ..ops.pallas import flash_attention
from .image_transformer_v2 import MappingNetwork, param_group_labels  # same taxonomy


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return ops.rms_norm(x, scale, self.eps)


class AdaRMSNormSeq(nn.Module):
    """AdaRMSNorm over sequences (n, l, d)."""

    dtype: Any = jnp.float32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Dense(x.shape[-1], use_bias=False,
                         kernel_init=nn.initializers.zeros, dtype=self.dtype,
                         name="mapping_linear")(cond)
        return ops.rms_norm(x, scale[:, None, :] + 1, self.eps)


class AxialRoPEv1(nn.Module):
    """Learned-frequency axial RoPE (reference models/axial_rope.py:86-109)."""

    dim: int  # d_head
    n_heads: int

    @nn.compact
    def __call__(self, x, pos):
        # x: (n, heads, l, e); pos: (l, 2)
        init = ops.rope.freqs_pixel_log_init(max_freq=10.0)
        freqs_h = self.param("freqs_h", init, (self.n_heads, self.dim // 4))
        freqs_w = self.param("freqs_w", init, (self.n_heads, self.dim // 4))
        fh = pos[..., None, None, 0] * jnp.exp(freqs_h)   # (l, heads, dim//4)
        fw = pos[..., None, None, 1] * jnp.exp(freqs_w)
        freqs = jnp.concatenate([fh, fw], axis=-1)
        freqs = jnp.repeat(freqs, 2, axis=-1)             # (l, heads, dim//2*2)
        freqs = jnp.swapaxes(freqs, 0, 1)                 # (heads, l, ...)
        return ops.rope.apply_rotary_emb_interleaved(freqs, x)


class SelfAttentionBlockV1(nn.Module):
    d_model: int
    d_head: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, cond, deterministic=True):
        n_heads = self.d_model // self.d_head
        skip = x
        x = AdaRMSNormSeq(dtype=self.dtype, name="norm")(x, cond)
        qkv = nn.Dense(self.d_model * 3, use_bias=False, dtype=self.dtype,
                       name="qkv_proj")(x)
        b, l, _ = qkv.shape
        qkv = qkv.reshape(b, l, 3, n_heads, self.d_head)
        q = jnp.moveaxis(qkv[:, :, 0], 1, 2)  # (b, heads, l, e)
        k = jnp.moveaxis(qkv[:, :, 1], 1, 2)
        v = jnp.moveaxis(qkv[:, :, 2], 1, 2)

        # QKNorm (reference :108-128): rms-normalize q/k per head with
        # learned scale exp(0.5 s - 0.25 log d), s clamped to log(100)
        log_scale = self.param("qk_scale", nn.initializers.constant(math.log(10.0)),
                               (n_heads,))
        s = jnp.minimum(log_scale, math.log(100.0))
        qk_scale = jnp.exp(0.5 * s - 0.25 * math.log(self.d_head))
        q = ops.rms_norm(q, qk_scale[:, None, None], 1e-6)
        k = ops.rms_norm(k, qk_scale[:, None, None], 1e-6)

        rope = AxialRoPEv1(self.d_head, n_heads, name="pos_emb")
        q = rope(q, pos)
        k = rope(k, pos)

        # back to (b, l, heads, e) for the flash kernel. The reference's
        # sdpa applies the default 1/sqrt(d_head) ON TOP of QKNorm
        # (reference :62-75 -> F.scaled_dot_product_attention), so logits
        # are q.k/sqrt(d) with ||q||~||k||~exp(0.5 s - 0.25 log d).
        out = flash_attention(jnp.moveaxis(q, 1, 2), jnp.moveaxis(k, 1, 2),
                              jnp.moveaxis(v, 1, 2),
                              scale=self.d_head ** -0.5)
        x = out.reshape(b, l, self.d_model)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, use_bias=False,
                     kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="out_proj")(x)
        return x + skip


class FeedForwardBlockV1(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, deterministic=True):
        skip = x
        x = AdaRMSNormSeq(dtype=self.dtype, name="norm")(x, cond)
        up = nn.Dense(self.d_ff * 2, use_bias=False, dtype=self.dtype,
                      name="up_proj")(x)
        a, gate = jnp.split(up, 2, axis=-1)
        x = a * nn.gelu(gate, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, use_bias=False,
                     kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="down_proj")(x)
        return x + skip


class TransformerBlockV1(nn.Module):
    d_model: int
    d_ff: int
    d_head: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, cond, deterministic=True):
        x = SelfAttentionBlockV1(self.d_model, self.d_head,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name="self_attn")(x, pos, cond, deterministic)
        x = FeedForwardBlockV1(self.d_model, self.d_ff, dropout=self.dropout,
                               dtype=self.dtype, name="ff")(x, cond, deterministic)
        return x


class ImageTransformerDenoiserModelV1(nn.Module):
    """Flat ViT denoiser (reference image_transformer_v1.py:280-344). NHWC."""

    n_layers: int
    d_model: int
    d_ff: int
    in_features: int
    out_features: int
    patch_size: Tuple[int, int]
    num_classes: int = 0
    dropout: float = 0.0
    sigma_data: float = 1.0
    checkpointing: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sigma, aug_cond=None, class_cond=None, train=False):
        if self.num_classes and class_cond is None:
            raise ValueError("class_cond must be specified if num_classes > 0")
        deterministic = not train
        x = x.astype(self.dtype)
        b, h, w, c = x.shape
        ph, pw = self.patch_size
        h_out, w_out = h // ph, w // pw

        # Patching (reference :207-226): tokens (c*ph*pw), channel-major
        x = x.reshape(b, h_out, ph, w_out, pw, c)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(
            b, h_out * w_out, c * ph * pw)
        pos = ops.make_axial_pos(h_out, w_out, ph / pw).reshape(h_out * w_out, 2)
        x = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="in_proj")(x)

        c_noise = jnp.log(sigma.astype(jnp.float32)) / 4
        time_emb = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                            name="time_in_proj")(
            FourierFeatures(1, self.d_model, name="time_emb")(c_noise[..., None]))
        if aug_cond is None:
            aug_cond = jnp.zeros([b, 9], self.dtype)
        aug_emb = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                           name="aug_in_proj")(
            FourierFeatures(9, self.d_model, name="aug_emb")(aug_cond.astype(self.dtype)))
        emb = time_emb + aug_emb
        if self.num_classes:
            emb = emb + nn.Embed(self.num_classes, self.d_model,
                                 dtype=self.dtype, name="class_emb")(class_cond)
        cond = MappingNetwork(2, self.d_model, self.d_ff, dropout=self.dropout,
                              dtype=self.dtype, name="mapping")(emb, deterministic)

        block_cls = TransformerBlockV1
        if self.checkpointing:
            block_cls = nn.remat(TransformerBlockV1, static_argnums=(4,))
        for i in range(self.n_layers):
            x = block_cls(self.d_model, self.d_ff, 64, dropout=self.dropout,
                          dtype=self.dtype, name=f"block_{i}")(
                x, pos, cond, deterministic)

        x = RMSNorm(name="out_norm")(x)
        x = nn.Dense(self.out_features * ph * pw, use_bias=False,
                     kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="out_proj")(x)
        # Unpatching
        x = x.reshape(b, h_out, w_out, self.out_features, ph, pw)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3)).reshape(b, h, w, self.out_features)
        return x.astype(jnp.float32)

"""Convolutional EDM U-Net (reference k_diffusion/models/image_v1.py).

NHWC flax re-design. Architecture parity notes (reference line refs):
- ResConvBlock: AdaGN -> GELU -> 3x3 conv -> dropout2d, twice; second conv
  zero-init; orthogonal-init 1x1 skip when channels change (:15-29)
- DBlock/UBlock: stacks with optional self/cross attention after each res
  block, fixed low-pass down/upsampling (:32-77); UBlock concatenates the
  skip on channels (:70-73)
- MappingNet: 2-layer orthogonal-init MLP with GELU (:80-86)
- c_noise = log(sigma)/4 Fourier features; optional mapping_cond;
  unet_cond channel-concat; pixel (un)shuffle patching; optional learned
  variance extra channel (:135-157)
- param taxonomy: weight decay only on mapping/u_net '.weight' params
  (:117-133) — here: conv/dense kernels whose path is under mapping/ or
  u_net/ get the 'wd' label.

Progressive growing (set_skip_stages/set_patch_size, :159-176) is expressed
functionally: rebuild the module with dataclasses.replace(model,
skip_stages=..., patch_size=...) — params for shared stages transfer by name.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import traverse_util

from ..layers import FourierFeatures, downsample2d, upsample2d
from ..ops.pallas import flash_attention


def _space_to_depth(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = jnp.moveaxis(x, (2, 4), (3, 4))
    return x.reshape(b, h // p, w // p, p * p * c)


def _depth_to_space(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, p, p, c // (p * p))
    x = jnp.moveaxis(x, (3, 4), (2, 4))
    return x.reshape(b, h * p, w * p, c // (p * p))


class AdaGN(nn.Module):
    """Adaptive GroupNorm: FiLM from the mapping cond, zero-init projection
    (reference layers.py:162-175)."""

    num_groups: int
    dtype: Any = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, cond):
        c = x.shape[-1]
        wb = nn.Dense(c * 2, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="mapper")(cond)
        weight, bias = jnp.split(wb, 2, axis=-1)
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         use_bias=False, use_scale=False)(x)
        return x * (weight[:, None, None, :] + 1) + bias[:, None, None, :]


class ResConvBlock(nn.Module):
    c_mid: int
    c_out: int
    group_size: int = 32
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, deterministic=True):
        c_in = x.shape[-1]
        h = AdaGN(max(1, c_in // self.group_size), dtype=self.dtype,
                  name="norm_1")(x, cond)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.c_mid, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_1")(h)
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2))(
            h, deterministic=deterministic)
        h = AdaGN(max(1, self.c_mid // self.group_size), dtype=self.dtype,
                  name="norm_2")(h, cond)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.c_out, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv_2")(h)
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2))(
            h, deterministic=deterministic)
        if c_in != self.c_out:
            skip = nn.Conv(self.c_out, (1, 1), use_bias=False,
                           kernel_init=nn.initializers.orthogonal(),
                           dtype=self.dtype, name="skip")(x)
        else:
            skip = x
        return h + skip


class SelfAttention2d(nn.Module):
    """NHWC global self-attention block with AdaGN norm and zero-init out
    projection (reference layers.py:181-200); attention itself runs on the
    Pallas flash kernel when eligible."""

    n_head: int
    group_size: int = 32
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, deterministic=True):
        b, h, w, c = x.shape
        y = AdaGN(max(1, c // self.group_size), dtype=self.dtype,
                  name="norm_in")(x, cond)
        qkv = nn.Conv(c * 3, (1, 1), dtype=self.dtype, name="qkv_proj")(y)
        qkv = qkv.reshape(b, h * w, 3, self.n_head, c // self.n_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = flash_attention(q, k, v, scale=(c // self.n_head) ** -0.5)
        att = att.reshape(b, h, w, c)
        att = nn.Dropout(self.dropout_rate)(att, deterministic=deterministic)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="out_proj")(att)
        return x + out


class CrossAttention2d(nn.Module):
    """Image -> sequence cross-attention with key-padding mask
    (reference layers.py:203-230)."""

    c_enc: int
    n_head: int
    group_size: int = 32
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, cross, cross_padding, deterministic=True):
        b, h, w, c = x.shape
        y = AdaGN(max(1, c // self.group_size), dtype=self.dtype,
                  name="norm_dec")(x, cond)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q_proj")(y)
        q = q.reshape(b, h * w, self.n_head, c // self.n_head)
        enc = nn.LayerNorm(name="norm_enc")(cross)
        kv = nn.Dense(c * 2, dtype=self.dtype, name="kv_proj")(enc)
        kv = kv.reshape(b, -1, 2, self.n_head, c // self.n_head)
        k, v = kv[:, :, 0], kv[:, :, 1]
        # reference builds an additive -1e4 mask from the padding flags
        bias = (cross_padding[:, None, None, :] * -10000.0).astype(q.dtype)
        att = jax.nn.dot_product_attention(
            q, k, v, bias=bias, scale=(c // self.n_head) ** -0.5)
        att = att.reshape(b, h, w, c)
        att = nn.Dropout(self.dropout_rate)(att, deterministic=deterministic)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="out_proj")(att)
        return x + out


class MappingNet(nn.Module):
    feats_out: int
    n_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = nn.Dense(self.feats_out,
                         kernel_init=nn.initializers.orthogonal(),
                         dtype=self.dtype, name=f"linear_{i}")(x)
            x = nn.gelu(x, approximate=False)
        return x


class _Stack(nn.Module):
    """One D/U block: res conv layers with optional attention
    (reference image_v1.py:32-77)."""

    n_layers: int
    c_mid: int
    c_out: int
    head_size: int = 64
    dropout_rate: float = 0.0
    self_attn: bool = False
    cross_attn: bool = False
    c_enc: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, cross=None, cross_padding=None, deterministic=True):
        for i in range(self.n_layers):
            my_c_out = self.c_mid if i < self.n_layers - 1 else self.c_out
            x = ResConvBlock(self.c_mid, my_c_out,
                             dropout_rate=self.dropout_rate, dtype=self.dtype,
                             name=f"res_{i}")(x, cond, deterministic)
            if self.self_attn:
                x = SelfAttention2d(max(1, my_c_out // self.head_size),
                                    dropout_rate=self.dropout_rate,
                                    dtype=self.dtype, name=f"attn_{i}")(
                    x, cond, deterministic)
            if self.cross_attn:
                x = CrossAttention2d(self.c_enc,
                                     max(1, my_c_out // self.head_size),
                                     dropout_rate=self.dropout_rate,
                                     dtype=self.dtype, name=f"cross_{i}")(
                    x, cond, cross, cross_padding, deterministic)
        return x


class ImageDenoiserModelV1(nn.Module):
    """EDM U-Net denoiser (reference image_v1.py:89-176). NHWC."""

    c_in: int
    feats_in: int
    depths: Tuple[int, ...]
    channels: Tuple[int, ...]
    self_attn_depths: Tuple[bool, ...]
    cross_attn_depths: Optional[Tuple[bool, ...]] = None
    mapping_cond_dim: int = 0
    unet_cond_dim: int = 0
    cross_cond_dim: int = 0
    dropout_rate: float = 0.0
    patch_size: int = 1
    skip_stages: int = 0
    has_variance: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sigma, mapping_cond=None, unet_cond=None,
                 cross_cond=None, cross_cond_padding=None,
                 return_variance=False, train=False):
        deterministic = not train
        x = x.astype(self.dtype)
        c_noise = jnp.log(sigma.astype(jnp.float32)) / 4
        ts_embed = FourierFeatures(1, self.feats_in, name="timestep_embed")(
            c_noise[:, None]).astype(self.dtype)
        if mapping_cond is not None:
            ts_embed = ts_embed + nn.Dense(
                self.feats_in, use_bias=False, dtype=self.dtype,
                name="mapping_cond")(mapping_cond.astype(self.dtype))
        cond = MappingNet(self.feats_in, dtype=self.dtype, name="mapping")(ts_embed)

        cross_attn_depths = self.cross_attn_depths
        if self.cross_cond_dim == 0 or cross_attn_depths is None:
            cross_attn_depths = (False,) * len(self.self_attn_depths)

        if unet_cond is not None:
            x = jnp.concatenate([x, unet_cond.astype(self.dtype)], axis=-1)
        if self.patch_size > 1:
            x = _space_to_depth(x, self.patch_size)
        x = nn.Conv(self.channels[max(0, self.skip_stages - 1)], (1, 1),
                    dtype=self.dtype, name="proj_in")(x)

        n = len(self.depths)
        skips = []
        for i in range(self.skip_stages, n):
            if i > self.skip_stages:
                x = downsample2d(x)
            x = _Stack(self.depths[i], self.channels[i], self.channels[i],
                       dropout_rate=self.dropout_rate,
                       self_attn=self.self_attn_depths[i],
                       cross_attn=cross_attn_depths[i],
                       c_enc=self.cross_cond_dim, dtype=self.dtype,
                       name=f"u_net_d_{i}")(
                x, cond, cross_cond, cross_cond_padding, deterministic)
            skips.append(x)

        for idx, i in enumerate(reversed(range(self.skip_stages, n))):
            if idx > 0:
                x = jnp.concatenate([x, skips[i - self.skip_stages]], axis=-1)
            my_c_out = self.channels[max(0, i - 1)]
            x = _Stack(self.depths[i], self.channels[i], my_c_out,
                       dropout_rate=self.dropout_rate,
                       self_attn=self.self_attn_depths[i],
                       cross_attn=cross_attn_depths[i],
                       c_enc=self.cross_cond_dim, dtype=self.dtype,
                       name=f"u_net_u_{i}")(
                x, cond, cross_cond, cross_cond_padding, deterministic)
            if i > self.skip_stages:
                x = upsample2d(x)

        out_ch = self.c_in * self.patch_size ** 2 + (1 if self.has_variance else 0)
        x = nn.Conv(out_ch, (1, 1), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="proj_out")(x)
        if self.has_variance:
            x, logvar_map = x[..., :-1], x[..., -1]
            logvar = jnp.mean(logvar_map.reshape(x.shape[0], -1), axis=1)
        if self.patch_size > 1:
            x = _depth_to_space(x, self.patch_size)
        x = x.astype(jnp.float32)
        if self.has_variance and return_variance:
            return x, logvar.astype(jnp.float32)
        return x


def param_group_labels(params):
    """2-group taxonomy: weight decay only on mapping/u_net kernels
    (reference image_v1.py:117-133)."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        in_scope = path[0].startswith("mapping") or path[0].startswith("u_net")
        is_weight = path[-1] == "kernel"
        labels[path] = "wd" if (in_scope and is_weight) else "no_wd"
    return traverse_util.unflatten_dict(labels)

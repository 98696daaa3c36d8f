"""Hourglass Diffusion Transformer (HDiT) — the flagship model.

TPU-native re-design of the reference ``image_transformer_v2.py`` (762 LoC):
- NHWC tokens end to end; attention in (batch, seq, heads, head_dim).
- flax.linen modules; compute dtype (bf16) separate from param dtype (f32).
- The reference's NATTEN / FlashAttention-2 CUDA dependencies become
  ``k_diffusion_tpu.ops`` attention (Pallas kernels with XLA fallback).
- The reference's torch.compile-fused pointwise kernels (rms_norm, geglu,
  rope, cosine-sim scaling) are plain functions fused by XLA.
- Param taxonomy (reference ``tag_param``/``apply_wd``, lines 59-84) becomes
  pytree-path classification: ``param_groups(params)`` returns the 4 group
  masks {wd, no_wd} x {base lr, mapping lr}.
- Per-block gradient checkpointing (reference ``checkpoint``, lines 44-49)
  becomes ``nn.remat`` on transformer layers, gated by the
  ``checkpointing`` field.

Architecture parity notes (reference line refs):
- cosine-sim QK attention with learned per-head scale init 10.0 (:362,:407)
- AdaRMSNorm with zero-init cond projection, scale = proj(cond)+1 (:155-166)
- axial RoPE, fixed log-spaced freqs pi..10pi, applied to the first half of
  each head's dims (:234-248)
- GEGLU FF with zero-init down projection (:479-493)
- TokenMerge 2x2 pixel-shuffle-as-linear (:586-595); TokenSplit with learned
  lerp skip merge, fac init 0.5 (:610-621); zero-init output head (:598-607,
  :705-706)
- mapping network: RMSNorm-sandwiched FF stack (:569-581); cond = mapping(
  time_emb + aug_emb + class_emb + mapping_cond_emb), c_noise = log(sigma)/4
  (:721-740)
"""

from dataclasses import dataclass
from typing import Any, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import traverse_util

from .. import ops
from ..layers import FourierFeatures

# Configuration (reference image_transformer_v2.py:626-662)


@dataclass(frozen=True)
class GlobalAttentionSpec:
    d_head: int


@dataclass(frozen=True)
class NeighborhoodAttentionSpec:
    d_head: int
    kernel_size: int


@dataclass(frozen=True)
class ShiftedWindowAttentionSpec:
    d_head: int
    window_size: int


@dataclass(frozen=True)
class NoAttentionSpec:
    pass


SelfAttnSpec = Union[GlobalAttentionSpec, NeighborhoodAttentionSpec,
                     ShiftedWindowAttentionSpec, NoAttentionSpec]


@dataclass(frozen=True)
class LevelSpec:
    depth: int
    width: int
    d_ff: int
    self_attn: SelfAttnSpec
    dropout: float = 0.0


@dataclass(frozen=True)
class MappingSpec:
    depth: int
    width: int
    d_ff: int
    dropout: float = 0.0


def cond_scale_layout(levels):
    """Lane layout of the precomputed cond-scales vector (condcache.py).

    Every AdaRMSNorm scale the forward derives from the mapping cond —
    one per attention block, one per FF block, in forward execution order
    (down levels, mid, up levels) — is packed into a single (b, total)
    vector so the whole table for a sigma schedule can be computed once
    outside the sampler scan. Returns ``({layer_name: (attn_off, ff_off)},
    total)`` with ``attn_off=None`` for no-attention layers. Every offset
    is aligned UP to a multiple of its layer's width (padding lanes are
    written but never read) so the fused kernels can always read their
    scale as a static BlockSpec lane block — zero per-step ops.
    """
    seq = [(f"down_{i}", spec) for i, spec in enumerate(levels[:-1])]
    seq.append(("mid", levels[-1]))
    seq += [(f"up_{i}", spec)
            for i, spec in reversed(list(enumerate(levels[:-1])))]
    table, off = {}, 0
    for prefix, spec in seq:
        has_attn = not isinstance(spec.self_attn, NoAttentionSpec)
        off = -(-off // spec.width) * spec.width  # align to width
        for j in range(spec.depth):
            attn_off = None
            if has_attn:
                attn_off = off
                off += spec.width
            table[f"{prefix}_layer_{j}"] = (attn_off, off)
            off += spec.width
    return table, off


# Blocks


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return ops.rms_norm(x, scale, self.eps)


class AdaRMSNorm(nn.Module):
    """RMSNorm with scale = zero-init proj(cond) + 1. The projection is
    tagged 'mapping' by its module name (reference :155-166)."""

    dtype: Any = jnp.float32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Dense(
            x.shape[-1], use_bias=False, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="mapping_linear")(cond)
        return ops.rms_norm(x, scale[:, None, None, :] + 1, self.eps)


class SelfAttentionBlock(nn.Module):
    d_model: int
    d_head: int
    attn_spec: SelfAttnSpec
    dropout: float = 0.0
    shifted: bool = False
    tp_axis: Any = None
    dtype: Any = jnp.float32
    # lane offset into a PRECOMPUTED cond-scales vector (condcache.py):
    # when set, `cond` is the step's full (b, total) AdaRMSNorm-scale table
    # — proj(cond)+1 was hoisted out of the sampler scan — and this block
    # takes its d_model-lane slice instead of running the projection.
    scale_offset: Any = None

    @nn.compact
    def __call__(self, x, pos, cond, deterministic=True):
        n_heads = self.d_model // self.d_head
        skip = x
        b, h, w, _ = x.shape
        # kernels owned directly (at the same pytree paths the submodule
        # composition would use) so the fused and unfused prologues share
        # parameters and checkpoints
        w_qkv = _KernelParam((self.d_model, self.d_model * 3),
                             nn.initializers.lecun_normal(),
                             name="qkv_proj")()
        w_out = _KernelParam((n_heads * self.d_head, self.d_model),
                             nn.initializers.zeros, name="out_proj")()
        scale = self.param("scale", nn.initializers.constant(10.0), (n_heads,))

        scale_block = 0
        if self.scale_offset is None:
            norm_kernel = _NormScaleParam(self.d_model,
                                          name="norm")(cond.shape[-1])
            norm_scale = (cond.astype(self.dtype)
                          @ norm_kernel.astype(self.dtype) + 1)
        else:
            scale_block, rem = divmod(self.scale_offset, self.d_model)
            if rem:
                norm_scale = jax.lax.slice_in_dim(
                    cond, self.scale_offset, self.scale_offset + self.d_model,
                    axis=-1)
                scale_block = 0
            else:
                norm_scale = cond  # wide; kernels read their lane block
        from ..ops.pallas import train_fusion_enabled
        if not self.tp_axis and (deterministic or train_fusion_enabled()):
            # norm -> qkv matmul -> cosine-sim -> RoPE as one Pallas kernel
            # producing channel-packed maps (falls back to the identical XLA
            # chain off-TPU / under force_xla). Train-eligible: its
            # custom_vjp backward runs the residual-saving Pallas
            # prologue-backward kernel (fused_qkv._prologue_bwd_pallas);
            # recompute-through-XLA is only the off-TPU fallback.
            from ..ops.pallas import fused_qkv_prologue
            from ..ops.pallas.fused_qkv import preferred_qkv_tile
            qp, kp, vp = fused_qkv_prologue(
                x, pos, norm_scale, w_qkv, scale, n_heads,
                tile=preferred_qkv_tile(h, w), scale_block=scale_block)
            q = k = v = None
        else:
            if norm_scale.shape[-1] != self.d_model:
                norm_scale = jax.lax.slice_in_dim(
                    norm_scale, scale_block * self.d_model,
                    (scale_block + 1) * self.d_model, axis=-1)
            xn = ops.rms_norm(x, norm_scale[:, None, None, :])
            qkv = xn @ w_qkv.astype(xn.dtype)
            qkv = qkv.reshape(b, h, w, 3, n_heads, self.d_head)
            if self.tp_axis:
                # tensor parallelism: batch over data, attention heads over
                # the model axis; XLA partitions everything downstream
                # head-wise
                U = jax.sharding.PartitionSpec.UNCONSTRAINED
                qkv = jax.lax.with_sharding_constraint(
                    qkv, jax.sharding.PartitionSpec(
                        U, None, None, None, self.tp_axis, None))
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            q, k = ops.scale_for_cosine_sim(q, k, scale[:, None], 1e-6)

            freqs = ops.axial_rope_freqs(self.d_head // 2, n_heads)
            theta = ops.rope.axial_rope_theta(pos, freqs)  # (h,w,heads,e//2)
            q = ops.apply_rotary_emb(q, theta)
            k = ops.apply_rotary_emb(k, theta)

        # Pallas kernels are not GSPMD-partitionable, so tensor-parallel runs
        # use the pure-XLA attention paths (head-sharded by the constraint
        # above); single-model-axis runs take the Pallas fast path.
        c = n_heads * self.d_head
        if isinstance(self.attn_spec, GlobalAttentionSpec):
            if self.tp_axis:
                qs = q.reshape(b, h * w, n_heads, self.d_head)
                ks = k.reshape(b, h * w, n_heads, self.d_head)
                vs = v.reshape(b, h * w, n_heads, self.d_head)
                out = ops.global_attention(qs, ks, vs, scale=1.0)
            else:
                qq, kk, vv = (qp, kp, vp) if q is None else (
                    q.reshape(b, h, w, c), k.reshape(b, h, w, c),
                    v.reshape(b, h, w, c))
                from ..ops.pallas import (flash_attention,
                                          packed_global_attention,
                                          packed_global_ok)
                if packed_global_ok(h * w, c, self.d_head):
                    # short-sequence path (the hourglass mid level): stays
                    # in the channel-packed layout, logits never leave VMEM
                    out = packed_global_attention(
                        qq.reshape(b, h * w, c), kk.reshape(b, h * w, c),
                        vv.reshape(b, h * w, c), n_heads, scale=1.0)
                else:
                    qs = qq.reshape(b, h * w, n_heads, self.d_head)
                    ks = kk.reshape(b, h * w, n_heads, self.d_head)
                    vs = vv.reshape(b, h * w, n_heads, self.d_head)
                    out = flash_attention(qs, ks, vs, scale=1.0,
                                          train=not deterministic)
            x = out.reshape(b, h, w, c)
        elif isinstance(self.attn_spec, NeighborhoodAttentionSpec):
            if self.tp_axis:
                out = ops.neighborhood_attention(
                    q, k, v, self.attn_spec.kernel_size, scale=1.0)
                x = out.reshape(b, h, w, c)
            elif q is None:
                # channel-packed kernel — heads stay in the channel dim, so
                # no (b,h,w,heads,e)->(b*heads,h,w,e) transposes are paid
                # (+17% sampling throughput); in training its backward runs
                # the channel-packed dq/dkv kernels from the saved per-head
                # logsumexp. NOTE: the fused-epilogue variant
                # (na2d_packed_proj) measured ~2-3% SLOWER end-to-end — XLA
                # already fuses out_proj with the residual and adjacent
                # elementwise work — so it is not used.
                from ..ops.pallas.na2d import na2d_packed, preferred_tile
                x = na2d_packed(qp, kp, vp, n_heads,
                                self.attn_spec.kernel_size, scale=1.0,
                                tile=preferred_tile(h, w, not deterministic,
                                                    batch=b))
            else:
                # unfused prologue (KDT_TRAIN_FUSION=0): per-head kernel
                from ..ops.pallas import na2d
                out = na2d(q, k, v, self.attn_spec.kernel_size, scale=1.0)
                x = out.reshape(b, h, w, c)
        elif isinstance(self.attn_spec, ShiftedWindowAttentionSpec):
            if not self.tp_axis and q is None:
                q = qp.reshape(b, h, w, n_heads, self.d_head)
                k = kp.reshape(b, h, w, n_heads, self.d_head)
                v = vp.reshape(b, h, w, n_heads, self.d_head)
            # layers alternate unshifted/shifted (reference :520-524)
            window_shift = self.attn_spec.window_size // 2 if self.shifted else 0
            out = ops.shifted_window_attention(
                q, k, v, self.attn_spec.window_size, window_shift, scale=1.0)
            x = out.reshape(b, h, w, n_heads * self.d_head)
        else:
            raise ValueError(f"unsupported attention spec {self.attn_spec}")

        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x.astype(self.dtype) @ w_out.astype(self.dtype)
        return x + skip


class _NormScaleParam(nn.Module):
    """Owns the AdaRMSNorm projection kernel at the same pytree path an
    AdaRMSNorm submodule would (<parent>/norm/mapping_linear/kernel), so the
    fused and unfused FF paths share parameters and checkpoints."""

    d_model: int

    @nn.compact
    def __call__(self, cond_features):
        return _KernelParam((cond_features, self.d_model),
                            nn.initializers.zeros, name="mapping_linear")()


class _KernelParam(nn.Module):
    shape: Tuple[int, ...]
    init: Any

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.init, self.shape)


class FeedForwardBlock(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.0
    tp_axis: Any = None
    dtype: Any = jnp.float32
    scale_offset: Any = None  # see SelfAttentionBlock.scale_offset

    @nn.compact
    def __call__(self, x, cond, deterministic=True):
        skip = x
        b, hh, ww, d = x.shape
        w_up = _KernelParam((self.d_model, self.d_ff * 2),
                            nn.initializers.lecun_normal(), name="up_proj")()
        w_down = _KernelParam((self.d_ff, self.d_model),
                              nn.initializers.zeros, name="down_proj")()
        scale_block = 0
        if self.scale_offset is None:
            norm_kernel = _NormScaleParam(self.d_model,
                                          name="norm")(cond.shape[-1])
            scale = cond @ norm_kernel.astype(cond.dtype) + 1
        else:
            scale_block, rem = divmod(self.scale_offset, self.d_model)
            if rem:
                scale = jax.lax.slice_in_dim(
                    cond, self.scale_offset, self.scale_offset + self.d_model,
                    axis=-1)
                scale_block = 0
            else:
                scale = cond  # wide; the kernel reads its lane block

        t = hh * ww
        block = (1024 if t % 1024 == 0 else
                 512 if t % 512 == 0 else (256 if t % 256 == 0 else 0))
        if deterministic and t % 2048 == 0:
            # eval forward: larger blocks amortize per-program costs
            # (113.3 -> 109.1 us at the 4096-token level-0 shape,
            # scripts/bench_prologue_ffn.py); the backward keeps 1024 —
            # 2048 measured slower there (scripts/bench_ffn_bwd.py)
            block = 2048
        # the fused kernel contains no dropout, so it is exact whenever
        # dropout is inactive — always at inference, and in training for the
        # dropout=0 blocks (train-eligible: its custom_vjp backward runs the
        # residual-saving Pallas kernel fused_ffn._ffn_bwd_pallas;
        # recompute-through-XLA is only the off-TPU fallback)
        from ..ops.pallas import train_fusion_enabled
        use_fused = bool((deterministic
                          or (self.dropout == 0.0 and train_fusion_enabled()))
                         and not self.tp_axis and block)
        if use_fused:
            # one Pallas kernel for norm -> GEGLU up -> down ->
            # skip (fewer op launches; see PERFORMANCE.md)
            from ..ops.pallas import fused_geglu_ffn
            out = fused_geglu_ffn(
                x.reshape(b, t, d), scale, w_up, w_down, block=block,
                scale_block=scale_block)
            return out.reshape(b, hh, ww, d)

        if scale.shape[-1] != d:
            scale = jax.lax.slice_in_dim(
                scale, scale_block * d, (scale_block + 1) * d, axis=-1)
        x = ops.rms_norm(x, scale[:, None, None, :].astype(self.dtype))
        if self.tp_axis:
            # megatron-style: hidden dim sharded, down_proj reduces
            up = x @ w_up.astype(self.dtype)
            U = jax.sharding.PartitionSpec.UNCONSTRAINED
            up = jax.lax.with_sharding_constraint(
                up, jax.sharding.PartitionSpec(U, None, None, self.tp_axis))
            a, gate = jnp.split(up, 2, axis=-1)
            x = a * nn.gelu(gate, approximate=False)
        else:
            x = ops.linear_geglu(x, w_up.astype(self.dtype))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x @ w_down.astype(self.dtype)
        return x + skip


class TransformerLayer(nn.Module):
    """Attention (optional) + FF, the unit of gradient checkpointing
    (reference :496-540)."""

    d_model: int
    d_ff: int
    self_attn: SelfAttnSpec
    dropout: float = 0.0
    shifted: bool = False
    tp_axis: Any = None
    dtype: Any = jnp.float32
    # precomputed cond-scales lane offsets (see SelfAttentionBlock)
    attn_scale_offset: Any = None
    ff_scale_offset: Any = None

    @nn.compact
    def __call__(self, x, pos, cond, deterministic=True):
        if not isinstance(self.self_attn, NoAttentionSpec):
            x = SelfAttentionBlock(
                self.d_model, self.self_attn.d_head, self.self_attn,
                dropout=self.dropout, shifted=self.shifted,
                tp_axis=self.tp_axis, dtype=self.dtype,
                scale_offset=self.attn_scale_offset,
                name="self_attn")(x, pos, cond, deterministic)
        x = FeedForwardBlock(self.d_model, self.d_ff, dropout=self.dropout,
                             tp_axis=self.tp_axis, dtype=self.dtype,
                             scale_offset=self.ff_scale_offset,
                             name="ff")(x, cond, deterministic)
        return x


class _ScaleParam(nn.Module):
    """Owns an RMSNorm scale at the path a RMSNorm submodule would use
    (<name>/scale)."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones, (self.dim,))


class _MappingBlockParams(nn.Module):
    """Owns one mapping FF block's params at the paths the submodule
    composition would use (<name>/{norm/scale, up_proj/kernel,
    down_proj/kernel})."""

    d_model: int
    d_ff: int

    @nn.compact
    def __call__(self):
        ns = _ScaleParam(self.d_model, name="norm")()
        w_up = _KernelParam((self.d_model, self.d_ff * 2),
                            nn.initializers.lecun_normal(), name="up_proj")()
        w_down = _KernelParam((self.d_ff, self.d_model),
                              nn.initializers.zeros, name="down_proj")()
        return ns, w_up, w_down


class MappingNetwork(nn.Module):
    """RMSNorm -> n x (RMSNorm -> GEGLU FF -> residual) -> RMSNorm
    (reference image_transformer_v2.py:129-168). On the eval path the whole
    stack runs as one Pallas kernel — the activations are tiny (batch,
    width), so the cost is pure op-launch count (see PERFORMANCE.md)."""

    n_layers: int
    d_model: int
    d_ff: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        in_scale = _ScaleParam(self.d_model, name="in_norm")()
        blocks = [_MappingBlockParams(self.d_model, self.d_ff,
                                      name=f"block_{i}")()
                  for i in range(self.n_layers)]
        out_scale = _ScaleParam(self.d_model, name="out_norm")()

        if deterministic or self.dropout == 0.0:
            # dropout is inactive, so the fused kernel is exact
            from ..ops.pallas import fused_mapping
            return fused_mapping(x, in_scale, out_scale, blocks,
                                 dtype=self.dtype)

        x = ops.rms_norm(x, in_scale)
        for ns, w_up, w_down in blocks:
            skip = x
            xn = ops.rms_norm(x, ns)
            h = ops.linear_geglu(xn.astype(self.dtype), w_up.astype(self.dtype))
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = skip + h.astype(self.dtype) @ w_down.astype(self.dtype)
        return ops.rms_norm(x, out_scale)


class TokenMerge(nn.Module):
    """patch_size[0] x patch_size[1] pixel-shuffle downsample as one linear
    (reference :586-595)."""

    out_features: int
    patch_size: Tuple[int, int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, folded=True, tokens=False):
        ph, pw = self.patch_size
        if tokens:
            # token-layout input (b, h/ph, w/pw, ph*pw*c): the patch gather
            # already happened outside the sampler loop (layout.to_tokens),
            # so patching is a plain feature matmul — no relayout at all.
            # Feature order (ph, pw, c) matches w_proj's flattened rows, so
            # checkpoints are identical across all three input layouts.
            w_proj = _KernelParam((x.shape[-1], self.out_features),
                                  nn.initializers.lecun_normal(), name="proj")()
            return x.astype(self.dtype) @ w_proj.astype(self.dtype)
        b, h, w, c = x.shape
        w_proj = _KernelParam((ph * pw * c, self.out_features),
                              nn.initializers.lecun_normal(), name="proj")()
        dtype = self.dtype
        if c * pw < 128 and folded:
            # image input (C=3): patch from the FOLDED (b, h, w*c) layout —
            # a patch's pw*c lanes are contiguous there, so the pixel
            # shuffle is two reshapes + one einsum and the C-minor NHWC
            # image layout (~5% lane utilization, see layout.py) is never
            # materialized. When the caller unfolded a folded sampler array
            # (layout.folded_model_fn), the reshapes cancel bitwise.
            # Kernel flattening (ph, pw*c) matches the conv path's
            # (ph, pw, c) channel order, so checkpoints are identical.
            xf = x.reshape(b, h, w * c)
            x5 = xf.reshape(b, h // ph, ph, w // pw, pw * c)
            kernel = w_proj.reshape(ph, pw * c, self.out_features).astype(dtype)
            return jnp.einsum("bypxu,pun->byxn", x5.astype(dtype), kernel)
        # pixel-shuffle + matmul expressed as a strided conv: XLA lowers it
        # onto the MXU without materializing the (ph, pw, c) shuffle copy
        # (the kernel layout matches the flattened (ph, pw, c) channel order
        # of the reshape+moveaxis formulation, so checkpoints are identical)
        kernel = w_proj.reshape(ph, pw, c, self.out_features).astype(dtype)
        return jax.lax.conv_general_dilated(
            x.astype(dtype), kernel, window_strides=(ph, pw), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _unpatch(x, patch_size, out_features):
    ph, pw = patch_size
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, ph, pw, out_features)
    x = jnp.moveaxis(x, 3, 2).reshape(b, h * ph, w * pw, out_features)
    return x


def _split_proj(x, w_proj, patch_size, out_features, dtype, folded=True,
                tokens=False):
    """Projection + pixel-unshuffle as one transposed strided conv (exact:
    stride == kernel size, so outputs never overlap). Kernel channel order
    matches the Dense + _unpatch formulation for checkpoint parity."""
    ph, pw = patch_size
    c = x.shape[-1]
    if tokens:
        # token-layout output (b, h/ph, w/pw, ph*pw*out): leave the pixel
        # unshuffle to layout.from_tokens outside the sampler loop. Column
        # order of w_proj is (ph, pw, out) — the same feature order
        # TokenMerge consumes, so sampler algebra on token arrays lines up
        # pixel-for-pixel with the NHWC path.
        return x.astype(dtype) @ w_proj.astype(dtype)
    if out_features * pw < 128 and folded:
        # image output (C=3): project then assemble the FOLDED (b, h, w*c)
        # image with one sublane transpose — the C-minor NHWC layout is
        # never materialized (see TokenMerge; layout.folded_model_fn's
        # re-fold cancels the final reshape bitwise). Kernel column order
        # (ph, pw, out) matches the conv-transpose path for checkpoint
        # parity.
        b, hy, wx, _ = x.shape
        kernel = w_proj.reshape(c, ph, pw * out_features).astype(dtype)
        t = jnp.einsum("byxi,ipu->bypxu", x.astype(dtype), kernel)
        folded = t.reshape(b, hy * ph, wx * pw * out_features)
        return folded.reshape(b, hy * ph, wx * pw, out_features)
    # conv_transpose uses the flipped-kernel convention, so mirror the
    # spatial taps to reproduce out[s*i + p] = x[i] @ W[p]
    kernel = w_proj.reshape(c, ph, pw, out_features).transpose(1, 2, 0, 3)
    kernel = kernel[::-1, ::-1]
    return jax.lax.conv_transpose(
        x.astype(dtype), kernel.astype(dtype), strides=(ph, pw),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TokenSplitWithoutSkip(nn.Module):
    """Upsample head (reference :598-607); zero-init when used as the model
    output (reference :706)."""

    out_features: int
    patch_size: Tuple[int, int] = (2, 2)
    zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, folded=True, tokens=False):
        ph, pw = self.patch_size
        init = nn.initializers.zeros if self.zero_init \
            else nn.initializers.lecun_normal()
        w_proj = _KernelParam((x.shape[-1], self.out_features * ph * pw),
                              init, name="proj")()
        return _split_proj(x, w_proj, self.patch_size, self.out_features,
                           self.dtype, folded=folded, tokens=tokens)


class TokenSplit(nn.Module):
    """Upsample + learned-lerp skip merge: lerp(skip, up(x), fac), fac init
    0.5 (reference :610-621)."""

    out_features: int
    patch_size: Tuple[int, int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        ph, pw = self.patch_size
        w_proj = _KernelParam((x.shape[-1], self.out_features * ph * pw),
                              nn.initializers.lecun_normal(), name="proj")()
        x = _split_proj(x, w_proj, self.patch_size, self.out_features,
                        self.dtype)
        fac = self.param("fac", nn.initializers.constant(0.5), (1,))
        return skip + (x - skip) * fac.astype(x.dtype)


class ImageTransformerDenoiserModelV2(nn.Module):
    """Multi-level hourglass transformer denoiser (reference :667-762).

    Call: ``model.apply(variables, x, sigma, aug_cond=..., class_cond=...,
    mapping_cond=..., train=False, rngs={'dropout': key})`` with x NHWC.
    """

    levels: Tuple[LevelSpec, ...]
    mapping: MappingSpec
    in_channels: int
    out_channels: int
    patch_size: Tuple[int, int]
    num_classes: int = 0
    mapping_cond_dim: int = 0
    checkpointing: bool = False
    # name of a jax.checkpoint_policies entry (e.g.
    # 'dots_with_no_batch_dims_saveable'): save the flagged intermediates
    # instead of rematerializing everything, cutting the remat backward tax
    remat_policy: Any = None
    # which hourglass levels to remat when checkpointing (None = all).
    # E.g. (0,) remats only the wide high-resolution level — it holds most
    # of the activation memory (4x the tokens of the next level at 1/2 the
    # width = 2x the bytes/layer) while its layers are a minority of the
    # model FLOPs, so the remat tax shrinks to the recompute of just those
    # layers. The low-token global level's activations are cheap to save.
    # Entries may also be stack names ('down_0', 'up_0', 'mid') for
    # sub-level granularity: ('down_0',) checkpoints only the high-res DOWN
    # stack — the single largest saved-activation block — while the up
    # stack, whose activations are consumed FIRST in the backward, stays
    # saved, halving the tax again.
    # (reference checkpoints every block, image_transformer_v2.py:44-49)
    remat_levels: Any = None
    tp_axis: Any = None  # mesh axis name for tensor parallelism (or None)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sigma, aug_cond=None, class_cond=None,
                 mapping_cond=None, train=False, image_layout="nhwc",
                 cond_scales=None, cond_only=False):
        if cond_scales is None and self.num_classes and class_cond is None:
            raise ValueError("class_cond must be specified if num_classes > 0")
        if cond_scales is None and self.mapping_cond_dim and mapping_cond is None:
            raise ValueError("mapping_cond must be specified if mapping_cond_dim > 0")
        deterministic = not train
        tokens = image_layout == "tokens"

        if not cond_only:
            x = x.astype(self.dtype)
            # Patching. image_layout='tokens' takes (b, h/ph, w/pw, ph*pw*c)
            # token arrays (layout.to_tokens) and makes both patch boundaries
            # plain matmuls — zero relayout inside a sampler loop or train
            # step (the gather/scatter happens ONCE outside). The
            # folded-einsum image path wins for NHWC inference but its
            # BACKWARD materializes lane-starved (ph, pw*c)-minor transposes
            # (583 -> 572 imgs/sec measured), so NHWC training keeps the
            # strided-conv formulation whose conv data-grad is cheap.
            x = TokenMerge(self.levels[0].width, self.patch_size,
                           dtype=self.dtype, name="patch_in")(
                x, folded=deterministic, tokens=tokens)
            pos = ops.make_axial_pos(x.shape[-3], x.shape[-2])

        scale_offsets = None
        if cond_scales is None:
            # Mapping network
            c_noise = jnp.log(sigma.astype(jnp.float32)) / 4
            time_emb = nn.Dense(self.mapping.width, use_bias=False, dtype=self.dtype,
                                name="time_in_proj")(
                FourierFeatures(1, self.mapping.width, name="time_emb")(c_noise[..., None]))
            if aug_cond is None:
                aug_cond = jnp.zeros([sigma.shape[0], 9], self.dtype)
            aug_emb = nn.Dense(self.mapping.width, use_bias=False, dtype=self.dtype,
                               name="aug_in_proj")(
                FourierFeatures(9, self.mapping.width, name="aug_emb")(aug_cond.astype(self.dtype)))
            emb = time_emb + aug_emb
            if self.num_classes:
                emb = emb + nn.Embed(self.num_classes, self.mapping.width,
                                     dtype=self.dtype, name="class_emb")(class_cond)
            if self.mapping_cond_dim:
                emb = emb + nn.Dense(self.mapping.width, use_bias=False, dtype=self.dtype,
                                     name="mapping_cond_in_proj")(mapping_cond)
            cond = MappingNetwork(self.mapping.depth, self.mapping.width,
                                  self.mapping.d_ff, dropout=self.mapping.dropout,
                                  dtype=self.dtype, name="mapping")(emb, deterministic)
            if cond_only:
                # condcache.py: return the mapping output for table
                # precompute, skipping the image path entirely
                return cond
        else:
            # precomputed per-layer AdaRMSNorm scales (condcache.py): cond
            # is the step's (b, total) scales vector; each layer takes a
            # static lane block/slice instead of running proj(cond) + 1
            scale_offsets, total = cond_scale_layout(self.levels)
            if cond_scales.shape[-1] != total:
                raise ValueError(
                    f"cond_scales last dim {cond_scales.shape[-1]} != "
                    f"layout total {total}")
            cond = cond_scales.astype(self.dtype)

        layer_cls = TransformerLayer
        if self.checkpointing:
            if self.remat_policy and self.remat_policy.startswith("save_"):
                # named-residual policies over the attention kernels'
                # custom_vjp residuals (tagged in ops/pallas/remat_names.py):
                # 'save_attn_out' keeps the kernel output + per-head
                # logsumexp (elides the attention-forward re-run in the
                # backward), 'save_attn' additionally keeps the q/k/v maps,
                # 'save_attn_qkv_raw' keeps output/lse + the prologue's raw
                # qkv projection. The wide GEGLU hidden activations are
                # rematerialized under all of them.
                from ..ops.pallas import remat_names as rn
                names = {
                    "save_attn_out": (rn.ATTN_OUT,),
                    "save_attn": (rn.ATTN_OUT, rn.ATTN_QKV),
                    "save_attn_qkv_raw": (rn.ATTN_OUT, rn.QKV_RAW),
                }[self.remat_policy]
                policy = jax.checkpoint_policies.save_only_these_names(*names)
            elif self.remat_policy:
                policy = getattr(jax.checkpoint_policies, self.remat_policy)
            else:
                policy = None
            layer_cls = nn.remat(TransformerLayer, static_argnums=(4,),
                                 policy=policy)

        def make_level(spec, prefix, level_idx, offset=0):
            cls = layer_cls
            if self.checkpointing and self.remat_levels is not None:
                sel = tuple(self.remat_levels)
                if level_idx not in sel and prefix not in sel:
                    cls = TransformerLayer
            def run(x, pos):
                for i in range(spec.depth):
                    shifted = (i + offset) % 2 == 1
                    name = f"{prefix}_layer_{i}"
                    a_off, f_off = (scale_offsets[name]
                                    if scale_offsets is not None
                                    else (None, None))
                    x = cls(
                        spec.width, spec.d_ff, spec.self_attn,
                        dropout=spec.dropout, shifted=shifted,
                        tp_axis=self.tp_axis, dtype=self.dtype,
                        attn_scale_offset=a_off, ff_scale_offset=f_off,
                        name=name)(x, pos, cond, deterministic)
                return x
            return run

        # Hourglass: down levels -> merges, mid, splits -> up levels
        skips, poses = [], []
        for i, spec in enumerate(self.levels[:-1]):
            x = make_level(spec, f"down_{i}", i)(x, pos)
            skips.append(x)
            poses.append(pos)
            x = TokenMerge(self.levels[i + 1].width, dtype=self.dtype,
                           name=f"merge_{i}")(x)
            pos = ops.downscale_pos(pos)

        x = make_level(self.levels[-1], "mid", len(self.levels) - 1)(x, pos)

        for i, spec in reversed(list(enumerate(self.levels[:-1]))):
            x = TokenSplit(spec.width, dtype=self.dtype, name=f"split_{i}")(x, skips[i])
            x = make_level(spec, f"up_{i}", i, offset=spec.depth)(x, poses[i])

        # Unpatching
        x = RMSNorm(name="out_norm")(x)
        x = TokenSplitWithoutSkip(self.out_channels, self.patch_size,
                                  zero_init=True, dtype=self.dtype,
                                  name="patch_out")(
            x, folded=deterministic, tokens=tokens)
        return x.astype(jnp.float32)


# Param taxonomy (reference :59-84, :708-719)

_WD_MODULE_NAMES = {"qkv_proj", "out_proj", "up_proj", "down_proj", "proj",
                    "mapping_linear"}


def classify_param(path):
    """Returns (is_wd, is_mapping) for a flattened param path tuple."""
    is_wd = path[-1] == "kernel" and len(path) >= 2 and path[-2] in _WD_MODULE_NAMES
    is_mapping = any(p == "mapping" or p == "mapping_linear" for p in path)
    return is_wd, is_mapping


def param_group_labels(params):
    """Labels every param with one of {'wd', 'no_wd', 'mapping_wd',
    'mapping_no_wd'} for optax.multi_transform — the pytree-path equivalent
    of the reference's tag-based 4-group split (reference :708-719)."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        is_wd, is_mapping = classify_param(path)
        labels[path] = ("mapping_" if is_mapping else "") + ("wd" if is_wd else "no_wd")
    return traverse_util.unflatten_dict(labels)

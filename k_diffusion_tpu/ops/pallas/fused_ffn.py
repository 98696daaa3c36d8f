"""Fused AdaRMSNorm + GEGLU feed-forward block as one Pallas TPU kernel.

The HDiT FF block (reference image_transformer_v2.py:479-493) is
``x + down(gelu-gate(up(adarmsnorm(x, cond))))``. Composed from XLA ops this
costs ~6 HBM round trips of the activation tensor per block; the reference
leans on torch.compile for the same fusion problem. This kernel keeps a token
tile in VMEM through norm -> up-projection -> GEGLU -> down-projection ->
skip-add, reading x once and writing the output once; both weight matrices
stay VMEM-resident across the token grid.

Train-eligible: the custom_vjp backward RECOMPUTES the up-projection from
x inside the backward kernel (one extra MXU matmul) instead of saving it as
a residual — at level-0 shapes the saved (b, t, 2*d_ff) tensor costs ~2x
more HBM round-trip time than the matmul costs MXU time, so recompute is
strictly faster AND more faithful (the recomputed f32 activations match the
forward exactly, where the saved residual was rounded to bf16). The forward
under differentiation is therefore the plain single-output eval kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOKEN_BLOCK = 512


def _ffn_reference(x, scale, w_up, w_down, eps):
    """Unfused spec (and the backward-pass path)."""
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    mean_sq = jnp.mean(jax.lax.square(x.astype(dtype)), axis=-1, keepdims=True)
    xn = (x * (scale.astype(dtype)[:, None, :]
               * jax.lax.rsqrt(mean_sq + eps)).astype(x.dtype))
    up = jnp.einsum("bte,ef->btf", xn, w_up.astype(x.dtype))
    a, gate = jnp.split(up, 2, axis=-1)
    h = a * jax.nn.gelu(gate, approximate=False)
    return x + jnp.einsum("btf,fe->bte", h, w_down.astype(x.dtype))


def _ffn_kernel(x_ref, scale_ref, w_up_ref, w_down_ref, o_ref, *, eps, d_ff):
    x = x_ref[0]                       # (T, d)
    scale = scale_ref[0]               # (1, d)
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    norm = scale.astype(jnp.float32) * jax.lax.rsqrt(mean_sq + eps)
    xn = (xf * norm).astype(x.dtype)
    up = jax.lax.dot_general(
        xn, w_up_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, 2f)
    a = up[:, :d_ff]
    gate = up[:, d_ff:]
    # erf-gelu via the clamped polynomial (erf_poly.py): no divide/exp on
    # the VPU — the GEGLU chain, not the matmuls, bounds these kernels
    from .erf_poly import gelu_poly
    gelu = gelu_poly(gate)
    h = (a * gelu).astype(x.dtype)
    out = jax.lax.dot_general(
        h, w_down_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (out + xf).astype(o_ref.dtype)


def _ffn_fwd(x, scale, w_up, w_down, eps, block, scale_block=0):
    # scale may be WIDER than d (a step's full precomputed cond-scales
    # table, condcache.py); the kernel reads its (1, 1, d) block at lane
    # offset scale_block*d straight out of it — no per-layer slice copies.
    b, t, d = x.shape
    d_ff = w_down.shape[0]
    grid = (b, pl.cdiv(t, block))
    return pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps, d_ff=d_ff),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, scale_block)),
            pl.BlockSpec((d, 2 * d_ff), lambda i, j: (0, 0)),
            pl.BlockSpec((d_ff, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # 1024-token blocks with the f32 up-projection exceed the default
        # 16M scoped-vmem budget; the chip has 128M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x, scale[:, None, :], w_up, w_down)


def _norm_head(x, scale, w_up, eps):
    """x -> up, exactly the reference's prologue math."""
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    mean_sq = jnp.mean(jax.lax.square(x.astype(dtype)), axis=-1, keepdims=True)
    xn = (x * (scale.astype(dtype)[:, None, :]
               * jax.lax.rsqrt(mean_sq + eps)).astype(x.dtype))
    return jnp.einsum("bte,ef->btf", xn, w_up.astype(x.dtype))


def _geglu_tail(up, w_down, x):
    """up -> x + down(geglu(up)), exactly the reference's epilogue math."""
    a, gate = jnp.split(up, 2, axis=-1)
    h = a * jax.nn.gelu(gate, approximate=False)
    return x + jnp.einsum("btf,fe->bte", h, w_down.astype(up.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_ffn_inner(x, scale, w_up, w_down, eps, block):
    return _ffn_fwd(x, scale, w_up, w_down, eps, block)

def _fused_ffn_inner_fwd(x, scale, w_up, w_down, eps, block):
    # the backward recomputes the up-projection in-kernel (see module
    # docstring), so nothing beyond the primal inputs is saved
    out = _ffn_fwd(x, scale, w_up, w_down, eps, block)
    return out, (x, scale, w_up, w_down)

def _ffn_bwd_kernel(x_ref, scale_ref, w_up_ref, w_down_ref, g_ref,
                    dx_ref, dscale_ref, dwu_ref, dwd_ref, *, eps, d_ff):
    """Fused backward: recompute norm factors, the up-projection (one MXU
    matmul — cheaper than round-tripping the (T, 2f) residual through HBM)
    and the GEGLU activations, then the 4 VJP matmuls — with the
    gelu-backward elementwise chain fused in VMEM instead of XLA
    materializing dh/dup/h maps in HBM. dW/dscale accumulate across grid
    programs via output-block revisiting (token blocks are the innermost
    grid dim)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[0]                       # (T, d) bf16
    g = g_ref[0]                       # (T, d)
    s = scale_ref[0]                   # (1, d)
    d = x.shape[-1]

    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    sf = s.astype(jnp.float32)
    xn = (xf * (sf * r)).astype(x.dtype)

    up = jax.lax.dot_general(
        xn, w_up_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, 2f) — matches the fwd

    a = up[:, :d_ff]
    gate = up[:, d_ff:]
    # erf-gelu fwd + bwd via the clamped polynomials (erf_poly.py):
    # gelu(g) = g * Phi(g); gelu'(g) = Phi(g) + g*phi(g)
    from .erf_poly import gelu_and_grad_poly
    gelu, dgelu = gelu_and_grad_poly(gate)
    h = (a * gelu).astype(x.dtype)

    dh = jax.lax.dot_general(
        g, w_down_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (T, f)
    da = dh * gelu
    dgate = dh * a * dgelu
    dup = jnp.concatenate([da, dgate], axis=1).astype(x.dtype)  # (T, 2f)

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        dwu_ref[...] = jnp.zeros_like(dwu_ref)

    dwd_ref[...] += jax.lax.dot_general(
        h, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (f, d)
    dwu_ref[...] += jax.lax.dot_general(
        xn, dup, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (d, 2f)

    dxn = jax.lax.dot_general(
        dup, w_up_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (T, d)
    g1 = dxn * sf
    dot = jnp.sum(g1 * xf, axis=-1, keepdims=True)
    dx = r * g1 - xf * (r * r * r / d) * dot + g.astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(j == 0)
    def _():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)

    dscale_ref[0] += jnp.sum(dxn * xf * r, axis=0, keepdims=True)  # (1, d)


def _ffn_bwd_pallas(x, scale, w_up, w_down, g, eps, block):
    b, t, d = x.shape
    d_ff = w_down.shape[0]
    grid = (b, t // block)
    dx, dscale, dwu, dwd = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, eps=eps, d_ff=d_ff),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d, 2 * d_ff), lambda i, j: (0, 0)),
            pl.BlockSpec((d_ff, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d, 2 * d_ff), lambda i, j: (0, 0)),
            pl.BlockSpec((d_ff, d), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 2 * d_ff), jnp.float32),
            jax.ShapeDtypeStruct((d_ff, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x, scale[:, None, :], w_up, w_down, g)
    return (dx, dscale.reshape(b, d).astype(scale.dtype),
            dwu.astype(w_up.dtype), dwd.astype(w_down.dtype))


def _fused_ffn_inner_bwd(eps, block, res, g):
    x, scale, w_up, w_down = res
    from . import xla_forced
    if jax.default_backend() == "tpu" and not xla_forced():
        return _ffn_bwd_pallas(x, scale, w_up, w_down, g, eps, block)
    up = _norm_head(x, scale, w_up, eps)
    _, tail_vjp = jax.vjp(lambda up_, wd_, x_: _geglu_tail(up_, wd_, x_),
                          up, w_down, x)
    dup, dw_down, dx_skip = tail_vjp(g)
    _, head_vjp = jax.vjp(lambda x_, s_, wu_: _norm_head(x_, s_, wu_, eps),
                          x, scale, w_up)
    dx, dscale, dw_up = head_vjp(dup)
    return dx + dx_skip, dscale, dw_up, dw_down

_fused_ffn_inner.defvjp(_fused_ffn_inner_fwd, _fused_ffn_inner_bwd)


def fused_geglu_ffn(x, scale, w_up, w_down, eps=1e-6, block=TOKEN_BLOCK,
                    scale_block=0):
    """x: (b, tokens, d); scale: (b, d) AdaRMSNorm scale (proj(cond)+1);
    w_up: (d, 2*d_ff); w_down: (d_ff, d). Returns x + FFN(norm(x)).

    Precomputed-cond (eval-only) path: scale may be (b, T) with T > d — a
    step's full cond-scales table (condcache.py) — with ``scale_block``
    selecting this layer's d-lane block (lane offset scale_block*d). The
    Pallas kernel reads the block directly via its BlockSpec; the fallback
    slices. This path is forward-only (it bypasses the custom_vjp)."""
    from . import xla_forced
    b, t, d = x.shape
    d_ff = w_down.shape[0]
    wide = scale.shape[-1] != d
    use_pallas = (jax.default_backend() == "tpu" and not xla_forced()
                  and t % block == 0 and d % 128 == 0 and d_ff % 128 == 0)
    if not use_pallas:
        if wide:
            scale = jax.lax.slice_in_dim(scale, scale_block * d,
                                         scale_block * d + d, axis=-1)
        return _ffn_reference(x, scale, w_up, w_down, eps)
    if wide:
        return _ffn_fwd(x, scale, w_up.astype(x.dtype), w_down.astype(x.dtype),
                        eps, block, scale_block)
    return _fused_ffn_inner(x, scale, w_up.astype(x.dtype),
                            w_down.astype(x.dtype), eps, block)

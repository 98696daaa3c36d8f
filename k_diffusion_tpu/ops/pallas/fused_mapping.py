"""Fused mapping network: RMSNorm -> n x (RMSNorm -> GEGLU FF -> residual)
-> RMSNorm as ONE Pallas kernel.

The mapping network (reference image_transformer_v2.py:129-168 runs it as a
stack of compiled modules) operates on a tiny (batch, width) activation but
costs ~11-17 separate op launches per denoiser call; at ~62 us per launch on
this runtime (see PERFORMANCE.md) that's ~15% of a sampling step. The whole
stack fits in VMEM (weights included), so one kernel replaces all of it.

Eval-path only via custom_vjp (reverse-mode backward recomputes through the
XLA composition); training uses the unfused path in the model.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gelu_erf(gate):
    """erf-gelu via the clamped polynomial (erf_poly.py): no divide/exp on
    the VPU; max abs error 7.3e-5, far below bf16 resolution."""
    from .erf_poly import gelu_poly
    return gelu_poly(gate)


def _mapping_kernel(*refs, n_blocks, d_ff, eps, compute_dtype):
    emb_ref = refs[0]
    in_scale_ref = refs[1]
    out_scale_ref = refs[2]
    block_refs = refs[3:3 + 3 * n_blocks]
    o_ref = refs[-1]

    def rms(x, scale_ref):
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        factor = (scale_ref[...] * jax.lax.rsqrt(ms + eps)).astype(compute_dtype)
        return (x.astype(compute_dtype) * factor).astype(jnp.float32)

    x = emb_ref[...].astype(jnp.float32)
    x = rms(x, in_scale_ref)
    dn = (((1,), (0,)), ((), ()))
    for i in range(n_blocks):
        ns_ref, wup_ref, wdown_ref = block_refs[3 * i:3 * i + 3]
        xn = rms(x, ns_ref).astype(compute_dtype)
        up = jax.lax.dot_general(xn, wup_ref[...], dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
        a, gate = up[:, :d_ff], up[:, d_ff:]
        h = (a * _gelu_erf(gate)).astype(compute_dtype)
        x = x + jax.lax.dot_general(h, wdown_ref[...], dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
    o_ref[...] = rms(x, out_scale_ref).astype(o_ref.dtype)


def _reference(emb, in_scale, out_scale, blocks, eps, dtype):
    """Unfused spec: exactly the model's unfused MappingNetwork chain."""
    from .. import norms
    x = norms.rms_norm(emb, in_scale, eps)
    for ns, w_up, w_down in blocks:
        xn = norms.rms_norm(x, ns, eps)
        up = xn.astype(dtype) @ w_up.astype(dtype)
        a, gate = jnp.split(up, 2, axis=-1)
        h = a * jax.nn.gelu(gate, approximate=False)
        x = x + h.astype(dtype) @ w_down.astype(dtype)
    return norms.rms_norm(x, out_scale, eps)


def _fused_fwd(emb, in_scale, out_scale, blocks, eps, dtype):
    b, d = emb.shape
    n_blocks = len(blocks)
    d_ff = blocks[0][2].shape[0]
    vec_spec = pl.BlockSpec((b, d), lambda: (0, 0))
    scale_spec = pl.BlockSpec((1, d), lambda: (0, 0))
    in_specs = [vec_spec, scale_spec, scale_spec]
    args = [emb, in_scale[None] + 0.0, out_scale[None] + 0.0]
    for ns, w_up, w_down in blocks:
        in_specs += [scale_spec,
                     pl.BlockSpec((d, 2 * d_ff), lambda: (0, 0)),
                     pl.BlockSpec((d_ff, d), lambda: (0, 0))]
        args += [ns[None] + 0.0, w_up.astype(dtype), w_down.astype(dtype)]
    return pl.pallas_call(
        functools.partial(_mapping_kernel, n_blocks=n_blocks, d_ff=d_ff,
                          eps=eps, compute_dtype=dtype),
        grid=(),
        in_specs=in_specs,
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), emb.dtype),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_inner(flat, n_blocks, eps, dtype):
    emb, in_scale, out_scale = flat[0], flat[1], flat[2]
    blocks = [tuple(flat[3 + 3 * i:6 + 3 * i]) for i in range(n_blocks)]
    return _fused_fwd(emb, in_scale, out_scale, blocks, eps, dtype)


def _fused_fwd_rule(flat, n_blocks, eps, dtype):
    return _fused_inner(flat, n_blocks, eps, dtype), flat


def _fused_bwd_rule(n_blocks, eps, dtype, flat, g):
    def ref(flat_):
        emb, in_scale, out_scale = flat_[0], flat_[1], flat_[2]
        blocks = [tuple(flat_[3 + 3 * i:6 + 3 * i]) for i in range(n_blocks)]
        return _reference(emb, in_scale, out_scale, blocks, eps, dtype)
    _, vjp = jax.vjp(ref, flat)
    return vjp(g)


_fused_inner.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_mapping(emb, in_scale, out_scale, blocks, eps=1e-6,
                  dtype=jnp.bfloat16):
    """emb (b, d); in_scale/out_scale (d,); blocks: list of
    (norm_scale (d,), w_up (d, 2*d_ff), w_down (d_ff, d)). Returns the
    mapping-network output (b, d). ``dtype`` is the matmul compute dtype
    (matching the unfused Dense layers)."""
    b, d = emb.shape
    d_ff = blocks[0][2].shape[0]
    from . import xla_forced
    ok = (jax.default_backend() == "tpu" and d % 128 == 0 and d_ff % 128 == 0
          and all(w.shape == (d, 2 * d_ff) and wd.shape == (d_ff, d)
                  for _, w, wd in blocks))
    if not ok or xla_forced():
        return _reference(emb, in_scale, out_scale, blocks, eps, dtype)
    flat = [emb, in_scale, out_scale]
    for blk in blocks:
        flat += list(blk)
    return _fused_inner(flat, len(blocks), eps, dtype)

"""Memory-efficient exact global attention as a Pallas TPU kernel.

Replaces FlashAttention-2 (reference image_transformer_v2.py:343-396,
image_transformer_v1.py:62-73): never materializes the (S, S) probability
matrix in HBM. Query blocks stream through VMEM against a VMEM-resident K/V
(one (S, e) copy per batch*head — fine for the sequence lengths diffusion
transformers see; the dispatch falls back to XLA SDPA beyond the VMEM
budget). Softmax statistics (logsumexp) are saved for a recompute-style
backward: a dq kernel over query blocks and a dk/dv kernel over key blocks.

Supports the HDiT's cosine-similarity attention via an explicit ``scale``
(the learned per-head scale is folded into q/k upstream, softmax_scale=1.0
just like the reference's flash_attn_qkvpacked_func(softmax_scale=1.0)).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_Q_BLOCK = 256
# below this, plain XLA SDPA is faster — measured BOTH ways: eval forward
# (launch overhead dominates) and the training grad step (A/B at the
# flagship's 256-token global level: Pallas-at-256 41.3 ms/step vs XLA
# 40.5 — XLA's materialized f32 probs cost less than the per-(batch*head)
# grid + pack transposes at this size, r3)
MIN_PALLAS_SEQ = 512
MIN_PALLAS_SEQ_TRAIN = 512
# beyond this seq len the (S, e) kv copies + (TQ, S) logits stop fitting VMEM
MAX_PALLAS_SEQ = 8192


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, seq_len, tq):
    i = pl.program_id(1)
    q = q_ref[0]   # (tq, e)
    ks = k_ref[0]  # (s, e)
    vs = v_ref[0]
    s = jax.lax.dot_general(
        q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (tq, s)
    # mask padded queries/keys when seq_len % block != 0
    if seq_len % tq != 0 or seq_len != ks.shape[0]:
        ik = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ik < seq_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(q_ref.dtype), vs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               scale, seq_len, tq):
    q = q_ref[0]
    ks = k_ref[0]
    vs = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]      # (tq, 1)
    delta = delta_ref[0, 0]  # (tq, 1)
    s = jax.lax.dot_general(
        q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if seq_len != ks.shape[0]:
        ik = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ik < seq_len, s, -jnp.inf)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, vs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q_ref.dtype)
    dq = jax.lax.dot_general(
        ds, ks, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, seq_len, tk):
    j = pl.program_id(1)
    qs = q_ref[0]    # (s, e) full queries
    kt = k_ref[0]    # (tk, e)
    vt = v_ref[0]
    do = do_ref[0]   # (s, e)
    lse = lse_ref[0]                     # (s, 1)
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        qs, kt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (s, tk)
    if seq_len != qs.shape[0]:
        iq = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(iq < seq_len, s, -jnp.inf)
        p = jnp.where(iq < seq_len, jnp.exp(s - lse), 0.0)
    else:
        p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(
        p.astype(q_ref.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (tk, e)
    dp = jax.lax.dot_general(
        do, vt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (s, tk)
    ds = (p * (dp - delta)).astype(q_ref.dtype)
    dk = jax.lax.dot_general(
        ds, qs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (tk, e)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale, tq):
    n, s, e = q.shape
    grid = (n, pl.cdiv(s, tq))
    full = pl.BlockSpec((1, s, e), lambda i, j: (i, 0, 0))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq_len=s, tq=tq),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tq, e), lambda i, j: (i, j, 0)), full, full],
        out_specs=[pl.BlockSpec((1, tq, e), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, 1, tq, 1), lambda i, j: (i, j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((n, pl.cdiv(s, tq), tq, 1), jnp.float32)],
    )(q, k, v)
    return out, lse


def _flash_bwd(scale, tq, res, dout):
    q, k, v, out, lse = res
    n, s, e = q.shape
    nb = pl.cdiv(s, tq)
    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    delta_tiles = delta.reshape(n, nb, tq, 1)
    lse_flat = lse.reshape(n, s, 1)
    delta_flat = delta.reshape(n, s, 1)
    grid = (n, nb)
    full = pl.BlockSpec((1, s, e), lambda i, j: (i, 0, 0))
    full2 = pl.BlockSpec((1, s, 1), lambda i, j: (i, 0, 0))
    tile = pl.BlockSpec((1, tq, e), lambda i, j: (i, j, 0))
    stat = pl.BlockSpec((1, 1, tq, 1), lambda i, j: (i, j, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, seq_len=s, tq=tq),
        grid=grid,
        in_specs=[tile, full, full, tile, stat, stat],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, dout, lse, delta_tiles)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, seq_len=s, tk=tq),
        grid=grid,
        in_specs=[full, tile, tile, full, full2, full2],
        out_specs=[tile, tile],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
    )(q, k, v, dout, lse_flat, delta_flat)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_inner(q, k, v, scale, tq):
    out, _ = _flash_fwd(q, k, v, scale, tq)
    return out

def _flash_inner_fwd(q, k, v, scale, tq):
    from .remat_names import name_tree, ATTN_OUT, ATTN_QKV
    out, lse = _flash_fwd(q, k, v, scale, tq)
    return out, (*name_tree((q, k, v), ATTN_QKV),
                 *name_tree((out, lse), ATTN_OUT))

def _flash_inner_bwd(scale, tq, res, dout):
    return _flash_bwd(scale, tq, res, dout)

_flash_inner.defvjp(_flash_inner_fwd, _flash_inner_bwd)


def flash_attention(q, k, v, scale=1.0, q_block=DEFAULT_Q_BLOCK, train=False):
    """Exact global attention. q,k,v: (batch, seq, heads, head_dim).
    Pallas on TPU for seq <= MAX_PALLAS_SEQ (larger falls back to XLA);
    ``train`` lowers the minimum Pallas length (see MIN_PALLAS_SEQ_TRAIN)."""
    b, s, heads, e = q.shape
    from . import xla_forced
    min_seq = MIN_PALLAS_SEQ_TRAIN if train else MIN_PALLAS_SEQ
    if (jax.default_backend() != "tpu" or xla_forced() or s > MAX_PALLAS_SEQ
            or s < min_seq):
        return jax.nn.dot_product_attention(q, k, v, scale=scale)

    def pack(t):
        return jnp.moveaxis(t, 2, 1).reshape(b * heads, s, e)
    out = _flash_inner(pack(q), pack(k), pack(v), scale, min(q_block, s))
    return jnp.moveaxis(out.reshape(b, heads, s, e), 1, 2)

"""Channel-packed global attention for short sequences as one Pallas kernel.

The hourglass's coarsest level runs GLOBAL attention over few tokens (256
at the flagship's 16x16 mid level; reference image_transformer_v2.py:
355-396). At that size both existing paths pay pure overhead:

- the per-(batch*head) Pallas flash kernel needs (b, s, heads, e) inputs,
  so the model's natural channel-packed (b, s, heads*e) activations (the
  fused-prologue outputs) are transposed in and out (~0.1 ms copies per
  layer at batch 32), and 256-token programs underfill the grid;
- XLA SDPA materializes the f32 (b, heads, s, s) probability maps in HBM
  (~0.29 ms/layer fwd+bwd at batch 32).

This kernel keeps the packed layout end to end (zero transposes) and the
probabilities in VMEM, using the same head-masked-matmul trick as
na2d_packed: zeroing the other heads' lanes of q restricts q @ k^T to one
head's subspace (k needs no mask — its other-head lanes multiply zeros),
and masking v restricts the AV product's output lanes, so per-head results
accumulate directly into the packed output. The whole (s, s) logit block
lives in VMEM (s <= MAX_SEQ), so the softmax is exact two-pass, no online
rescaling. The backward recomputes p from the saved per-head logsumexp and
runs the standard 5 head-masked matmuls, all in VMEM.

FLOP overhead is x (heads per 128-lane block) on the attention matmuls —
the MXU's minimum 128-lane contraction depth makes that free for e < 128
(any layout pays a >= 128-deep contraction).

Dispatch: `packed_global_ok` gates on shape; callers fall back to
`flash_attention` / XLA SDPA otherwise. XLA fallback == correctness spec.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_SEQ = 1024  # (s, s) f32 logits + packed blocks must fit VMEM


def packed_global_ok(s, c, e):
    return (jax.default_backend() == "tpu" and s <= MAX_SEQ and s >= 8
            and c % 128 == 0 and c <= 1024
            and ((128 % e == 0) if e < 128 else (e % 128 == 0)))


def _reference(q, k, v, n_heads, scale):
    b, s, c = q.shape
    e = c // n_heads
    def split(t):
        return t.reshape(b, s, n_heads, e)
    out = jax.nn.dot_product_attention(split(q), split(k), split(v),
                                       scale=scale)
    return out.reshape(b, s, c)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *res_refs, e, scale):
    q = q_ref[0]   # (s, cblk)
    k = k_ref[0]
    v = v_ref[0]
    s_len, cblk = q.shape
    hb = cblk // e
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_len, cblk), 1)
    out = jnp.zeros((s_len, cblk), jnp.float32)
    for h in range(hb):
        qh = q if hb == 1 else jnp.where((lane // e) == h, q, 0).astype(q.dtype)
        s_ = jax.lax.dot_general(
            qh, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (s, s)
        m = jnp.max(s_, axis=1, keepdims=True)
        p = jnp.exp(s_ - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        vh = v if hb == 1 else jnp.where((lane // e) == h, v, 0).astype(v.dtype)
        out = out + jax.lax.dot_general(
            (p / l).astype(q.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if res_refs:
            res_refs[0][0, 0, :, h:h + 1] = m + jnp.log(l)
    o_ref[0] = out.astype(o_ref.dtype)


def _gp_fwd(q, k, v, n_heads, scale, save_lse=False):
    b, s, c = q.shape
    e = c // n_heads
    cblk = 128 if (e <= 128 and c % 128 == 0) else e
    n_cblk = c // cblk
    hb = cblk // e
    grid = (b, n_cblk)
    blk = pl.BlockSpec((1, s, cblk), lambda i, cb: (i, 0, cb))
    out_specs = [blk]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_lse:
        # per-channel-block lse planes: block last two dims == array dims
        # (a flat (b, s, n_cblk*hb) with an (s, hb) block would violate
        # Mosaic's block-shape rule for n_cblk > 1)
        out_specs.append(pl.BlockSpec((1, 1, s, hb),
                                      lambda i, cb: (i, cb, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, n_cblk, s, hb), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, e=e, scale=scale),
        grid=grid,
        in_specs=[blk, blk, blk],
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shape if save_lse else out_shape[0],
    )(q, k, v)
    return res if save_lse else (res, None)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, e, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    s_len, cblk = q.shape
    hb = cblk // e
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_len, cblk), 1)
    # per-head delta = rowsum over the head's lanes of do*o, via one matmul
    # with the (cblk, hb) head-indicator matrix
    hrow = jax.lax.broadcasted_iota(jnp.int32, (cblk, hb), 0) // e
    hcol = jax.lax.broadcasted_iota(jnp.int32, (cblk, hb), 1)
    bdh = (hrow == hcol).astype(jnp.float32)
    delta = jax.lax.dot_general(
        do.astype(jnp.float32) * o.astype(jnp.float32), bdh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (s, hb)
    dq = jnp.zeros((s_len, cblk), jnp.float32)
    dk = jnp.zeros((s_len, cblk), jnp.float32)
    dv = jnp.zeros((s_len, cblk), jnp.float32)
    for h in range(hb):
        qh = q if hb == 1 else jnp.where((lane // e) == h, q, 0).astype(q.dtype)
        doh = do if hb == 1 else jnp.where((lane // e) == h, do,
                                           0).astype(do.dtype)
        s_ = jax.lax.dot_general(
            qh, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s_ - lse_ref[0, 0, :, h:h + 1])       # (s, s)
        dv = dv + jax.lax.dot_general(
            p.astype(q.dtype), doh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doh, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, h:h + 1])).astype(q.dtype)
        kh = k if hb == 1 else jnp.where((lane // e) == h, k, 0).astype(k.dtype)
        dq = dq + jax.lax.dot_general(
            ds, kh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = dk + jax.lax.dot_general(
            ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gp_inner(q, k, v, n_heads, scale):
    out, _ = _gp_fwd(q, k, v, n_heads, scale)
    return out


def _gp_inner_fwd(q, k, v, n_heads, scale):
    from .remat_names import name_tree, ATTN_OUT, ATTN_QKV
    out, lse = _gp_fwd(q, k, v, n_heads, scale, save_lse=True)
    return out, (*name_tree((q, k, v), ATTN_QKV),
                 *name_tree((out, lse), ATTN_OUT))


def _gp_inner_bwd(n_heads, scale, res, dout):
    q, k, v, out, lse = res
    from . import xla_forced
    if jax.default_backend() != "tpu" or xla_forced():
        _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, n_heads,
                                                       scale), q, k, v)
        return vjp(dout)
    b, s, c = q.shape
    e = c // n_heads
    cblk = 128 if (e <= 128 and c % 128 == 0) else e
    n_cblk = c // cblk
    hb = cblk // e
    grid = (b, n_cblk)
    blk = pl.BlockSpec((1, s, cblk), lambda i, cb: (i, 0, cb))
    lse_blk = pl.BlockSpec((1, 1, s, hb), lambda i, cb: (i, cb, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, e=e, scale=scale),
        grid=grid,
        in_specs=[blk, blk, blk, blk, blk, lse_blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
    )(q, k, v, dout, out, lse)
    return dq, dk, dv


_gp_inner.defvjp(_gp_inner_fwd, _gp_inner_bwd)


def packed_global_attention(q, k, v, n_heads, scale=1.0):
    """Exact global attention on channel-packed maps. q,k,v: (b, s,
    heads*e). Falls back to the XLA reference when the shape is unsupported
    or off-TPU (callers may prefer `flash_attention` for long sequences —
    see `packed_global_ok`)."""
    b, s, c = q.shape
    e = c // n_heads
    from . import xla_forced
    if not packed_global_ok(s, c, e) or xla_forced():
        return _reference(q, k, v, n_heads, scale)
    return _gp_inner(q, k, v, n_heads, scale)

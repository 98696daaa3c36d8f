"""2-D neighborhood (sliding-window) attention as a Pallas TPU kernel.

Replaces NATTEN's CUDA kernels (reference image_transformer_v2.py:399-443)
with a TPU-native design:

- Queries are processed in 2-D spatial tiles (TQ x TQ tokens -> one
  (TQ^2, e) row block) instead of NATTEN's per-query gather, which has no
  efficient TPU mapping.
- For each query tile, the union of all its clamped k x k windows is a
  contiguous halo slice of the key/value map — padded up to a multiple of 8
  rows/cols so flattening (rows, cols, e) -> (rows*cols, e) is
  layout-trivial — dynamically sliced out of a VMEM-resident copy of the
  full map. Each tile's attention is then one dense (TQ^2) x (KR^2) MXU
  matmul plus an iota-computed window mask; keys pulled in by the padding
  are masked off. No online softmax is needed: every query's full window
  lives inside its tile's kv slice.
- NATTEN's edge behavior (windows clamped inward so every query attends to
  exactly k x k keys) is reproduced by the mask; `na2d_reference` (the masked
  XLA path, ops.attention.neighborhood_attention) is the correctness spec.
- Per-query logsumexp is saved as a (TQ^2, 1) column per tile (lane dim 1 ==
  array dim, satisfying Mosaic block tiling) for the backward pass.

Backward recomputes attention flash-style: a dq kernel over query tiles and
a dk/dv kernel over key tiles. A key at (kh,kw) is only visible to queries
within Chebyshev distance k-1, so the dkv kernel loads a full-width row slab
of queries around the key tile (row-only dynamic slicing keeps the lane
dimension static) and masks columns.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..attention import neighborhood_attention as _xla_na

DEFAULT_TILE = 16


def na2d_reference(q, k, v, kernel_size, scale=1.0):
    """Masked-SDPA XLA reference path (the correctness spec)."""
    return _xla_na(q, k, v, kernel_size, scale=scale)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _window_start(c, r, size, kernel_size):
    """Clamped window start for query coordinate c (NATTEN semantics)."""
    return jnp.clip(c - r, 0, size - kernel_size)


def _flat_mask(row0, col0, rs, cs, nq, nk, tq, kr, h, w, kk):
    """(nq, nk) bool mask on flattened (query, key) index spaces."""
    r = (kk - 1) // 2
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    qh = row0 + iq // tq
    qw = col0 + iq % tq
    kh = rs + ik // kr
    kw = cs + ik % kr
    wh = _window_start(qh, r, h, kk)
    ww = _window_start(qw, r, w, kk)
    return ((kh >= wh) & (kh < wh + kk) & (kw >= ww) & (kw < ww + kk)
            & (kh < h) & (kw < w))


def _na_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, kernel_size, tq,
                   h, w, scale):
    kk = kernel_size
    r = (kk - 1) // 2
    kr = min(_round_up(tq + kk - 1, 8), h)
    # w is the sublane dim of the (w, e) tiles: its slice offset must be
    # 8-aligned, so align down and widen the halo by one sublane group
    krw = min(_round_up(tq + kk - 1, 8) + 8, w)
    e = q_ref.shape[-1]
    nq, nk = tq * tq, kr * krw

    row0 = pl.program_id(1) * tq
    col0 = pl.program_id(2) * tq
    rs = jnp.clip(row0 - r, 0, h - kr)
    cs = pl.multiple_of(jnp.clip(col0 - r, 0, w - krw) // 8 * 8, 8)
    ks = k_ref[0, pl.ds(rs, kr), pl.ds(cs, krw), :].reshape(nk, e)
    vs = v_ref[0, pl.ds(rs, kr), pl.ds(cs, krw), :].reshape(nk, e)
    q = q_ref[0].reshape(nq, e)

    s = jax.lax.dot_general(
        q.astype(jnp.float32) * scale, ks.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nq, nk)
    mask = _flat_mask(row0, col0, rs, cs, nq, nk, tq, krw, h, w, kk)
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p / l, vs.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nq, e)
    o_ref[0] = o.reshape(tq, tq, e).astype(o_ref.dtype)
    lse_ref[0, 0, 0] = m + jnp.log(l)


def _na_fwd(q, k, v, kernel_size, scale, tile):
    """q,k,v: (n, h, w, e) with n = batch*heads. Returns (out, lse_tiles)."""
    n, h, w, e = q.shape
    tq = tile
    nrb, ncb = h // tq, w // tq
    grid = (n, nrb, ncb)
    kv_spec = pl.BlockSpec((1, h, w, e), lambda i, j, l: (i, 0, 0, 0))
    out, lse = pl.pallas_call(
        functools.partial(_na_fwd_kernel, kernel_size=kernel_size, tq=tq,
                          h=h, w=w, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, tq, e), lambda i, j, l: (i, j, l, 0)),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, tq, tq, e), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, 1, tq * tq, 1), lambda i, j, l: (i, j, l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((n, nrb, ncb, tq * tq, 1), jnp.float32),
        ],
    )(q, k, v)
    return out, lse


def _na_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                  kernel_size, tq, h, w, scale):
    kk = kernel_size
    r = (kk - 1) // 2
    kr = min(_round_up(tq + kk - 1, 8), h)
    krw = min(_round_up(tq + kk - 1, 8) + 8, w)
    e = q_ref.shape[-1]
    nq, nk = tq * tq, kr * krw

    row0 = pl.program_id(1) * tq
    col0 = pl.program_id(2) * tq
    rs = jnp.clip(row0 - r, 0, h - kr)
    cs = pl.multiple_of(jnp.clip(col0 - r, 0, w - krw) // 8 * 8, 8)
    ks = k_ref[0, pl.ds(rs, kr), pl.ds(cs, krw), :].reshape(nk, e).astype(jnp.float32)
    vs = v_ref[0, pl.ds(rs, kr), pl.ds(cs, krw), :].reshape(nk, e).astype(jnp.float32)
    q = q_ref[0].reshape(nq, e).astype(jnp.float32)
    do = do_ref[0].reshape(nq, e).astype(jnp.float32)
    lse = lse_ref[0, 0, 0]      # (nq, 1)
    delta = delta_ref[0, 0, 0]  # (nq, 1)

    s = jax.lax.dot_general(
        q * scale, ks, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    mask = _flat_mask(row0, col0, rs, cs, nq, nk, tq, krw, h, w, kk)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do, vs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(
        ds, ks, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.reshape(tq, tq, e).astype(dq_ref.dtype)


def _na_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dk_ref, dv_ref, *, kernel_size, tk, h, w, scale):
    """Grid over KEY tiles. Loads a full-width row slab of queries (the only
    rows whose windows can reach this key tile) and masks columns."""
    kk = kernel_size
    halo = kk - 1
    qr = min(_round_up(tk + 2 * halo, 8), h)
    e = q_ref.shape[-1]
    nq, nk = qr * w, tk * tk

    krow0 = pl.program_id(1) * tk
    kcol0 = pl.program_id(2) * tk
    rs = jnp.clip(krow0 - halo, 0, h - qr)

    qs3 = q_ref[0, pl.ds(rs, qr), :, :].astype(jnp.float32)   # (qr, w, e)
    dos3 = do_ref[0, pl.ds(rs, qr), :, :].astype(jnp.float32)
    lse2 = lse_ref[0, pl.ds(rs, qr), :]                        # (qr, w)
    delta2 = delta_ref[0, pl.ds(rs, qr), :]
    kt = k_ref[0].reshape(nk, e).astype(jnp.float32)
    vt = v_ref[0].reshape(nk, e).astype(jnp.float32)

    # softmax math in 3-D (lse/delta stay in (qr, w) map layout); flatten
    # only across (qr, w) — a sublane merge, layout-trivial since w % 8 == 0
    s3 = jax.lax.dot_general(
        qs3 * scale, kt, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (qr, w, nk)

    r = (kk - 1) // 2
    shape3 = (qr, w, nk)
    qh = rs + jax.lax.broadcasted_iota(jnp.int32, shape3, 0)
    qw = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    ik = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    kh = krow0 + ik // tk
    kw = kcol0 + ik % tk
    wh = _window_start(qh, r, h, kk)
    ww = _window_start(qw, r, w, kk)
    mask = (kh >= wh) & (kh < wh + kk) & (kw >= ww) & (kw < ww + kk)

    p3 = jnp.where(mask, jnp.exp(s3 - lse2[:, :, None]), 0.0)
    p2 = p3.reshape(nq, nk)
    dos2 = dos3.reshape(nq, e)
    qs2 = qs3.reshape(nq, e)
    dv = jax.lax.dot_general(
        p2, dos2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nk, e)
    dp2 = jax.lax.dot_general(
        dos2, vt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nq, nk)
    ds3 = p3 * (dp2.reshape(qr, w, nk) - delta2[:, :, None])
    dk = jax.lax.dot_general(
        ds3.reshape(nq, nk), qs2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (nk, e)
    dk_ref[0] = dk.reshape(tk, tk, e).astype(dk_ref.dtype)
    dv_ref[0] = dv.reshape(tk, tk, e).astype(dv_ref.dtype)


def _na_bwd(kernel_size, scale, tile, res, dout):
    q, k, v, out, lse_tiles = res
    n, h, w, e = q.shape
    tq = tile
    nrb, ncb = h // tq, w // tq
    delta_map = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    # (n, h, w) -> tilewise (n, nrb, ncb, tq*tq, 1)
    delta_tiles = delta_map.reshape(n, nrb, tq, ncb, tq)
    delta_tiles = jnp.moveaxis(delta_tiles, 2, 3).reshape(n, nrb, ncb, tq * tq, 1)
    # tilewise -> map for the dkv kernel
    lse_map = jnp.moveaxis(
        lse_tiles.reshape(n, nrb, ncb, tq, tq), 3, 2).reshape(n, h, w)
    grid = (n, nrb, ncb)
    full = pl.BlockSpec((1, h, w, e), lambda i, j, l: (i, 0, 0, 0))
    full2d = pl.BlockSpec((1, h, w), lambda i, j, l: (i, 0, 0))
    tile4 = pl.BlockSpec((1, tq, tq, e), lambda i, j, l: (i, j, l, 0))
    stat = pl.BlockSpec((1, 1, 1, tq * tq, 1), lambda i, j, l: (i, j, l, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_na_dq_kernel, kernel_size=kernel_size, tq=tq,
                          h=h, w=w, scale=scale),
        grid=grid,
        in_specs=[tile4, full, full, tile4, stat, stat],
        out_specs=tile4,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, dout, lse_tiles, delta_tiles)

    dk, dv = pl.pallas_call(
        functools.partial(_na_dkv_kernel, kernel_size=kernel_size, tk=tq,
                          h=h, w=w, scale=scale),
        grid=grid,
        in_specs=[full, tile4, tile4, full, full2d, full2d],
        out_specs=[tile4, tile4],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
    )(q, k, v, dout, lse_map, delta_map)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _na2d_inner(q, k, v, kernel_size, scale, tile):
    out, _ = _na_fwd(q, k, v, kernel_size, scale, tile)
    return out

def _na2d_inner_fwd(q, k, v, kernel_size, scale, tile):
    out, lse = _na_fwd(q, k, v, kernel_size, scale, tile)
    return out, (q, k, v, out, lse)

def _na2d_inner_bwd(kernel_size, scale, tile, res, dout):
    return _na_bwd(kernel_size, scale, tile, res, dout)

_na2d_inner.defvjp(_na2d_inner_fwd, _na2d_inner_bwd)


def _use_pallas(h, w, kernel_size, tile):
    if jax.default_backend() != "tpu":
        return False
    kr = tile + kernel_size - 1
    return (h >= kr and w >= kr and h % tile == 0 and w % tile == 0
            and w % 8 == 0 and kernel_size % 2 == 1)


def na2d(q, k, v, kernel_size, scale=1.0, tile=DEFAULT_TILE):
    """2-D neighborhood attention. q,k,v: (b, h, w, heads, e).

    Dispatches to the Pallas TPU kernel when the map tiles cleanly (and we're
    on TPU); otherwise the masked-SDPA XLA path — mirroring the reference's
    fused/unfused dual paths (image_transformer_v2.py:421-440).
    """
    b, h, w, heads, e = q.shape
    if not _use_pallas(h, w, kernel_size, tile):
        return _xla_na(q, k, v, kernel_size, scale=scale)
    # (b, h, w, heads, e) -> (b*heads, h, w, e)
    def pack(t):
        return jnp.moveaxis(t, 3, 1).reshape(b * heads, h, w, e)
    out = _na2d_inner(pack(q), pack(k), pack(v), kernel_size, scale, tile)
    return jnp.moveaxis(out.reshape(b, heads, h, w, e), 1, 3)

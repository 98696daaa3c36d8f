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
from jax.experimental.pallas import tpu as pltpu

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


def _halo_geometry(h, w, kk, tq):
    """Static halo geometry shared by the halo gather and the mask tables.
    Halos are extracted on the XLA side (one fused gather per call). The
    column count is padded up to a multiple of 8: the in-kernel flatten
    (kr, krw, e) -> (kr*krw, e) is only layout-trivial when the sublane dim
    krw is a multiple of 8 (otherwise XLA materializes a relayout copy of
    the whole halo tensor). The extra columns are real, unique positions;
    the exact per-(query, key-position) window test in the mask tables
    keeps them from changing the result."""
    r = (kk - 1) // 2
    kr = min(tq + kk - 1, h)
    krw = min(_round_up(tq + kk - 1, 8), w)
    return r, kr, krw


@functools.lru_cache
def _halo_indices(h, w, kk, tq):
    """Static (nrb, kr) row and (ncb, krw) col gather indices per tile, at
    the forward window-radius halo (every caller, incl. the dkv backward,
    uses it: clamped windows never reach outside the forward halo)."""
    import numpy as np
    r, kr, krw = _halo_geometry(h, w, kk, tq)
    nrb, ncb = h // tq, w // tq
    rows = np.zeros((nrb, kr), np.int32)
    cols = np.zeros((ncb, krw), np.int32)
    for j in range(nrb):
        rs = int(np.clip(j * tq - r, 0, h - kr))
        rows[j] = np.arange(rs, rs + kr)
    for l in range(ncb):
        cs = int(np.clip(l * tq - r, 0, w - krw))
        cols[l] = np.arange(cs, cs + krw)
    return rows, cols


def _extract_halos(x, kk, tq):
    """(n, h, w, e) -> (n, nrb, ncb, kr*krw, e): per-tile halo windows.

    Built from STATIC slices + stack (tile offsets are compile-time
    constants): a fancy-index gather here produces a transposed output
    layout that XLA then fixes with a full-tensor relayout copy, while
    static slices concatenate directly in the native layout. The (kr, krw)
    flatten is layout-trivial because krw is padded to a multiple of 8
    (see _halo_geometry)."""
    n, h, w, e = x.shape
    rows, cols = _halo_indices(h, w, kk, tq)
    nrb, kr = rows.shape
    ncb, krw = cols.shape
    tiles = []
    for j in range(nrb):
        rs = int(rows[j][0])
        for l in range(ncb):
            cs = int(cols[l][0])
            tiles.append(jax.lax.slice(
                x, (0, rs, cs, 0), (n, rs + kr, cs + krw, e)))
    halos = jnp.stack(tiles, axis=1)               # (n, nrb*ncb, kr, krw, e)
    return halos.reshape(n, nrb, ncb, kr * krw, e)


def _np_window_start(c, r, size, kk):
    import numpy as np
    return np.clip(c - r, 0, size - kk)


@functools.lru_cache
def _fwd_masks(h, w, kk, tq):
    """uint8 (nrb, ncb, nq, nk) mask tables, precomputed on host: the mask
    is a pure function of the tile position, so it is DMA'd into the kernel
    instead of being recomputed from iotas on the VPU every program (the
    iota chain dominated kernel time)."""
    import numpy as np
    r, kr, krw = _halo_geometry(h, w, kk, tq)
    nrb, ncb = h // tq, w // tq
    nq, nk = tq * tq, kr * krw
    out = np.zeros((nrb, ncb, nq, nk), np.float32)
    iq = np.arange(nq)[:, None]
    ik = np.arange(nk)[None, :]
    for jr in range(nrb):
        for jc in range(ncb):
            row0, col0 = jr * tq, jc * tq
            rs = np.clip(row0 - r, 0, h - kr)
            cs = np.clip(col0 - r, 0, w - krw)
            qh = row0 + iq // tq
            qw = col0 + iq % tq
            kh = rs + ik // krw
            kw = cs + ik % krw
            wh = _np_window_start(qh, r, h, kk)
            ww = _np_window_start(qw, r, w, kk)
            m = ((kh >= wh) & (kh < wh + kk) & (kw >= ww) & (kw < ww + kk)
                 & (kh < h) & (kw < w))
            out[jr, jc] = m
    return out


@functools.lru_cache
def _dkv_masks(h, w, kk, tq):
    """uint8 (nrb, ncb, qr, w, nk) mask tables for the dkv kernel (full-width
    row-slab query geometry — measured faster end-to-end than gathering 2-D
    query halos, whose materialization costs more HBM traffic than the
    smaller matmuls save)."""
    import numpy as np
    halo = kk - 1
    qr = min(_round_up(tq + 2 * halo, 8), h)
    r = (kk - 1) // 2
    nrb, ncb = h // tq, w // tq
    nk = tq * tq
    out = np.zeros((nrb, ncb, qr, w, nk), np.uint8)
    iqh = np.arange(qr)[:, None, None]
    iqw = np.arange(w)[None, :, None]
    ik = np.arange(nk)[None, None, :]
    for jr in range(nrb):
        for jc in range(ncb):
            krow0, kcol0 = jr * tq, jc * tq
            rs = np.clip(krow0 - halo, 0, h - qr)
            qh = rs + iqh
            qw = iqw
            kh = krow0 + ik // tq
            kw = kcol0 + ik % tq
            wh = _np_window_start(qh, r, h, kk)
            ww = _np_window_start(qw, r, w, kk)
            out[jr, jc] = ((kh >= wh) & (kh < wh + kk)
                           & (kw >= ww) & (kw < ww + kk))
    return out


def _na_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                   kernel_size, tq, h, w, scale):
    e = q_ref.shape[-1]
    nq = tq * tq
    ks = k_ref[0, 0, 0]  # (nk, e) pre-gathered halo
    vs = v_ref[0, 0, 0]
    q = q_ref[0].reshape(nq, e)

    # matmuls take the input dtype (bf16 in production) and accumulate in
    # f32 on the MXU; only the softmax math is f32.
    # HDiT attention is cosine-sim (bounded logits), so the softmax skips the
    # running-max pass and masks multiplicatively: exp(s) cannot overflow for
    # |s| <~ 80, and the model's logits are <= per-head scale (~10).
    s = jax.lax.dot_general(
        q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (nq, nk)
    mask = mask_ref[0, 0]
    p = jnp.exp(s) * mask
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(q_ref.dtype), vs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nq, e)
    o_ref[0] = o.reshape(tq, tq, e).astype(o_ref.dtype)
    lse_ref[0, 0, 0] = jnp.log(l)


def _na_fwd(q, k, v, kernel_size, scale, tile):
    """q,k,v: (n, h, w, e) with n = batch*heads. Returns (out, lse_tiles)."""
    n, h, w, e = q.shape
    tq = tile
    nrb, ncb = h // tq, w // tq
    # batch fastest: per-tile mask blocks are DMA'd once, reused across n
    grid = (nrb, ncb, n)
    masks = jnp.asarray(_fwd_masks(h, w, kernel_size, tq))
    nq, nk = masks.shape[2], masks.shape[3]
    k_halo = _extract_halos(k, kernel_size, tq)
    v_halo = _extract_halos(v, kernel_size, tq)
    halo_spec = pl.BlockSpec((1, 1, 1, nk, e), lambda j, l, i: (i, j, l, 0, 0))
    out, lse = pl.pallas_call(
        functools.partial(_na_fwd_kernel, kernel_size=kernel_size, tq=tq,
                          h=h, w=w, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, tq, e), lambda j, l, i: (i, j, l, 0)),
            halo_spec,
            halo_spec,
            pl.BlockSpec((1, 1, nq, nk), lambda j, l, i: (j, l, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, tq, e), lambda j, l, i: (i, j, l, 0)),
            pl.BlockSpec((1, 1, 1, tq * tq, 1), lambda j, l, i: (i, j, l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((n, nrb, ncb, tq * tq, 1), jnp.float32),
        ],
    )(q, k_halo, v_halo, masks)
    return out, lse


def _na_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
                  dq_ref, *, kernel_size, tq, h, w, scale):
    e = q_ref.shape[-1]
    nq = tq * tq
    ks = k_ref[0, 0, 0]  # (nk, e) pre-gathered halo
    vs = v_ref[0, 0, 0]
    q = q_ref[0].reshape(nq, e)
    do = do_ref[0].reshape(nq, e)
    lse = lse_ref[0, 0, 0]      # (nq, 1)
    delta = delta_ref[0, 0, 0]  # (nq, 1)

    s = jax.lax.dot_general(
        q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse) * mask_ref[0, 0]
    dp = jax.lax.dot_general(
        do, vs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q_ref.dtype)
    dq = jax.lax.dot_general(
        ds, ks, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.reshape(tq, tq, e).astype(dq_ref.dtype)


def _na_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
                   dk_ref, dv_ref, *, kernel_size, tk, h, w, scale):
    """Grid over KEY tiles. Loads a full-width row slab of queries (the only
    rows whose windows can reach this key tile) and masks columns. The q/do
    maps arrive as full-map blocks that stay VMEM-resident across a map's
    key tiles (grid iterates tiles fastest), so no query halos are
    materialized in HBM — measured faster than the 2-D-halo formulation
    despite the larger matmuls."""
    kk = kernel_size
    halo = kk - 1
    qr = min(_round_up(tk + 2 * halo, 8), h)
    e = q_ref.shape[-1]
    nq, nk = qr * w, tk * tk

    krow0 = pl.program_id(1) * tk
    kcol0 = pl.program_id(2) * tk
    rs = jnp.clip(krow0 - halo, 0, h - qr)

    qs3 = q_ref[0, pl.ds(rs, qr), :, :]   # (qr, w, e)
    dos3 = do_ref[0, pl.ds(rs, qr), :, :]
    lse2 = lse_ref[0, pl.ds(rs, qr), :]   # (qr, w)
    delta2 = delta_ref[0, pl.ds(rs, qr), :]
    kt = k_ref[0].reshape(nk, e)
    vt = v_ref[0].reshape(nk, e)

    # softmax math in 3-D (lse/delta stay in (qr, w) map layout); flatten
    # only across (qr, w) — a sublane merge, layout-trivial since w % 8 == 0
    s3 = jax.lax.dot_general(
        qs3, kt, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (qr, w, nk)

    p3 = jnp.where(mask_ref[0, 0] != 0,
                   jnp.exp(s3 - lse2[:, :, None]), 0.0)  # (qr, w, nk)
    p2 = p3.astype(q_ref.dtype).reshape(nq, nk)
    dos2 = dos3.reshape(nq, e)
    qs2 = qs3.reshape(nq, e)
    dv = jax.lax.dot_general(
        p2, dos2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nk, e)
    dp2 = jax.lax.dot_general(
        dos2, vt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nq, nk)
    ds3 = (p3 * (dp2.reshape(qr, w, nk) - delta2[:, :, None])).astype(q_ref.dtype)
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
    # tilewise -> map for the dkv halo gather
    lse_map = jnp.moveaxis(
        lse_tiles.reshape(n, nrb, ncb, tq, tq), 3, 2).reshape(n, h, w)
    # batch (n) is the FASTEST grid dim so the per-tile mask block is DMA'd
    # once and reused across the whole batch
    grid = (nrb, ncb, n)
    tile4 = pl.BlockSpec((1, tq, tq, e), lambda j, l, i: (i, j, l, 0))
    stat = pl.BlockSpec((1, 1, 1, tq * tq, 1), lambda j, l, i: (i, j, l, 0, 0))

    fwd_masks = jnp.asarray(_fwd_masks(h, w, kernel_size, tq))
    nq, nk = fwd_masks.shape[2], fwd_masks.shape[3]
    k_halo = _extract_halos(k, kernel_size, tq)
    v_halo = _extract_halos(v, kernel_size, tq)
    halo_spec = pl.BlockSpec((1, 1, 1, nk, e), lambda j, l, i: (i, j, l, 0, 0))
    dq = pl.pallas_call(
        functools.partial(_na_dq_kernel, kernel_size=kernel_size, tq=tq,
                          h=h, w=w, scale=scale),
        grid=grid,
        in_specs=[tile4, halo_spec, halo_spec, tile4, stat, stat,
                  pl.BlockSpec((1, 1, nq, nk), lambda j, l, i: (j, l, 0, 0))],
        out_specs=tile4,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k_halo, v_halo, dout, lse_tiles, delta_tiles, fwd_masks)

    # dkv: full q/do maps stay VMEM-resident per map (grid tiles-fastest)
    dkv_masks = jnp.asarray(_dkv_masks(h, w, kernel_size, tq))
    qr, nk2 = dkv_masks.shape[2], dkv_masks.shape[4]
    grid_kv = (n, nrb, ncb)
    full = pl.BlockSpec((1, h, w, e), lambda i, j, l: (i, 0, 0, 0))
    full2d = pl.BlockSpec((1, h, w), lambda i, j, l: (i, 0, 0))
    tile4_kv = pl.BlockSpec((1, tq, tq, e), lambda i, j, l: (i, j, l, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_na_dkv_kernel, kernel_size=kernel_size, tk=tq,
                          h=h, w=w, scale=scale),
        grid=grid_kv,
        in_specs=[full, tile4_kv, tile4_kv, full, full2d, full2d,
                  pl.BlockSpec((1, 1, qr, w, nk2),
                               lambda i, j, l: (j, l, 0, 0, 0))],
        out_specs=[tile4_kv, tile4_kv],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
    )(q, k, v, dout, lse_map, delta_map, dkv_masks)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _na2d_inner(q, k, v, kernel_size, scale, tile):
    out, _ = _na_fwd(q, k, v, kernel_size, scale, tile)
    return out

def _na2d_inner_fwd(q, k, v, kernel_size, scale, tile):
    from .remat_names import name_tree, ATTN_OUT, ATTN_QKV
    out, lse = _na_fwd(q, k, v, kernel_size, scale, tile)
    return out, (*name_tree((q, k, v), ATTN_QKV),
                 *name_tree((out, lse), ATTN_OUT))

def _na2d_inner_bwd(kernel_size, scale, tile, res, dout):
    return _na_bwd(kernel_size, scale, tile, res, dout)

_na2d_inner.defvjp(_na2d_inner_fwd, _na2d_inner_bwd)


def _use_pallas(h, w, kernel_size, tile):
    from . import xla_forced
    if jax.default_backend() != "tpu" or xla_forced():
        return False
    # halo geometry clamps to the map, so a tile as large as the whole map
    # is fine; only sub-map tiles need room for their full halo
    kr = min(tile + kernel_size - 1, h)
    krw = min(tile + kernel_size - 1, w)
    return (h >= kr and w >= krw and h % tile == 0 and w % tile == 0
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


# --- channel-packed variant -------------------------------------------------
# The model's natural activation layout is (b, h, w, heads*e) (a free reshape
# of the qkv projection output). The standard entry point transposes heads
# into the grid dimension, which costs HBM round trips; this variant keeps
# the packed layout and computes per-head attention with head-masked
# matmuls: zeroing the other heads' channels in q restricts q @ k^T to one
# head's subspace, and masking v restricts the AV product's output channels,
# so per-head results accumulate directly into the packed output. FLOP
# overhead is x heads on the attention matmuls — cheap next to the removed
# transposes at the head counts diffusion models use (2-8).


# Query-group blocking: a 16x16 query tile's halo holds kr x krw = 22x24
# keys but each query's window covers only 7x7 — most of a whole-tile
# (256, 528) logit block is masked waste (the kernels run at ~50% MXU on
# what they compute, so overcompute is the whole cost). Queries are
# processed in GQ x GC spatial groups, each scored against only its own
# (GQ + k - 1) x roundup8(GC + k - 1) key slab: at gq=4, gc=8, k=7 that is
# 8 groups x (32, 160) logits per tile vs (256, 528) — 3.3x fewer computed
# logits. Slab slices stay layout-trivial: column groups are materialized
# contiguously by _extract_halos_cg (static slices), and the row offset
# into a group's flat slab is a dynamic-sublane slice at a multiple of the
# (8-aligned) slab width.
#
# MEASURED (r3, level-0 shape b=8 64x64 c=128): the kernels are DMA/
# overhead-bound, not MXU-bound — finer groups compute fewer logits but
# run SLOWER (gq4/gc8: 184 us, gq2/gc8: 266 us vs gq4/gc16: 108 us), so
# the default keeps whole-width column groups; the wins instead come from
# the bf16 edge-class-deduped mask tables and channel-block grid below.
GROUP_ROWS = 4
GROUP_COLS = 16


def _fwd_group_geometry(h, kk, tq, gq):
    """Static per-group slab geometry: rows per group slab."""
    return min(gq + kk - 1, h)


def _halo_geometry_cg(h, w, kk, tq, gq, gc):
    """Static geometry of the column-grouped halo slabs."""
    r = (kk - 1) // 2
    kr = min(tq + kk - 1, h)                       # rows in a tile's halo
    krw = min(_round_up(gc + kk - 1, 8), w)        # cols in a group's slab
    kg = _fwd_group_geometry(h, kk, tq, gq)        # rows in a group's slab
    ng, ngc = tq // gq, tq // gc
    return r, kr, krw, kg, ng, ngc


@functools.lru_cache
def _halo_indices_cg(h, w, kk, tq, gq, gc):
    """Static row starts per tile-row and col starts per (tile-col, group)."""
    import numpy as np
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    nrb, ncb = h // tq, w // tq
    rows = np.asarray([int(np.clip(j * tq - r, 0, h - kr))
                       for j in range(nrb)], np.int32)
    cols = np.asarray([[int(np.clip(l * tq + cg * gc - r, 0, w - krw))
                        for cg in range(ngc)] for l in range(ncb)], np.int32)
    return rows, cols


def _extract_halos_cg(x, kk, tq, gq, gc):
    """(n, h, w, e) -> (nrb, ncb, n, ngc*kr*krw, e): per-(tile, col-group)
    halo slabs, stored contiguously per column group so the kernel's
    row-group slice [cg*kr*krw + og*krw : + kg*krw] is a flat sublane
    slice. Built from STATIC slices (see _extract_halos on why). The TILE
    dims lead (batch third): each stacked slice is a contiguous (n, nk, e)
    block in its natural slice layout, so XLA emits the gather directly in
    the standard layout the Pallas operand requires — with batch leading it
    inserted a ~0.18 ms relayout copy per halo array (6+ per step)."""
    n, h, w, e = x.shape
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    rows, cols = _halo_indices_cg(h, w, kk, tq, gq, gc)
    nrb, ncb = h // tq, w // tq
    tiles = []
    for j in range(nrb):
        rs = int(rows[j])
        for l in range(ncb):
            slabs = []
            for cg in range(ngc):
                cs = int(cols[l][cg])
                slabs.append(jax.lax.slice(
                    x, (0, rs, cs, 0),
                    (n, rs + kr, cs + krw, e)).reshape(n, kr * krw, e))
            tiles.append(jnp.concatenate(slabs, axis=1) if ngc > 1
                         else slabs[0])
    halos = jnp.stack(tiles, axis=0)       # (nrb*ncb, n, nk, e)
    return halos.reshape(nrb, ncb, n, ngc * kr * krw, e)


@functools.lru_cache
def _fwd_masks_grouped(h, w, kk, tq, gq, gc):
    """f32 (nrb, ncb, ng*ngc, gq*gc, kg*krw) mask tables for the grouped
    forward/backward kernels, host-precomputed (pure function of tile
    position). Group index is g * ngc + cg (row groups major)."""
    import numpy as np
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    rows, cols = _halo_indices_cg(h, w, kk, tq, gq, gc)
    nrb, ncb = h // tq, w // tq
    gnq, gnk = gq * gc, kg * krw
    out = np.zeros((nrb, ncb, ng * ngc, gnq, gnk), np.float32)
    iq = np.arange(gnq)[:, None]
    ik = np.arange(gnk)[None, :]
    for jr in range(nrb):
        rs = rows[jr]
        for jc in range(ncb):
            for g in range(ng):
                y0 = jr * tq + g * gq
                og = np.clip(np.clip(y0 - r, 0, h - kk) - rs, 0, kr - kg)
                for cg in range(ngc):
                    cs = cols[jc][cg]
                    qh = y0 + iq // gc
                    qw = jc * tq + cg * gc + iq % gc
                    kh = rs + og + ik // krw
                    kw = cs + ik % krw
                    wh = _np_window_start(qh, r, h, kk)
                    ww = _np_window_start(qw, r, w, kk)
                    out[jr, jc, g * ngc + cg] = (
                        (kh >= wh) & (kh < wh + kk)
                        & (kw >= ww) & (kw < ww + kk)
                        & (kh < h) & (kw < w))
    return out


# The mask depends on the tile position only through edge clamping, so all
# INTERIOR tiles share one pattern: the full (nrb, ncb, ...) table dedupes
# to a (3, 3, ...) edge-class table ({first, interior, last} per axis)
# indexed by the BlockSpec index map — an O(1)-in-map-size mask DMA
# footprint instead of O(tiles) (at 128x128 maps: 9 patterns vs 64).
# Stored bf16 (exact for 0/1): half the mask traffic of f32.


def _mask_table(h, w, kk, tq, gq, gc):
    """jnp bf16 (3, 3, ng*ngc, gnq, gnk) edge-class mask table."""
    import numpy as np
    full = _fwd_masks_grouped(h, w, kk, tq, gq, gc)
    nrb, ncb = h // tq, w // tq
    row_reps = [0, 1 if nrb > 2 else 0, nrb - 1]
    col_reps = [0, 1 if ncb > 2 else 0, ncb - 1]
    return jnp.asarray(full[np.ix_(row_reps, col_reps)], jnp.bfloat16)


def _mask_index_map(nrb, ncb):
    """BlockSpec index map (j, l, cb, i) -> edge-class mask block index."""
    def index_map(j, l, cb, i):
        jr = jnp.where(j == 0, 0, jnp.where(j == nrb - 1, 2, 1))
        jc = jnp.where(l == 0, 0, jnp.where(l == ncb - 1, 2, 1))
        return (jr, jc, 0, 0, 0)
    return index_map


def _packed_geometry(c, e):
    """Channel-block geometry: the grid's channel dim splits c into
    cblk-lane blocks of hb heads each, so per-head matmul depth is cblk
    (128 for e <= 128) instead of c — at level-1 widths (c=256, 4 heads)
    this HALVES the head-masked contraction's computed MACs."""
    cblk = e if e >= 128 else 128
    return c // cblk, cblk, cblk // e


def _na_packed_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *res_refs,
                          kernel_size, tq, gq, gc, h, w, scale, e):
    cblk = q_ref.shape[-1]
    hb = cblk // e
    kk = kernel_size
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    gnq, gnk = gq * gc, kg * krw
    j = pl.program_id(0)
    rs = jnp.clip(j * tq - r, 0, h - kr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (gnq, cblk), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (gnk, cblk), 1)
    for g in range(ng):
        y0 = j * tq + g * gq
        og = jnp.clip(jnp.clip(y0 - r, 0, h - kk) - rs, 0, kr - kg)
        grows = slice(g * gq, (g + 1) * gq)
        for cg in range(ngc):
            base = cg * (kr * krw)
            ks = k_ref[0, 0, 0, pl.ds(base + og * krw, gnk), :]
            vs = v_ref[0, 0, 0, pl.ds(base + og * krw, gnk), :]
            gcols = slice(cg * gc, (cg + 1) * gc)
            q = q_ref[0, grows, gcols, :].reshape(gnq, cblk)
            mask = mask_ref[0, 0, g * ngc + cg].astype(jnp.float32)
            out = jnp.zeros((gnq, cblk), jnp.float32)
            lses = []
            n_heads_blk = cblk // e
            for head in range(n_heads_blk):
                q_h = (q if n_heads_blk == 1
                       else jnp.where((lane // e) == head, q, 0).astype(q.dtype))
                s = jax.lax.dot_general(
                    q_h, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                p = jnp.exp(s) * mask
                l = jnp.sum(p, axis=1, keepdims=True)
                if res_refs:
                    # saved WITHOUT a running-max subtraction: the backward
                    # recomputes p = exp(s - lse), which is only finite
                    # while |logits| stays moderate (~<80). The learned
                    # per-head cosine-sim scale is what bounds s here (QK
                    # norm clamps the dot product to [-1, 1] x scale, itv2
                    # scale init 10) — this bounded-logit assumption is
                    # load-bearing for TRAINING gradients, not just
                    # inference.
                    lses.append(jnp.log(l))
                v_h = (vs if n_heads_blk == 1
                       else jnp.where((lane_k // e) == head, vs, 0).astype(vs.dtype))
                # normalize on the (gnq, cblk) output instead of the
                # (gnq, gnk) probabilities — cblk < gnk, and v_h is
                # head-masked so the per-head 1/l only touches this head's
                # lanes
                out = out + jax.lax.dot_general(
                    p.astype(q.dtype), v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) / l
            o_ref[0, grows, gcols, :] = (
                out.reshape(gq, gc, cblk).astype(o_ref.dtype))
            if res_refs:  # training: per-head logsumexp map for the backward
                res_refs[0][0, 0, grows, gcols, :] = (
                    jnp.concatenate(lses, axis=1).reshape(gq, gc, hb))


# The backward is COMPUTE-bound (5 head-masked matmuls per group vs the
# forward's 2, at batch-32 training shapes), so it prefers coarser row
# groups than the DMA-bound eval forward: fewer per-group fixed costs beat
# fewer computed logits. Measured (v5e, b=32 fwd+bwd): l0 gq 2/4/8/16 =
# 4.92/1.90/1.54/1.92 ms at tile 16, and 1.28 ms at tile 32 + gq 8.
TRAIN_GROUP_ROWS = 8


def _group_sizes(tq, coarse=False):
    rows = TRAIN_GROUP_ROWS if coarse else GROUP_ROWS
    gq = rows if tq % rows == 0 else tq
    gc = GROUP_COLS if tq % GROUP_COLS == 0 else tq
    return gq, gc


def _na_packed_fwd(q, k, v, kernel_size, scale, tile, n_heads,
                   save_lse=False):
    b, h, w, c = q.shape
    e = c // n_heads
    tq = tile
    # save_lse <=> training forward: share the backward's coarser groups
    gq, gc = _group_sizes(tq, coarse=save_lse)
    nrb, ncb = h // tq, w // tq
    n_cblk, cblk, hb = _packed_geometry(c, e)
    grid = (nrb, ncb, n_cblk, b)
    masks = _mask_table(h, w, kernel_size, tq, gq, gc)
    ng_t, gnq, gnk = masks.shape[2], masks.shape[3], masks.shape[4]
    k_halo = _extract_halos_cg(k, kernel_size, tq, gq, gc)
    v_halo = _extract_halos_cg(v, kernel_size, tq, gq, gc)
    nk = k_halo.shape[3]
    # halos are tile-major (nrb, ncb, n, nk, c) — see _extract_halos_cg
    halo_spec = pl.BlockSpec((1, 1, 1, nk, cblk),
                             lambda j, l, cb, i: (j, l, i, 0, cb))
    tile_spec = pl.BlockSpec((1, tq, tq, cblk),
                             lambda j, l, cb, i: (i, j, l, cb))
    out_specs = [tile_spec]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_lse:
        # native channel-blocked layout (b, n_cblk, h, w, hb); the backward
        # kernel consumes it with the same blocking
        out_specs.append(pl.BlockSpec((1, 1, tq, tq, hb),
                                      lambda j, l, cb, i: (i, cb, j, l, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, n_cblk, h, w, hb), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_na_packed_fwd_kernel, kernel_size=kernel_size,
                          tq=tq, gq=gq, gc=gc, h=h, w=w, scale=scale, e=e),
        grid=grid,
        in_specs=[
            tile_spec,
            halo_spec,
            halo_spec,
            pl.BlockSpec((1, 1, ng_t, gnq, gnk), _mask_index_map(nrb, ncb)),
        ],
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shape if save_lse else out_shape[0],
    )(q, k_halo, v_halo, masks)
    # training forward: hand the materialized halo slabs to the backward as
    # residuals — the backward consumes the SAME (tq, gq, gc) geometry, and
    # re-extracting them there costs ~0.1 ms/slab of pad/concat fusions that
    # XLA cannot CSE across the checkpoint_name residual boundary
    return (*res, k_halo, v_halo) if save_lse else (res, None)


def _na_packed_dqkv_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                           mask_ref, dq_ref, dk_ref, dv_ref, *, kernel_size,
                           tq, gq, gc, h, w, scale, e):
    """Channel-packed backward over QUERY tiles, (gq x gc)-grouped like the
    forward (shares its grouped mask tables and col-grouped halos): per-head
    head-masked matmuls produce dq directly AND per-(tile, col-group)
    halo-shaped dk/dv partials from the same p/ds blocks (ds^T q and
    p^T do). Each (query, key) pair lives in exactly one query group, so
    the partials overlap-add into the full dk/dv maps on the XLA side
    (_scatter_halos_cg) — ~10x fewer computed logits than a
    key-tile-centric dkv kernel whose full-width query slabs re-touch
    every pair."""
    cblk = q_ref.shape[-1]
    hb = cblk // e
    kk = kernel_size
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    gnq, gnk = gq * gc, kg * krw
    j = pl.program_id(0)
    rs = jnp.clip(j * tq - r, 0, h - kr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (gnq, cblk), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (gnk, cblk), 1)
    # per-head delta = rowsum over the head's lanes of do*o, via one matmul
    # with the (cblk, hb) head-indicator matrix
    hrow = jax.lax.broadcasted_iota(jnp.int32, (cblk, hb), 0) // e
    hcol = jax.lax.broadcasted_iota(jnp.int32, (cblk, hb), 1)
    bdh = (hrow == hcol).astype(jnp.float32)

    # row-group slabs overlap within a column group, so start from zero and
    # read-modify-write per row group
    dk_ref[0, 0, 0] = jnp.zeros_like(dk_ref[0, 0, 0])
    dv_ref[0, 0, 0] = jnp.zeros_like(dv_ref[0, 0, 0])

    for g in range(ng):
        y0 = j * tq + g * gq
        og = jnp.clip(jnp.clip(y0 - r, 0, h - kk) - rs, 0, kr - kg)
        grows = slice(g * gq, (g + 1) * gq)
        for cg in range(ngc):
            base = cg * (kr * krw)
            sl = pl.ds(base + og * krw, gnk)
            ks = k_ref[0, 0, 0, sl, :]
            vs = v_ref[0, 0, 0, sl, :]
            gcols = slice(cg * gc, (cg + 1) * gc)
            q = q_ref[0, grows, gcols, :].reshape(gnq, cblk)
            do = do_ref[0, grows, gcols, :].reshape(gnq, cblk)
            o = o_ref[0, grows, gcols, :].reshape(gnq, cblk)
            lse = lse_ref[0, 0, grows, gcols, :].reshape(gnq, hb)
            mask = mask_ref[0, 0, g * ngc + cg].astype(jnp.float32)
            delta = jax.lax.dot_general(
                do.astype(jnp.float32) * o.astype(jnp.float32), bdh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (gnq, hb)

            dq = jnp.zeros((gnq, cblk), jnp.float32)
            dk_g = jnp.zeros((gnk, cblk), jnp.float32)
            dv_g = jnp.zeros((gnk, cblk), jnp.float32)
            for head in range(hb):
                q_h = (q if hb == 1
                       else jnp.where((lane // e) == head, q, 0).astype(q.dtype))
                do_h = (do if hb == 1
                        else jnp.where((lane // e) == head, do, 0).astype(do.dtype))
                s = jax.lax.dot_general(
                    q_h, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                p = jnp.exp(s - lse[:, head:head + 1]) * mask
                dp = jax.lax.dot_general(
                    do_h, vs, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = (p * (dp - delta[:, head:head + 1])).astype(q.dtype)
                k_h = (ks if hb == 1
                       else jnp.where((lane_k // e) == head, ks, 0).astype(ks.dtype))
                dq = dq + jax.lax.dot_general(
                    ds, k_h, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk_g = dk_g + jax.lax.dot_general(
                    ds, q_h, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # (gnk, cblk)
                dv_g = dv_g + jax.lax.dot_general(
                    p.astype(q.dtype), do_h,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (gnk, cblk)
            dq_ref[0, grows, gcols, :] = (
                dq.reshape(gq, gc, cblk).astype(dq_ref.dtype))
            dk_ref[0, 0, 0, sl, :] = (dk_ref[0, 0, 0, sl, :]
                                      + dk_g.astype(dk_ref.dtype))
            dv_ref[0, 0, 0, sl, :] = (dv_ref[0, 0, 0, sl, :]
                                      + dv_g.astype(dv_ref.dtype))


def _scatter_halos_cg(halos, h, w, kk, tq, gq, gc):
    """(n, nrb, ncb, ngc*kr*krw, e) per-(tile, col-group) halo partials ->
    (n, h, w, e) by overlap-add: the exact transpose of _extract_halos_cg
    (static slices, so XLA lowers to in-place dynamic-update-slices)."""
    n, nrb, ncb, nk, e = halos.shape
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    rows, cols = _halo_indices_cg(h, w, kk, tq, gq, gc)
    hb = halos.reshape(n, nrb, ncb, ngc, kr, krw, e)
    out = jnp.zeros((n, h, w, e), halos.dtype)
    for j in range(nrb):
        rs = int(rows[j])
        for l in range(ncb):
            for cg in range(ngc):
                cs = int(cols[l][cg])
                out = out.at[:, rs:rs + kr, cs:cs + krw, :].add(
                    hb[:, j, l, cg])
    return out


def _overlap_add_kernel(dk_h_ref, dv_h_ref, dk_ref, dv_ref, *, h, w, kk, tq,
                        gq, gc):
    """In-VMEM overlap-add of the per-(tile, col-group) halo partials into
    full (h, w) maps. Every slice offset is a PYTHON constant (unrolled
    loops over tile indices): Mosaic cannot compile a dynamic second-minor
    (w) offset stacked on a dynamic major offset, and the XLA formulation
    (_scatter_halos_cg) pays a full-map dynamic-update-slice + layout copy
    per slab (~0.4 ms/slab at flagship level 0, the single largest
    train-step overhead after the matmuls themselves)."""
    r, kr, krw, kg, ng, ngc = _halo_geometry_cg(h, w, kk, tq, gq, gc)
    rows, cols = _halo_indices_cg(h, w, kk, tq, gq, gc)
    nrb, ncb = h // tq, w // tq
    cblk = dk_ref.shape[-1]
    dk_ref[0] = jnp.zeros_like(dk_ref[0])
    dv_ref[0] = jnp.zeros_like(dv_ref[0])
    for j in range(nrb):
        rs = int(rows[j])
        for l in range(ncb):
            for cg in range(ngc):
                cs = int(cols[l][cg])
                base = cg * kr * krw
                for h_ref, o_ref in ((dk_h_ref, dk_ref), (dv_h_ref, dv_ref)):
                    blk = h_ref[0, j, l, base:base + kr * krw, :] \
                        .reshape(kr, krw, cblk)
                    o_ref[0, rs:rs + kr, cs:cs + krw, :] = (
                        o_ref[0, rs:rs + kr, cs:cs + krw, :] + blk)


def _overlap_add_cg(dk_halo, dv_halo, h, w, kk, tq, gq, gc):
    """(b, nrb, ncb, nk, c) dk/dv halo partials -> (b, h, w, c) maps, as one
    Pallas kernel over (batch, channel-block). Falls back to the XLA
    scatter (the correctness spec) when a batch item's partials + maps
    exceed the VMEM budget."""
    b, nrb, ncb, nk, c = dk_halo.shape
    cblk = 128 if c % 128 == 0 else c
    n_cblk = c // cblk
    need = 2 * (nrb * ncb * nk + h * w) * cblk * dk_halo.dtype.itemsize
    if need > 96 * 2**20:
        return (_scatter_halos_cg(dk_halo, h, w, kk, tq, gq, gc),
                _scatter_halos_cg(dv_halo, h, w, kk, tq, gq, gc))
    halo_spec = pl.BlockSpec((1, nrb, ncb, nk, cblk),
                             lambda i, cb: (i, 0, 0, 0, cb))
    map_spec = pl.BlockSpec((1, h, w, cblk), lambda i, cb: (i, 0, 0, cb))
    return pl.pallas_call(
        functools.partial(_overlap_add_kernel, h=h, w=w, kk=kk, tq=tq,
                          gq=gq, gc=gc),
        grid=(b, n_cblk),
        in_specs=[halo_spec, halo_spec],
        out_specs=[map_spec, map_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, c), dk_halo.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(32 * 2**20, 2 * need)),
    )(dk_halo, dv_halo)


def _na_packed_bwd(kernel_size, scale, tile, n_heads, res, dout):
    q, k_halo, v_halo, out, lse = res
    b, h, w, c = q.shape
    e = c // n_heads
    tq = tile
    gq, gc = _group_sizes(tq, coarse=True)
    nrb, ncb = h // tq, w // tq
    n_cblk, cblk, hb = _packed_geometry(c, e)
    fwd_masks = _mask_table(h, w, kernel_size, tq, gq, gc)
    ng_t, gnq, gnk = (fwd_masks.shape[2], fwd_masks.shape[3],
                      fwd_masks.shape[4])
    nk = k_halo.shape[3]
    # The saved halo slabs come from _na_packed_fwd(save_lse=True), which
    # shares this backward's coarse (tq, gq, gc) group geometry. If either
    # side's group choice drifts, the slab geometry silently mismatches the
    # mask table and produces wrong gradients — fail loudly instead.
    _, kr, krw, _, _, ngc = _halo_geometry_cg(h, w, kernel_size, tq, gq, gc)
    expect_nk = ngc * kr * krw
    assert (nk == expect_nk
            and k_halo.shape == (nrb, ncb, b, expect_nk, c)
            and v_halo.shape == k_halo.shape), (
        f"saved NA halo slab geometry {k_halo.shape} does not match the "
        f"backward's coarse groups (expected (nrb={nrb}, ncb={ncb}, b={b}, "
        f"nk={expect_nk}, c={c})): forward/backward _group_sizes choices "
        f"have diverged")
    # halos are tile-major (nrb, ncb, n, nk, c) — see _extract_halos_cg
    halo_spec = pl.BlockSpec((1, 1, 1, nk, cblk),
                             lambda j, l, cb, i: (j, l, i, 0, cb))
    tile_c = pl.BlockSpec((1, tq, tq, cblk),
                          lambda j, l, cb, i: (i, j, l, cb))
    tile_h = pl.BlockSpec((1, 1, tq, tq, hb),
                          lambda j, l, cb, i: (i, cb, j, l, 0))
    halo_out = pl.BlockSpec((1, 1, 1, nk, cblk),
                            lambda j, l, cb, i: (i, j, l, 0, cb))
    dq, dk_halo, dv_halo = pl.pallas_call(
        functools.partial(_na_packed_dqkv_kernel, kernel_size=kernel_size,
                          tq=tq, gq=gq, gc=gc, scale=scale, h=h, w=w, e=e),
        grid=(nrb, ncb, n_cblk, b),
        in_specs=[tile_c, halo_spec, halo_spec, tile_c, tile_c, tile_h,
                  pl.BlockSpec((1, 1, ng_t, gnq, gnk),
                               _mask_index_map(nrb, ncb))],
        out_specs=[tile_c, halo_out, halo_out],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((b, nrb, ncb, nk, c), q.dtype),
                   jax.ShapeDtypeStruct((b, nrb, ncb, nk, c), q.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(q, k_halo, v_halo, dout, out, lse, fwd_masks)
    dk, dv = _overlap_add_cg(dk_halo, dv_halo, h, w, kernel_size, tq, gq, gc)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _na2d_packed_inner(q, k, v, kernel_size, scale, tile, n_heads):
    out, _ = _na_packed_fwd(q, k, v, kernel_size, scale, tile, n_heads)
    return out

def _na2d_packed_fwd_rule(q, k, v, kernel_size, scale, tile, n_heads):
    # under differentiation: also save the per-head logsumexp map AND the
    # forward's column-grouped k/v halo slabs (the backward shares the
    # forward's (tq, gq, gc) geometry, so saving them skips the pad/concat
    # re-extraction), so the backward runs the packed dq/dkv kernels
    # directly (no unpack transposes and no forward recompute)
    from .remat_names import name_tree, ATTN_OUT, ATTN_QKV
    out, lse, k_halo, v_halo = _na_packed_fwd(
        q, k, v, kernel_size, scale, tile, n_heads, save_lse=True)
    return out, (*name_tree((q, k_halo, v_halo), ATTN_QKV),
                 *name_tree((out, lse), ATTN_OUT))

def _na2d_packed_bwd_rule(kernel_size, scale, tile, n_heads, res, dout):
    return _na_packed_bwd(kernel_size, scale, tile, n_heads, res, dout)

_na2d_packed_inner.defvjp(_na2d_packed_fwd_rule, _na2d_packed_bwd_rule)


def preferred_tile(h, w, training, batch=None):
    """Measured tile choice (r3, v5e). Eval forward: 32x32 tiles win on
    64x64+ maps (1/4 the programs, halo duplication 2.06x -> 1.48x: 108 ->
    80 us at the flagship level-0 shape b=8); at low grid occupancy —
    128x128 maps, or small batches (the 512x512 bench's b=4: 111 -> 78 us
    at 64x64 c=256) — fixed per-program costs dominate and 64x64 tiles win
    another 12-30%. The backward's per-tile dk/dv halo partials grow with
    tile area and favor 16 (train fwd+bwd 3.38 -> 3.66 ms/call at 32)."""
    if h % 32 or w % 32 or min(h, w) < 32:
        return DEFAULT_TILE
    if training:
        # with the coarse (gq=8) training groups, 32x32 tiles beat 16
        # (l0 fwd+bwd 1.54 -> 1.28 ms, l1 0.92 -> 0.66 whole-map); the
        # earlier tile-32 rejection was measured at gq=4
        return 32
    if h % 64 == 0 and w % 64 == 0 and (min(h, w) >= 128
                                        or (batch is not None and batch <= 4)):
        return 64
    return 32


def na2d_packed(q, k, v, n_heads, kernel_size, scale=1.0, tile=DEFAULT_TILE):
    """Channel-packed 2-D neighborhood attention: q,k,v (b, h, w, heads*e),
    per-head attention without unpacking heads from the channel dim.
    Differentiable: the backward runs channel-packed dq/dkv kernels from the
    saved per-head logsumexp (no transposes, no forward recompute). Falls
    back to the per-head Pallas kernel when the channel dim is too wide for
    the masked-matmul formulation, and to masked SDPA off-TPU."""
    b, h, w, c = q.shape
    e = c // n_heads
    if not _use_pallas(h, w, kernel_size, tile):
        out = _xla_na(q.reshape(b, h, w, n_heads, e),
                      k.reshape(b, h, w, n_heads, e),
                      v.reshape(b, h, w, n_heads, e), kernel_size, scale=scale)
        return out.reshape(b, h, w, c)
    # channel-block geometry needs whole heads per 128-lane block (or
    # whole 128-lane blocks per head)
    blockable = (128 % e == 0) if e < 128 else (e % 128 == 0)
    if c > 512 or c % 128 != 0 or not blockable:
        out = na2d(q.reshape(b, h, w, n_heads, e),
                   k.reshape(b, h, w, n_heads, e),
                   v.reshape(b, h, w, n_heads, e), kernel_size, scale=scale,
                   tile=tile)
        return out.reshape(b, h, w, c)
    return _na2d_packed_inner(q, k, v, kernel_size, scale, tile, n_heads)


# Packed NA with a fused epilogue: attention -> out projection -> residual
# add in the same kernel (the out_proj weights are VMEM-resident at these
# widths, so the epilogue costs no extra HBM traffic and saves two op
# launches per attention block; see PERFORMANCE.md on per-op overhead).


def _na_packed_proj_kernel(q_ref, k_ref, v_ref, skip_ref, wout_ref, mask_ref,
                           o_ref, *, kernel_size, tq, h, w, scale, n_heads):
    c = q_ref.shape[-1]
    e = c // n_heads
    nq = tq * tq
    ks = k_ref[0, 0, 0]  # (nk, c)
    vs = v_ref[0, 0, 0]
    q = q_ref[0].reshape(nq, c)
    mask = mask_ref[0, 0]
    nk = ks.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (nq, c), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (nk, c), 1)
    out = jnp.zeros((nq, c), jnp.float32)
    for head in range(n_heads):
        q_h = jnp.where((lane // e) == head, q, 0).astype(q.dtype)
        s = jax.lax.dot_general(
            q_h, ks, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s) * mask
        l = jnp.sum(p, axis=1, keepdims=True)
        v_h = jnp.where((lane_k // e) == head, vs, 0).astype(vs.dtype)
        out = out + jax.lax.dot_general(
            (p / l).astype(q.dtype), v_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    proj = jax.lax.dot_general(
        out.astype(q.dtype), wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    res = proj + skip_ref[0].reshape(nq, c).astype(jnp.float32)
    o_ref[0] = res.reshape(tq, tq, c).astype(o_ref.dtype)


def _na_packed_proj_fwd(q, k, v, skip, w_out, kernel_size, scale, tile,
                        n_heads):
    b, h, w, c = q.shape
    tq = tile
    grid = (h // tq, w // tq, b)
    masks = jnp.asarray(_fwd_masks(h, w, kernel_size, tq))
    nq, nk = masks.shape[2], masks.shape[3]
    k_halo = _extract_halos(k, kernel_size, tq)
    v_halo = _extract_halos(v, kernel_size, tq)
    halo_spec = pl.BlockSpec((1, 1, 1, nk, c), lambda j, l, i: (i, j, l, 0, 0))
    tile_spec = pl.BlockSpec((1, tq, tq, c), lambda j, l, i: (i, j, l, 0))
    return pl.pallas_call(
        functools.partial(_na_packed_proj_kernel, kernel_size=kernel_size,
                          tq=tq, h=h, w=w, scale=scale, n_heads=n_heads),
        grid=grid,
        in_specs=[
            tile_spec,
            halo_spec,
            halo_spec,
            tile_spec,
            pl.BlockSpec((c, c), lambda j, l, i: (0, 0)),
            pl.BlockSpec((1, 1, nq, nk), lambda j, l, i: (j, l, 0, 0)),
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k_halo, v_halo, skip, w_out.astype(q.dtype), masks)


def _packed_proj_reference(q, k, v, skip, w_out, kernel_size, scale, n_heads):
    b, h, w, c = q.shape
    e = c // n_heads
    out = _xla_na(q.reshape(b, h, w, n_heads, e),
                  k.reshape(b, h, w, n_heads, e),
                  v.reshape(b, h, w, n_heads, e), kernel_size, scale=scale)
    out = out.reshape(b, h, w, c)
    return out @ w_out.astype(out.dtype) + skip


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _na2d_packed_proj_inner(q, k, v, skip, w_out, kernel_size, scale, tile,
                            n_heads):
    return _na_packed_proj_fwd(q, k, v, skip, w_out, kernel_size, scale,
                               tile, n_heads)


def _na2d_packed_proj_fwd_rule(q, k, v, skip, w_out, kernel_size, scale,
                               tile, n_heads):
    out = _na_packed_proj_fwd(q, k, v, skip, w_out, kernel_size, scale, tile,
                              n_heads)
    return out, (q, k, v, skip, w_out)


def _na2d_packed_proj_bwd_rule(kernel_size, scale, tile, n_heads, res, dout):
    q, k, v, skip, w_out = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_, w_: _packed_proj_reference(
            q_, k_, v_, s_, w_, kernel_size, scale, n_heads),
        q, k, v, skip, w_out)
    return vjp(dout)


_na2d_packed_proj_inner.defvjp(_na2d_packed_proj_fwd_rule,
                               _na2d_packed_proj_bwd_rule)


def na2d_packed_proj(q, k, v, skip, w_out, n_heads, kernel_size, scale=1.0,
                     tile=DEFAULT_TILE):
    """na2d_packed + fused epilogue: returns attention(q,k,v) @ w_out + skip.
    q,k,v,skip (b, h, w, heads*e); w_out (heads*e, heads*e)."""
    b, h, w, c = q.shape
    from . import xla_forced
    if (not _use_pallas(h, w, kernel_size, tile) or c > 512 or c % 128 != 0
            or xla_forced()):
        return _packed_proj_reference(q, k, v, skip, w_out, kernel_size,
                                      scale, n_heads)
    return _na2d_packed_proj_inner(q, k, v, skip, w_out, kernel_size, scale,
                                   tile, n_heads)

"""Fused attention prologue: AdaRMSNorm -> qkv projection -> cosine-sim QK
normalization -> axial RoPE, as ONE Pallas kernel returning packed
(b, h, w, d) q, k, v maps.

On this runtime each fused XLA op costs ~60 us to launch regardless of size
(see PERFORMANCE.md), so collapsing the 4-5 ops of the attention prologue
(the reference runs the same chain through torch.compile-fused pointwise
kernels around the qkv matmul; image_transformer_v2.py:98-121, 171-248,
370-395) into one kernel is a direct step-time win on the eval path.

Design notes (all Mosaic-constraint driven):
- Per-head sum-of-squares for cosine-sim without lane->sublane reshapes:
  ``ssq = (q*q) @ M`` where M is the (d, d) block-diagonal ones matrix —
  one MXU op that leaves every lane holding its own head's sum.
- RoPE without gathers: the half-split rotation (y1 = x1 c - x2 s,
  y2 = x2 c + x1 s, pair distance e/4 = 16 lanes) is
  ``x * cosT + laneswap(x) * sinT`` where laneswap exchanges adjacent
  16-lane blocks (two cyclic lane rolls + a lane-parity select). The host-
  precomputed cos/sin tables carry the sin sign and 1/0 for unrotated lanes.
- The tables are built from make_axial_pos(h, w), which equals the model's
  per-level downscale_pos chain exactly in real arithmetic (mean of interval
  midpoints == midpoint of the merged interval) and to ~1e-7 in f32 — far
  below bf16 resolution. The XLA fallback uses the passed-in ``pos`` and is
  bit-identical to the unfused model path.

Train-eligible: the custom_vjp backward is one Pallas kernel that
RECOMPUTES the norm + raw qkv projection from x (one extra MXU matmul —
cheaper than round-tripping the (b, t, 3d) raw-projection residual through
HBM, and the recomputed f32 values match the forward kernel exactly where
the saved residual was rounded to bf16), then runs the RoPE/cosine-sim vjp
and the three VJP matmuls with the f32 chains kept in VMEM. Forward-mode
(log_likelihood) uses the force_xla() escape hatch like the other kernels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import norms
from .. import rope as rope_mod

TOKEN_TILE = 16  # spatial tile edge


@functools.lru_cache
def _rope_tables(h, w, n_heads, d_head):
    """cos/sin tables (h, w, d) for one of the q/k sections. Within each
    head: lanes [0, e/2) rotated in pairs (c, c + e/4); lanes [e/2, e)
    pass through (cos=1, sin=0)."""
    import math
    d = n_heads * d_head
    e = d_head
    # pure-numpy replicas of ops.rope.axial_rope_freqs / make_axial_pos
    # (this runs at trace time, so the jnp versions would return tracers)
    dim = e // 2
    log_min, log_max = math.log(math.pi), math.log(10.0 * math.pi)
    freqs = np.exp(np.linspace(log_min, log_max, n_heads * (dim // 4) + 1,
                               dtype=np.float32)[:-1]).reshape(dim // 4, n_heads).T
    y_min, y_max, x_min, x_max = rope_mod.bounding_box(h, w)
    h_edges = np.linspace(y_min, y_max, h + 1, dtype=np.float32)
    w_edges = np.linspace(x_min, x_max, w + 1, dtype=np.float32)
    h_pos = (h_edges[:-1] + h_edges[1:]) / 2
    w_pos = (w_edges[:-1] + w_edges[1:]) / 2
    pos = np.stack(np.meshgrid(h_pos, w_pos, indexing="ij"), axis=-1)  # (h,w,2)
    th = pos[..., None, 0:1] * freqs[None, None]
    tw = pos[..., None, 1:2] * freqs[None, None]
    theta = np.concatenate([th, tw], axis=-1)                       # (h,w,heads,e//4)
    cos1 = np.cos(theta)
    sin1 = np.sin(theta)
    one = np.ones_like(cos1)
    zero = np.zeros_like(sin1)
    cos_t = np.concatenate([cos1, cos1, one, one], axis=-1).reshape(h, w, d)
    # y1 lanes get -sin, y2 lanes +sin, pass-through lanes 0
    sin_t = np.concatenate([-sin1, sin1, zero, zero], axis=-1).reshape(h, w, d)
    return cos_t.astype(np.float32), sin_t.astype(np.float32)


def _fused_qkv_kernel(x_ref, nscale_ref, wqkv_ref, rootsc_ref, cos_ref,
                      sin_ref, oq_ref, ok_ref, ov_ref, *, d, n_heads,
                      eps, cos_eps):
    tqh, tqw = x_ref.shape[1], x_ref.shape[2]
    nq = tqh * tqw
    e = d // n_heads
    x = x_ref[0].reshape(nq, d)
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    # match ops.norms.rms_norm rounding: combined factor cast to x.dtype
    factor = (nscale_ref[0].astype(jnp.float32)
              * jax.lax.rsqrt(mean_sq + eps)).astype(x.dtype)
    xn = x * factor
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nq, 3d) f32
    q = qkv[:, :d]
    k = qkv[:, d:2 * d]
    v = qkv[:, 2 * d:]

    # cosine-sim: per-head sum of squares via block-diagonal-ones matmul
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // e
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // e
    blockdiag = (row == col).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    ssq_q = jax.lax.dot_general(q * q, blockdiag, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
    ssq_k = jax.lax.dot_general(k * k, blockdiag, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
    root = rootsc_ref[0]  # (1, d): sqrt(attn_scale) repeated per head
    q = q * (root * jax.lax.rsqrt(ssq_q + cos_eps))
    k = k * (root * jax.lax.rsqrt(ssq_k + cos_eps))

    # RoPE: x * cosT + laneswap(x) * sinT; laneswap swaps adjacent 16-lane
    # blocks (pair distance e/4 = 16 within the rotated half of each head)
    qk = jnp.concatenate([q, k], axis=1)  # (nq, 2d)
    left = pltpu.roll(qk, qk.shape[1] - 16, 1)  # y[i] = x[i+16]
    right = pltpu.roll(qk, 16, 1)               # y[i] = x[i-16]
    blk = (jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1) // 16) % 2
    swapped = jnp.where(blk == 0, left, right)
    cos_t = cos_ref[...].reshape(nq, d)
    sin_t = sin_ref[...].reshape(nq, d)
    cos2 = jnp.concatenate([cos_t, cos_t], axis=1)
    sin2 = jnp.concatenate([sin_t, sin_t], axis=1)
    qk = qk * cos2 + swapped * sin2

    oq_ref[0] = qk[:, :d].astype(oq_ref.dtype).reshape(tqh, tqw, d)
    ok_ref[0] = qk[:, d:].astype(ok_ref.dtype).reshape(tqh, tqw, d)
    ov_ref[0] = v.astype(ov_ref.dtype).reshape(tqh, tqw, d)


def _reference(x, pos, norm_scale, w_qkv, attn_scale, n_heads, eps, cos_eps):
    """Unfused spec (XLA fallback and custom_vjp backward): bit-identical to
    the unfused model chain (SelfAttentionBlock)."""
    b, h, w, d = x.shape
    e = d // n_heads
    xn = norms.rms_norm(x, norm_scale[:, None, None, :], eps)
    qkv = xn @ w_qkv.astype(xn.dtype)
    qkv = qkv.reshape(b, h, w, 3, n_heads, e)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    q, k = norms.scale_for_cosine_sim(q, k, attn_scale[:, None], cos_eps)
    freqs = rope_mod.axial_rope_freqs(e // 2, n_heads)
    theta = rope_mod.axial_rope_theta(pos, freqs)
    q = rope_mod.apply_rotary_emb(q, theta)
    k = rope_mod.apply_rotary_emb(k, theta)
    return (q.reshape(b, h, w, d), k.reshape(b, h, w, d),
            v.reshape(b, h, w, d))


def _fused_fwd(x, norm_scale, w_qkv, attn_scale, n_heads, eps, cos_eps, tile,
               scale_block=0):
    # norm_scale may be WIDER than d (a step's full precomputed cond-scales
    # table, condcache.py); the kernel reads its (1, 1, d) block at lane
    # offset scale_block*d straight out of it — no per-layer slice copies.
    b, h, w, d = x.shape
    cos_t, sin_t = _rope_tables(h, w, n_heads, d // n_heads)
    grid = (b, h // tile, w // tile)
    kernel = functools.partial(_fused_qkv_kernel, d=d, n_heads=n_heads,
                               eps=eps, cos_eps=cos_eps)
    out_sds = jax.ShapeDtypeStruct((b, h, w, d), x.dtype)
    out_spec = pl.BlockSpec((1, tile, tile, d), lambda i, j, l: (i, j, l, 0))
    out_specs = [out_spec, out_spec, out_spec]
    out_shape = [out_sds, out_sds, out_sds]
    root = jnp.repeat(jnp.sqrt(attn_scale.astype(jnp.float32)), d // n_heads)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, tile, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, l: (i, 0, scale_block)),
            pl.BlockSpec((d, 3 * d), lambda i, j, l: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j, l: (0, 0)),
            pl.BlockSpec((tile, tile, d), lambda i, j, l: (j, l, 0)),
            pl.BlockSpec((tile, tile, d), lambda i, j, l: (j, l, 0)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
    )(x, norm_scale[:, None, :] + 0.0, w_qkv.astype(x.dtype), root[None],
      jnp.asarray(cos_t), jnp.asarray(sin_t))
    return res


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_qkv_inner(x, pos, norm_scale, w_qkv, attn_scale, n_heads, eps,
                     cos_eps, tile):
    return _fused_fwd(x, norm_scale, w_qkv, attn_scale, n_heads, eps,
                      cos_eps, tile)


def _head_chain(x, norm_scale, w_qkv, eps):
    """x -> raw qkv projection (the reference's pre-attention matmul)."""
    xn = norms.rms_norm(x, norm_scale[:, None, None, :], eps)
    return xn @ w_qkv.astype(xn.dtype)


def _mid_chain_packed(qkv_raw, attn_scale, n_heads, cos_eps):
    """raw qkv -> (q, k, v): cosine-sim scaling + RoPE, computed entirely in
    the packed (b, h, w, c) layout — per-head sums of squares via the
    block-diagonal-ones matmul and RoPE as x*cosT + laneswap(x)*sinT (the
    same formulation as the kernel), so neither this chain nor its VJP
    materializes the (3, heads, e) split that forces XLA relayout copies."""
    b, h, w, d3 = qkv_raw.shape
    d = d3 // 3
    e = d // n_heads
    cos_t, sin_t = _rope_tables(h, w, n_heads, e)  # (h, w, d) host tables
    q = qkv_raw[..., :d]
    k = qkv_raw[..., d:2 * d]
    v = qkv_raw[..., 2 * d:]

    row, col = np.indices((d, d))
    blockdiag = jnp.asarray((row // e == col // e).astype(np.float32))
    root = jnp.repeat(jnp.sqrt(attn_scale.astype(jnp.float32)), e)

    def cossim(t):
        tf = t.astype(jnp.float32)
        ssq = jax.lax.dot_general(
            tf * tf, blockdiag, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return tf * (root * jax.lax.rsqrt(ssq + cos_eps))

    shift = e // 4  # rotation pair distance in lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (d,), 0)
    swap_sel = (lane // shift) % 2 == 0

    def rope(t):
        left = jnp.roll(t, -shift, axis=-1)
        right = jnp.roll(t, shift, axis=-1)
        swapped = jnp.where(swap_sel, left, right)
        return t * jnp.asarray(cos_t) + swapped * jnp.asarray(sin_t)

    out_dtype = qkv_raw.dtype
    return (rope(cossim(q)).astype(out_dtype),
            rope(cossim(k)).astype(out_dtype), v)


def _fused_qkv_fwd_rule(x, pos, norm_scale, w_qkv, attn_scale, n_heads, eps,
                        cos_eps, tile):
    # the backward recomputes the raw qkv projection in-kernel (see module
    # docstring), so only the primal inputs are saved
    q, k, v = _fused_fwd(x, norm_scale, w_qkv, attn_scale, n_heads,
                         eps, cos_eps, tile)
    return (q, k, v), (x, pos, norm_scale, w_qkv, attn_scale)


def _prologue_bwd_kernel(x_ref, ns_ref, wq_ref, rootsc_ref, cos_ref,
                         sin_ref, gq_ref, gk_ref, gv_ref,
                         dx_ref, dns_ref, dwq_ref, das_ref, *, d, n_heads,
                         eps, cos_eps):
    """The whole prologue backward in one kernel: recompute norm + raw qkv
    (one MXU matmul — cheaper than reading a saved (T, 3d) residual from
    HBM), RoPE vjp (same laneswap structure as the forward, order flipped:
    dx = cos*g + swap(sin*g)), cosine-sim vjp (per-head sums via the
    block-diagonal-ones matmul), dwq/dxn matmuls, and the f32 RMS-norm
    backward — with every intermediate (incl. dqkv_raw, which the XLA chain
    materializes at (b, t, 3d)) staying in VMEM. dwq/dns/das accumulate via
    output-block revisiting; das is emitted as per-lane sums of g*qn (the
    tiny (heads,)-reduction and /2*attn_scale finish in XLA)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    e = d // n_heads
    x = x_ref[0]                       # (T, d)
    s = ns_ref[0]                      # (1, d)
    root = rootsc_ref[0]               # (1, d)
    cos_t = cos_ref[0].astype(jnp.float32)   # (T, d)
    sin_t = sin_ref[0].astype(jnp.float32)

    # --- recompute the head chain: norm + raw qkv projection ---
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    sf = s.astype(jnp.float32)
    xn = (xf * (sf * r)).astype(x.dtype)
    raw = jax.lax.dot_general(
        xn, wq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, 3d) — matches the fwd

    # --- mid-chain vjp: (gq, gk) -> d(raw q), d(raw k) ---
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // e
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // e
    blockdiag = (row == col).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))

    def rope_vjp(g):
        sg = sin_t * g
        left = pltpu.roll(sg, sg.shape[1] - 16, 1)
        right = pltpu.roll(sg, 16, 1)
        blk = (jax.lax.broadcasted_iota(jnp.int32, sg.shape, 1) // 16) % 2
        return cos_t * g + jnp.where(blk == 0, left, right)

    def cossim_vjp(q_raw, g):
        """q_raw: raw section (T, d) f32; g: cotangent of the normalized
        section. Returns (dq_raw, per-lane g*qn sums for das)."""
        ssq = jax.lax.dot_general(q_raw * q_raw, blockdiag,
                                  dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        r = jax.lax.rsqrt(ssq + cos_eps)
        rho = root * r
        qn = q_raw * rho
        gq_sum = jax.lax.dot_general(g * q_raw, blockdiag,
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        dq = rho * g - q_raw * (root * r * r * r) * gq_sum
        lane_das = jnp.sum(g * qn, axis=0, keepdims=True)  # (1, d)
        return dq, lane_das

    gq = rope_vjp(gq_ref[0].astype(jnp.float32))
    gk = rope_vjp(gk_ref[0].astype(jnp.float32))
    q_raw = raw[:, :d]
    k_raw = raw[:, d:2 * d]
    dq_raw, das_q = cossim_vjp(q_raw, gq)
    dk_raw, das_k = cossim_vjp(k_raw, gk)
    dr = jnp.concatenate(
        [dq_raw, dk_raw, gv_ref[0].astype(jnp.float32)],
        axis=1).astype(x.dtype)        # (T, 3d)

    @pl.when((i == 0) & (j == 0))
    def _():
        das_ref[...] = jnp.zeros_like(das_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)

    das_ref[0] += das_q + das_k

    # --- head-chain vjp: dr -> dx, dns, dwq (xf/r/sf/xn from the
    # recompute at the top) ---
    dwq_ref[...] += jax.lax.dot_general(
        xn, dr, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (d, 3d)

    dxn = jax.lax.dot_general(
        dr, wq_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (T, d)
    g1 = dxn * sf
    dot = jnp.sum(g1 * xf, axis=-1, keepdims=True)
    dx = r * g1 - xf * (r * r * r / d) * dot
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(j == 0)
    def _():
        dns_ref[...] = jnp.zeros_like(dns_ref)

    dns_ref[0] += jnp.sum(dxn * xf * r, axis=0, keepdims=True)  # (1, d)


def _prologue_bwd_pallas(x, norm_scale, w_qkv, attn_scale,
                         gq, gk, gv, n_heads, eps, cos_eps):
    b, h, w, d = x.shape
    t = h * w
    block = (1024 if t % 1024 == 0 else
             512 if t % 512 == 0 else (256 if t % 256 == 0 else t))
    cos_t, sin_t = _rope_tables(h, w, n_heads, d // n_heads)
    root = jnp.repeat(jnp.sqrt(attn_scale.astype(jnp.float32)), d // n_heads)
    grid = (b, t // block)
    tok_d = pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0))
    tab_d = pl.BlockSpec((1, block, d), lambda i, j: (0, j, 0))
    dx, dns, dwq, das_lanes = pl.pallas_call(
        functools.partial(_prologue_bwd_kernel, d=d, n_heads=n_heads,
                          eps=eps, cos_eps=cos_eps),
        grid=grid,
        in_specs=[
            tok_d,
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            tab_d,
            tab_d,
            tok_d,
            tok_d,
            tok_d,
        ],
        out_specs=[
            tok_d,
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x.reshape(b, t, d), norm_scale[:, None, :], w_qkv.astype(x.dtype),
      root[None],
      jnp.asarray(cos_t).reshape(1, t, d), jnp.asarray(sin_t).reshape(1, t, d),
      gq.reshape(b, t, d), gk.reshape(b, t, d), gv.reshape(b, t, d))
    das = (das_lanes.reshape(n_heads, d // n_heads).sum(axis=1)
           / (2.0 * attn_scale.astype(jnp.float32))).astype(attn_scale.dtype)
    return (dx.reshape(b, h, w, d),
            dns.reshape(b, d).astype(norm_scale.dtype),
            dwq.astype(w_qkv.dtype), das)


def _fused_qkv_bwd_rule(n_heads, eps, cos_eps, tile, res, g):
    x, pos, norm_scale, w_qkv, attn_scale = res
    from . import xla_forced
    if jax.default_backend() == "tpu" and not xla_forced():
        gq, gk, gv = g
        dx, dns, dwq, das = _prologue_bwd_pallas(
            x, norm_scale, w_qkv, attn_scale, gq, gk, gv,
            n_heads, eps, cos_eps)
        return dx, jnp.zeros_like(pos), dns, dwq, das
    qkv_raw = _head_chain(x, norm_scale, w_qkv, eps)
    _, mid_vjp = jax.vjp(
        lambda qr_, as_: _mid_chain_packed(qr_, as_, n_heads, cos_eps),
        qkv_raw, attn_scale)
    dqkv_raw, das = mid_vjp(g)
    _, head_vjp = jax.vjp(
        lambda x_, ns_, wq_: _head_chain(x_, ns_, wq_, eps),
        x, norm_scale, w_qkv)
    dx, dns, dwq = head_vjp(dqkv_raw)
    return dx, jnp.zeros_like(pos), dns, dwq, das


_fused_qkv_inner.defvjp(_fused_qkv_fwd_rule, _fused_qkv_bwd_rule)


def preferred_qkv_tile(h, w):
    """Spatial tile for the fused prologue. Tile 32 quarters the program
    count and measured 110.8 -> 81.8 us at the flagship level-0 eval shape
    (64x64, d=128) and 57.7 -> 27.1 us at level 1 (32x32, d=256)
    (scripts/bench_prologue_ffn.py). The training fwd+bwd (custom_vjp
    backward's slab shapes follow the tile) also wins at both: batch-32
    slope-timed 2208 -> 2158 us (l0) and 838 -> 582 us (l1)
    (scripts/bench_prologue_grad.py)."""
    if h % 32 == 0 and w % 32 == 0:
        return 32
    return TOKEN_TILE


def fused_qkv_prologue(x, pos, norm_scale, w_qkv, attn_scale, n_heads,
                       eps=1e-6, cos_eps=1e-6, tile=TOKEN_TILE,
                       scale_block=0):
    """x (b,h,w,d); pos (h,w,2) axial positions (used by the XLA fallback;
    the kernel rebuilds the identical grid host-side); norm_scale (b,d) =
    AdaRMSNorm proj(cond) + 1; w_qkv (d, 3d); attn_scale (heads,) learned
    cosine-sim scale. Returns (q, k, v), each (b, h, w, d) head-major
    packed, with cosine-sim scaling and RoPE already applied to q and k.

    Precomputed-cond (eval-only) path: norm_scale may be (b, T) with T > d —
    a step's full cond-scales table (condcache.py) — with ``scale_block``
    selecting this layer's d-lane block (lane offset scale_block*d). The
    kernel reads the block directly via its BlockSpec; the fallback slices.
    This path is forward-only (it bypasses the custom_vjp)."""
    b, h, w, d = x.shape
    e = d // n_heads
    wide = norm_scale.shape[-1] != d
    from . import xla_forced
    ok = (jax.default_backend() == "tpu" and h % tile == 0 and w % tile == 0
          and d % 128 == 0 and e == 64)
    if not ok or xla_forced():
        if wide:
            norm_scale = jax.lax.slice_in_dim(
                norm_scale, scale_block * d, scale_block * d + d, axis=-1)
        return _reference(x, pos, norm_scale, w_qkv, attn_scale, n_heads,
                          eps, cos_eps)
    if wide:
        return _fused_fwd(x, norm_scale, w_qkv, attn_scale, n_heads,
                          eps, cos_eps, tile, scale_block)
    return _fused_qkv_inner(x, pos, norm_scale, w_qkv, attn_scale, n_heads,
                            eps, cos_eps, tile)

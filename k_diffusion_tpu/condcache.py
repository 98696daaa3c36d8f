"""Precomputed conditioning for fixed-sigma-schedule sampling (HDiT).

Everything the hourglass DiT derives from its conditioning inputs — the
mapping network cond = mapping(time_emb + aug_emb + class_emb) and every
layer's AdaRMSNorm scale projection ``proj(cond) + 1`` — is step-invariant
once the sampler's sigma schedule is fixed. Left in place, that work runs
inside the 50-step sampling scan as ~25 tiny XLA fusions per step whose
cost is per-op launch/latency, not FLOPs (measured +1.4% flagship sampling
throughput when hoisted — the ops are tiny and partially hidden under
kernel dispatch; see the corrected r5 trace table in PERFORMANCE.md).

This module hoists all of it out of the scan:

1. ``precompute_cond_scales`` runs the mapping network once per schedule
   sigma (``cond_only=True`` forward) and packs every layer's scale
   projection into one ``(steps, batch, total)`` table, laid out by
   ``image_transformer_v2.cond_scale_layout``. Each projection is computed
   with the same matmul shape and dtype chain as the in-layer site, so the
   table is BIT-IDENTICAL to what the layers would compute per step
   (asserted by tests/test_condcache.py).
2. ``scheduled_inner_fn`` wraps ``model.apply``: per step it looks up the
   row whose sigma matches (exact log-space nearest neighbor — a schedule
   sigma matches itself exactly) and passes it as ``cond_scales``; the
   fused Pallas kernels then read their (b, d) scale block straight out of
   the row via a static BlockSpec lane offset (ops/pallas/fused_qkv.py,
   fused_ffn.py) — zero per-step cond ops beyond one dynamic row slice.

Applies to samplers that evaluate the model only at schedule sigmas
(dpmpp_2m / 2m_sde / 3m_sde, lms, euler, euler_ancestral at eta=0 ... —
the bench/demo/CLI samplers). Samplers that probe BETWEEN schedule points
(sample_dpm_2's geometric-mean midpoints, the adaptive solvers) must pass
every sigma they will evaluate in ``sigmas``, or not use this path: a
non-schedule sigma would silently snap to the nearest table row.

Reference analog: none — the reference recomputes cond every step
(image_transformer_v2.py:734-760); hoisting it is a TPU-scan-specific
optimization. Eval-only: the precomputed path is forward-only by design
(training sigmas are random, not scheduled).
"""

import jax
import jax.numpy as jnp

from .models import image_transformer_v2 as itv2


def precompute_cond_scales(model, variables, sigmas, batch, aug_cond=None,
                           class_cond=None, mapping_cond=None):
    """Build the per-step AdaRMSNorm scale table for a sigma schedule.

    model: ImageTransformerDenoiserModelV2; variables: {'params': ...};
    sigmas: (steps,) the sigmas the sampler will evaluate the model at
    (for the fixed-step samplers: ``schedule[:-1]``, i.e. without the
    terminal 0); batch: the sampling batch size (class_cond, if given, is
    (batch,) and baked into the table).

    Returns ``(sigma_table (steps,), scales_table (steps, batch, total))``.
    """
    sigma_table = jnp.asarray(sigmas, jnp.float32)

    def cond_fn(s):
        return model.apply(variables, None, jnp.full((batch,), s, jnp.float32),
                           aug_cond=aug_cond, class_cond=class_cond,
                           mapping_cond=mapping_cond, cond_only=True)

    layout, _total = itv2.cond_scale_layout(model.levels)
    params = variables["params"]

    def scales_fn(s):
        # per-site matmuls with the exact in-layer shapes/dtypes (NOT one
        # concatenated kernel): bit-identity with the in-scan computation
        # must hold on every backend, and accumulation order can differ
        # across matmul shapes
        cond = cond_fn(s)
        pieces, pos = [], 0

        def emit(piece, off):
            nonlocal pos
            if off > pos:  # layout alignment padding — never read
                pieces.append(jnp.ones((cond.shape[0], off - pos),
                                       piece.dtype))
            pieces.append(piece)
            pos = off + piece.shape[-1]

        for name, (attn_off, ff_off) in layout.items():
            if attn_off is not None:
                k = params[name]["self_attn"]["norm"]["mapping_linear"]["kernel"]
                # SelfAttentionBlock site: cond.astype(dt) @ k.astype(dt) + 1
                emit(cond.astype(model.dtype) @ k.astype(model.dtype) + 1,
                     attn_off)
            k = params[name]["ff"]["norm"]["mapping_linear"]["kernel"]
            # FeedForwardBlock site: cond @ k.astype(cond.dtype) + 1
            emit(cond @ k.astype(cond.dtype) + 1, ff_off)
        if _total > pos:
            pieces.append(jnp.ones((cond.shape[0], _total - pos),
                                   pieces[-1].dtype))
        return jnp.concatenate(pieces, axis=-1)

    # lax.map (not vmap): keeps each site matmul at the exact in-layer
    # shape; 50 steps of (b, mapping_width) work is negligible one-time cost
    scales_table = jax.lax.map(scales_fn, sigma_table)
    return sigma_table, scales_table


def scheduled_inner_fn(model, variables, sigmas, batch, image_layout="nhwc",
                       aug_cond=None, class_cond=None, mapping_cond=None):
    """Inner model fn (for Denoiser) with all cond work precomputed.

    Returns ``inner(x, sigma, **kw)`` that matches
    ``model.apply(variables, x, sigma, ...)`` bit-for-bit whenever sigma is
    one of ``sigmas`` (broadcast per batch, as the samplers pass it).
    Everything is traced inside the caller's jit; the table lives outside
    the sampler scan.
    """
    sigma_table, scales_table = precompute_cond_scales(
        model, variables, sigmas, batch, aug_cond=aug_cond,
        class_cond=class_cond, mapping_cond=mapping_cond)
    log_table = jnp.log(sigma_table)

    def inner(x, sigma, **kw):
        s0 = jnp.reshape(sigma, (-1,))[0]
        idx = jnp.argmin(jnp.abs(jnp.log(s0) - log_table))
        row = jax.lax.dynamic_index_in_dim(scales_table, idx, 0,
                                           keepdims=False)
        return model.apply(variables, x, sigma, image_layout=image_layout,
                           cond_scales=row, **kw)

    return inner

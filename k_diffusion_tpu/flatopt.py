"""Flat-vector AdamW: the reference's 4-group optimizer as whole-vector ops.

The reference builds {wd, no_wd} x {base lr, mapping lr} AdamW param groups
(/root/reference/k_diffusion/models/image_transformer_v2.py:708-719,
/root/reference/train.py:153-175) with global-norm clipping
(/root/reference/train.py:464). The straightforward optax encoding —
``clip_by_global_norm -> multi_transform over 4 adamw -> apply_updates`` —
compiles to several small fusions PER PARAMETER LEAF; at ~120 leaves the
train step pays ~4 ms of fixed per-op sequencing cost on TPU
(PERFORMANCE.md, "per-op launch overhead"), ~5x the HBM-traffic lower bound
of the update itself.

AdamW is elementwise and all four groups share (b1, b2, eps, schedule), so
the entire chain is expressible on ONE concatenated f32 vector: leaves are
bucketed by group label so each group is a contiguous segment, the moment /
direction math runs on the full vector, and the per-group learning-rate
scale and weight decay are applied segment-wise (4 slices). The only
per-leaf ops left are the final unravel slices, which XLA fuses with
``optax.apply_updates``'s adds.

Exact-equivalence contract (tested in tests/test_infra.py): updates match
``optax.chain(clip_by_global_norm, multi_transform({label: adamw(...)}))``
leaf-for-leaf up to f32 reduction order in the global norm.
"""

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class FlatAdamWState(NamedTuple):
    count: Any  # int32 step counter (optax convention: 0 before 1st update)
    mu: Any     # f32[N] first moment
    nu: Any     # f32[N] second moment


def _layout(params, param_labels, group_order):
    """Static flattening plan: leaf order bucketed by group label, so each
    group occupies one contiguous segment of the flat vector.

    Returns (perm, sizes, shapes, seg_bounds) where ``perm`` maps bucketed
    position -> original leaf index and ``seg_bounds[label] = (lo, hi)``.
    """
    leaves = jax.tree_util.tree_leaves(params)
    labels = jax.tree_util.tree_leaves(param_labels)
    if len(labels) != len(leaves):
        raise ValueError("param_labels structure does not match params")
    order_idx = {l: i for i, l in enumerate(group_order)}
    for l in labels:
        if l not in order_idx:
            raise ValueError(f"unknown param group label {l!r}")
    perm = sorted(range(len(leaves)), key=lambda i: (order_idx[labels[i]], i))
    sizes = [leaves[i].size for i in perm]
    shapes = [leaves[i].shape for i in perm]
    seg_bounds = {}
    off = 0
    for pos, i in enumerate(perm):
        lo, hi = seg_bounds.get(labels[i], (off, off))
        seg_bounds[labels[i]] = (lo, off + sizes[pos])
        off += sizes[pos]
    return perm, sizes, shapes, seg_bounds


def _ravel(tree, perm):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate(
        [leaves[i].reshape(-1).astype(jnp.float32) for i in perm])


def _unravel(flat, tree, perm, sizes, shapes):
    leaves = jax.tree_util.tree_leaves(tree)
    treedef = jax.tree_util.tree_structure(tree)
    out = [None] * len(leaves)
    off = 0
    for pos, i in enumerate(perm):
        out[i] = jax.lax.dynamic_slice_in_dim(flat, off, sizes[pos]) \
            .reshape(shapes[pos]).astype(leaves[i].dtype)
        off += sizes[pos]
    return jax.tree_util.tree_unflatten(treedef, out)


def flat_adamw(learning_rate, groups, param_labels, *, b1=0.9, b2=0.999,
               eps=1e-8, max_grad_norm=None):
    """4-group AdamW + global-norm clip as one flat-vector update.

    ``learning_rate``: base schedule (callable step -> lr) or float.
    ``groups``: dict label -> (lr_scale, weight_decay).
    ``param_labels``: pytree of labels matching the params pytree.
    """
    group_order = sorted(groups)
    sched = learning_rate if callable(learning_rate) \
        else (lambda _: learning_rate)

    def init(params):
        n = sum(l.size for l in jax.tree_util.tree_leaves(params))
        return FlatAdamWState(count=jnp.zeros([], jnp.int32),
                              mu=jnp.zeros([n], jnp.float32),
                              nu=jnp.zeros([n], jnp.float32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params")
        perm, sizes, shapes, seg = _layout(params, param_labels, group_order)
        g = _ravel(grads, perm)
        p = _ravel(params, perm)
        if max_grad_norm is not None:
            # optax.clip_by_global_norm: g * max_norm / max(gnorm, max_norm)
            gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
            g = g * (max_grad_norm / jnp.maximum(gnorm, max_grad_norm))
        count = state.count + 1
        mu = b1 * state.mu + (1 - b1) * g
        nu = b2 * state.nu + (1 - b2) * jnp.square(g)
        t = count.astype(jnp.float32)
        mhat = mu / (1 - jnp.power(b1, t))
        nhat = nu / (1 - jnp.power(b2, t))
        direction = mhat / (jnp.sqrt(nhat) + eps)
        # optax.scale_by_schedule evaluates at the pre-increment count
        lr = sched(state.count)
        pieces = []
        for label in group_order:
            if label not in seg:
                continue
            lo, hi = seg[label]
            lr_scale, wd = groups[label]
            d = jax.lax.dynamic_slice_in_dim(direction, lo, hi - lo)
            if wd:
                d = d + wd * jax.lax.dynamic_slice_in_dim(p, lo, hi - lo)
            pieces.append((-lr * lr_scale) * d)
        upd = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        return (_unravel(upd, grads, perm, sizes, shapes),
                FlatAdamWState(count=count, mu=mu, nu=nu))

    return optax.GradientTransformation(init, update)

"""Array helpers: dimension padding, DCT, frequency weights.

Behavior parity: reference utils.py:43-48 (append_dims), layers.py:16-39
(dct / freq weights). The DCT here is the orthonormal DCT-II from
``jax.scipy.fft`` instead of the dctorch CUDA path.
"""

import math
from functools import reduce

import jax
import jax.numpy as jnp


def append_dims(x, target_dims):
    """Appends singleton dims to the end of an array until it has ``target_dims`` dims."""
    dims_to_append = target_dims - x.ndim
    if dims_to_append < 0:
        raise ValueError(
            f"input has {x.ndim} dims but target_dims is {target_dims}, which is less"
        )
    return x[(...,) + (None,) * dims_to_append]


def n_params(params) -> int:
    """Number of scalar parameters in a pytree."""
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def dct(x, axes):
    """Orthonormal DCT-II over the given axes."""
    for axis in axes:
        x = jax.scipy.fft.dct(x, type=2, axis=axis, norm="ortho")
    return x


def idct(x, axes):
    """Orthonormal inverse DCT (DCT-III) over the given axes."""
    for axis in axes:
        x = jax.scipy.fft.idct(x, type=2, axis=axis, norm="ortho")
    return x


def freq_weight_1d(n, scales=0, dtype=jnp.float32):
    """Per-frequency loss weights for one axis (reference layers.py:26-32)."""
    ramp = jnp.linspace(0.5 / n, 0.5, n, dtype=dtype)
    weights = -jnp.log2(ramp)
    if scales >= 1:
        weights = jnp.minimum(weights, float(scales))
    return weights


def freq_weight_nd(shape, scales=0, dtype=jnp.float32):
    """N-dimensional frequency weights: elementwise min over per-axis 1-D weights
    broadcast along the other axes (reference layers.py:35-39)."""
    indexers = [
        tuple(slice(None) if i == j else None for j in range(len(shape)))
        for i in range(len(shape))
    ]
    weights = [freq_weight_1d(n, scales, dtype)[ix] for n, ix in zip(shape, indexers)]
    return reduce(jnp.minimum, weights)


def matmul_precision(precision="highest"):
    """Context manager pinning jax matmul precision — the TPU analog of the
    reference's tf32_mode (utils.py:428-443); used by the FID/KID metrics."""
    import jax
    return jax.default_matmul_precision(precision)


def transfer_params(new_params, old_params):
    """Copies shape-matching leaves from old_params into new_params by pytree
    path — the functional replacement for the reference's progressive-growing
    mutators (image_v1.py:159-176 set_skip_stages/set_patch_size): rebuild the
    model with new static fields, init fresh params, then transfer everything
    that survived (changed heads like proj_in/proj_out keep their fresh
    init). Returns (params, n_transferred, n_total)."""
    from flax import traverse_util

    new_flat = traverse_util.flatten_dict(new_params)
    old_flat = traverse_util.flatten_dict(old_params)
    n = 0
    for path, leaf in new_flat.items():
        if path in old_flat and old_flat[path].shape == leaf.shape:
            new_flat[path] = old_flat[path].astype(leaf.dtype)
            n += 1
    return traverse_util.unflatten_dict(new_flat), n, len(new_flat)

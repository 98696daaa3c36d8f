"""image_v1 and image_transformer_v1 family tests + progressive growing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import augmentation, config as config_mod, utils
from k_diffusion_tpu.models import image_v1 as iv1
from k_diffusion_tpu.models import image_transformer_v1 as itv1


def _v1_model(**kw):
    args = dict(c_in=3, feats_in=32, depths=(1, 1), channels=(16, 32),
                self_attn_depths=(False, True))
    args.update(kw)
    return iv1.ImageDenoiserModelV1(**args)


def test_image_v1_forward_and_zero_init():
    model = _v1_model()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 2.0])
    v = model.init(key, x, sigma)
    out = model.apply(v, x, sigma)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_image_v1_variance_head():
    model = _v1_model(has_variance=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.ones([2])
    v = model.init(key, x, sigma)
    out, logvar = model.apply(v, x, sigma, return_variance=True)
    assert out.shape == x.shape and logvar.shape == (2,)


def test_image_v1_cross_attention():
    model = _v1_model(cross_cond_dim=8, cross_attn_depths=(False, True))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.ones([2])
    cross = jax.random.normal(key, (2, 5, 8))
    pad = jnp.zeros([2, 5])
    v = model.init(key, x, sigma, cross_cond=cross, cross_cond_padding=pad)
    out = model.apply(v, x, sigma, cross_cond=cross, cross_cond_padding=pad)
    assert out.shape == x.shape
    # masking out all keys changes nothing at zero-init; perturb out_proj
    # and check padded keys are ignored
    from flax import traverse_util
    flat = traverse_util.flatten_dict(v["params"])
    for path in flat:
        if "cross_0" in path and path[-2] == "out_proj" and path[-1] == "kernel":
            flat[path] = jnp.ones_like(flat[path]) * 0.01
    v2 = {"params": traverse_util.unflatten_dict(flat)}
    cross_b = cross.at[:, -1].set(99.0)
    pad_mask = jnp.zeros([2, 5]).at[:, -1].set(1.0)
    o1 = model.apply(v2, x, sigma, cross_cond=cross, cross_cond_padding=pad_mask)
    o2 = model.apply(v2, x, sigma, cross_cond=cross_b, cross_cond_padding=pad_mask)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)


def test_image_v1_patch_size_and_unet_cond():
    model = _v1_model(patch_size=2, unet_cond_dim=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    uc = jax.random.normal(key, (2, 16, 16, 2))
    sigma = jnp.ones([2])
    v = model.init(key, x, sigma, unet_cond=uc)
    out = model.apply(v, x, sigma, unet_cond=uc)
    assert out.shape == x.shape


def test_image_v1_progressive_growing_transfer():
    """dataclasses.replace + transfer_params = the reference's
    set_skip_stages (image_v1.py:159-169)."""
    model = _v1_model(depths=(1, 1, 1), channels=(16, 32, 32),
                      self_attn_depths=(False, False, True))
    key = jax.random.PRNGKey(0)
    x32 = jax.random.normal(key, (1, 32, 32, 3))
    v = model.init(key, x32, jnp.ones([1]))

    grown = dataclasses.replace(model, skip_stages=1)
    x16 = jax.random.normal(key, (1, 16, 16, 3))
    v2 = grown.init(jax.random.fold_in(key, 1), x16, jnp.ones([1]))
    merged, n_moved, n_total = utils.transfer_params(v2["params"], v["params"])
    assert n_moved > n_total * 0.5  # deep stages carry over
    out = grown.apply({"params": merged}, x16, jnp.ones([1]))
    assert out.shape == x16.shape


def test_itv1_forward_grads():
    model = itv1.ImageTransformerDenoiserModelV1(
        n_layers=2, d_model=128, d_ff=256, in_features=3, out_features=3,
        patch_size=(4, 4), num_classes=5)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([0.5, 2.0])
    cls = jnp.asarray([1, 4])
    v = model.init(key, x, sigma, class_cond=cls)
    out = model.apply(v, x, sigma, class_cond=cls)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0)  # zero-init head

    # grads flow with randomized params
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    keys = jax.random.split(key, len(leaves))
    params = treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])
    g = jax.grad(lambda p: jnp.mean(
        model.apply({"params": p}, x, sigma, class_cond=cls) ** 2))(params)
    zero = [p for p, gg in
            jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.abs(gg).max()) == 0
            and p[-1].key != "basis"]  # FourierFeatures bases are frozen
    assert not zero, zero


def test_itv1_qk_norm_clamp():
    """QKNorm's log-scale is clamped at log(100) (reference itv1 :108-128)."""
    import math
    model = itv1.ImageTransformerDenoiserModelV1(
        n_layers=1, d_model=64, d_ff=128, in_features=1, out_features=1,
        patch_size=(2, 2))
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8, 8, 1))
    v = model.init(key, x, jnp.ones([1]))
    from flax import traverse_util
    flat = traverse_util.flatten_dict(v["params"])
    for path in list(flat):
        if path[-1] == "qk_scale":
            flat[path] = jnp.full_like(flat[path], 50.0)  # way over the clamp
    v2 = {"params": traverse_util.unflatten_dict(flat)}
    out = model.apply(v2, x, jnp.ones([1]))
    assert np.isfinite(np.asarray(out)).all()


def test_augment_wrapper_with_image_v1():
    model = _v1_model(mapping_cond_dim=9)  # augment_wrapper packs 9 aug dims
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.ones([2])
    v = model.init(key, x, sigma, mapping_cond=jnp.zeros([2, 9]))
    fn = augmentation.augment_wrapper_model_fn(
        lambda xi, si, **kw: model.apply(v, xi, si, **kw))
    out = fn(x, sigma, aug_cond=jnp.ones([2, 9]))
    assert out.shape == x.shape

"""Folded (b, h, w*c) image layout (k_diffusion_tpu/layout.py): the sampler
and loss compute on folded arrays must be bitwise-identical to NHWC — the
fold is a pure layout change (contiguous reshape + flat-indexed RNG bits),
not different math."""

import jax
import jax.numpy as jnp
import numpy as np

from k_diffusion_tpu import layout, sampling
from k_diffusion_tpu.denoiser import Denoiser

from test_models import tiny_model


def test_fold_unfold_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, 3))
    f = layout.fold_images(x)
    assert f.shape == (2, 8, 18)
    np.testing.assert_array_equal(np.asarray(layout.unfold_images(f, 3)),
                                  np.asarray(x))


def test_normal_draw_reshape_invariant():
    """jax.random.normal bits are flat-indexed, so drawing at the folded
    shape equals the NHWC draw reshaped — the loss/sampler RNG is unchanged
    by folding."""
    key = jax.random.PRNGKey(7)
    a = jax.random.normal(key, (2, 4, 6, 3))
    b = jax.random.normal(key, (2, 4, 18))
    np.testing.assert_array_equal(np.asarray(a.reshape(2, 4, 18)),
                                  np.asarray(b))


def test_folded_sampler_bitwise_equal():
    model = tiny_model("global")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3)) * 80.0
    sigma = jnp.asarray([1.0, 3.0])
    variables = model.init(key, x[:1] / 80.0, sigma[:1])
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.fold_in(key, 1), len(leaves))
    params = treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])

    def model_fn(xi, si, **kw):
        return model.apply({"params": params}, xi, si, **kw)

    sigmas = sampling.get_sigmas_karras(8, 1e-2, 80.0)
    plain = sampling.sample_dpmpp_2m(
        Denoiser(model_fn, sigma_data=0.5), x, sigmas)
    folded = sampling.sample_dpmpp_2m(
        Denoiser(layout.folded_model_fn(model_fn, 3), sigma_data=0.5),
        layout.fold_images(x), sigmas)
    np.testing.assert_array_equal(np.asarray(plain),
                                  np.asarray(layout.unfold_images(folded, 3)))


def test_folded_loss_bitwise_equal():
    model = tiny_model("global")
    key = jax.random.PRNGKey(3)
    reals = jax.random.normal(key, (2, 16, 16, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), reals.shape)
    sigma = jnp.asarray([0.5, 2.0])
    variables = model.init(key, reals, sigma)
    params = variables["params"]

    def model_fn(xi, si, **kw):
        return model.apply({"params": params}, xi, si, **kw)

    plain = Denoiser(model_fn, sigma_data=0.5, weighting="soft-min-snr").loss(
        reals, noise, sigma)
    folded = Denoiser(layout.folded_model_fn(model_fn, 3), sigma_data=0.5,
                      weighting="soft-min-snr").loss(
        layout.fold_images(reals), layout.fold_images(noise), sigma)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(folded))


def test_folded_model_fn_tuple_return():
    """DenoiserWithVariance contract: (output, logvar) — only the image
    element is folded."""

    def model_fn(x, sigma, **kwargs):
        return x * 2.0, jnp.ones(x.shape[0])

    inner = layout.folded_model_fn(model_fn, 3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 24))
    out, logvar = inner(x, jnp.ones([2]))
    assert out.shape == x.shape
    assert logvar.shape == (2,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def test_to_from_tokens_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3))
    t = layout.to_tokens(x, (2, 2))
    assert t.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(np.asarray(layout.from_tokens(t, (2, 2), 3)),
                                  np.asarray(x))


def test_token_layout_model_bitwise_equal():
    """image_layout='tokens' (patch boundaries as plain matmuls, gather done
    once outside by layout.to_tokens) computes the same function as NHWC."""
    model = tiny_model("global")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    variables = model.init(key, x, sigma)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.fold_in(key, 1), len(leaves))
    params = treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])
    out_nhwc = model.apply({"params": params}, x, sigma)
    out_tok = model.apply({"params": params}, layout.to_tokens(x, (2, 2)),
                          sigma, image_layout="tokens")
    np.testing.assert_array_equal(
        np.asarray(out_nhwc),
        np.asarray(layout.from_tokens(out_tok, (2, 2), 3)))


def test_token_layout_sampler_equal():
    """A full fixed-noise sampler trajectory through the token-layout carry
    matches the NHWC trajectory pixel for pixel (sampler algebra is
    elementwise, so the carry layout is free to choose)."""
    model = tiny_model("global")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3)) * 80.0
    sigma = jnp.asarray([1.0, 3.0])
    variables = model.init(key, x[:1] / 80.0, sigma[:1])
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.fold_in(key, 1), len(leaves))
    params = treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])

    def model_fn(xi, si, **kw):
        return model.apply({"params": params}, xi, si, **kw)

    def token_fn(xi, si, **kw):
        return model.apply({"params": params}, xi, si,
                           image_layout="tokens", **kw)

    sigmas = sampling.get_sigmas_karras(8, 1e-2, 80.0)
    plain = sampling.sample_dpmpp_2m(
        Denoiser(model_fn, sigma_data=0.5), x, sigmas)
    tok = sampling.sample_dpmpp_2m(
        Denoiser(token_fn, sigma_data=0.5), layout.to_tokens(x, (2, 2)), sigmas)
    np.testing.assert_array_equal(
        np.asarray(plain), np.asarray(layout.from_tokens(tok, (2, 2), 3)))


def test_token_layout_loss_close():
    """Training loss on the token layout: same elements, different reduction
    order -> equal to float tolerance."""
    model = tiny_model("global")
    key = jax.random.PRNGKey(3)
    reals = jax.random.normal(key, (2, 16, 16, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), reals.shape)
    sigma = jnp.asarray([0.5, 2.0])
    variables = model.init(key, reals, sigma)
    params = variables["params"]

    def model_fn(xi, si, **kw):
        return model.apply({"params": params}, xi, si, **kw)

    def token_fn(xi, si, **kw):
        return model.apply({"params": params}, xi, si,
                           image_layout="tokens", **kw)

    plain = Denoiser(model_fn, sigma_data=0.5, weighting="soft-min-snr").loss(
        reals, noise, sigma)
    tok = Denoiser(token_fn, sigma_data=0.5, weighting="soft-min-snr").loss(
        layout.to_tokens(reals, (2, 2)), layout.to_tokens(noise, (2, 2)), sigma)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(tok), rtol=1e-6)

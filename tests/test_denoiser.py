"""EDM preconditioner identities and wrapper behavior (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import denoiser, external, ode, sampling


def test_edm_scalings_identities():
    sigma = jnp.asarray([0.1, 1.0, 10.0])
    sd = 0.5
    c_skip, c_out, c_in = denoiser.edm_scalings(sigma, sd)
    # Karras et al. (2022) eq. (7) identities:
    np.testing.assert_allclose(
        np.asarray(c_skip), sd ** 2 / (np.asarray(sigma) ** 2 + sd ** 2), rtol=1e-5)
    # variance preservation: (sigma^2 + sd^2) * c_in^2 == 1
    np.testing.assert_allclose(
        np.asarray((sigma ** 2 + sd ** 2) * c_in ** 2), 1.0, rtol=1e-5)
    # c_out^2 + c_skip^2 * (sigma^2 + sd^2) == sd^2  (effective output var)
    np.testing.assert_allclose(
        np.asarray(c_out ** 2 + c_skip ** 2 * (sigma ** 2 + sd ** 2)), sd ** 2, rtol=1e-5)


def test_weightings():
    sigma = jnp.asarray([0.5, 2.0])
    w = denoiser.weighting_soft_min_snr(sigma, 1.0)
    np.testing.assert_allclose(
        np.asarray(w),
        (np.asarray(sigma)) ** 2 / (np.asarray(sigma) ** 2 + 1) ** 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(denoiser.weighting_karras(sigma)), 1.0)
    np.testing.assert_allclose(
        np.asarray(denoiser.weighting_snr(sigma, 2.0)),
        4.0 / (np.asarray(sigma) ** 2 + 4.0), rtol=1e-6)


def _perfect_inner(sigma_data):
    """Inner model that makes the preconditioned Denoiser an exact posterior
    mean for N(0, sigma_data^2) data: target F(x_in, sigma) such that
    forward == x * sd^2/(sd^2+sigma^2)."""
    def inner(x_in, sigma, **kwargs):
        sig = sigma.reshape(sigma.shape + (1,) * (x_in.ndim - sigma.ndim))
        c_skip, c_out, c_in = denoiser.edm_scalings(sig, sigma_data)
        # want: F * c_out + (x_in/c_in) * c_skip == (x_in/c_in) * sd^2/(sd^2+sig^2)
        x = x_in / c_in
        return (x * sigma_data ** 2 / (sigma_data ** 2 + sig ** 2) - x * c_skip) / c_out
    return inner


def test_denoiser_loss_zero_for_perfect_model():
    """If the inner model exactly predicts the preconditioning target, the
    loss is 0 — checks forward/loss target-space consistency."""
    sd = 1.0

    def inner(x_in, sigma, x0_ref=None):
        # exact target: (x0 - c_skip * noised) / c_out with noised = x_in / c_in
        sig = sigma.reshape(sigma.shape + (1,) * (x_in.ndim - sigma.ndim))
        c_skip, c_out, c_in = denoiser.edm_scalings(sig, sd)
        noised = x_in / c_in
        return (x0_ref - c_skip * noised) / c_out

    d = denoiser.Denoiser(inner, sigma_data=sd)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 8))
    sigma = jnp.asarray([0.1, 0.5, 2.0, 10.0])
    loss = d.loss(x0, noise, sigma, x0_ref=x0)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-8)


def test_denoiser_forward_matches_analytic():
    sd = 0.7
    d = denoiser.Denoiser(_perfect_inner(sd), sigma_data=sd)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8)) * 3.0
    sigma = jnp.full([4], 2.0)
    out = d(x, sigma)
    expected = np.asarray(x) * sd ** 2 / (sd ** 2 + 4.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_denoiser_multiscale_loss_runs():
    def inner(x_in, sigma):
        return jnp.zeros_like(x_in)

    d = denoiser.Denoiser(inner, weighting="soft-min-snr", scales=3)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 16, 16, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    sigma = jnp.asarray([0.5, 1.0])
    loss = d.loss(x0, noise, sigma)
    assert loss.shape == (2,)
    assert np.all(np.isfinite(np.asarray(loss)))


def test_simple_loss_denoiser():
    sd = 1.0
    d = denoiser.SimpleLossDenoiser(_perfect_inner(sd), sigma_data=sd)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8)) * 0.0  # zero data: denoised == c x
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 8))
    sigma = jnp.full([4], 1.0)
    loss = d.loss(x0, noise, sigma)
    assert loss.shape == (4,)
    assert np.all(np.isfinite(np.asarray(loss)))


def test_denoiser_with_variance():
    sd = 1.0

    def inner(x_in, sigma, return_variance=False):
        out = jnp.zeros_like(x_in)
        if return_variance:
            return out, jnp.zeros([x_in.shape[0]])
        return out

    d = denoiser.DenoiserWithVariance(inner, sigma_data=sd)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 8))
    loss = d.loss(x0, noise, jnp.full([4], 1.0))
    assert loss.shape == (4,)


# --- external wrappers ---

def test_v_denoiser_sigma_t_roundtrip():
    v = external.VDenoiser(lambda x, t: x)
    sigma = jnp.asarray([0.01, 0.5, 1.0, 20.0])
    np.testing.assert_allclose(
        np.asarray(v.t_to_sigma(v.sigma_to_t(sigma))), np.asarray(sigma), rtol=1e-4)


def test_discrete_schedule_roundtrip():
    alphas_cumprod = jnp.cumprod(1 - jnp.linspace(1e-4, 0.02, 1000))
    wrap = external.DiscreteEpsDDPMDenoiser(lambda x, t: x, alphas_cumprod, quantize=False)
    # sigmas ascending in t; roundtrip through interpolation
    t = jnp.asarray([0.0, 10.5, 500.0, 998.4])
    sigma = wrap.t_to_sigma(t)
    t2 = wrap.sigma_to_t(sigma)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-2)
    # quantized t is integer-valued
    tq = wrap.sigma_to_t(sigma, quantize=True)
    assert tq.dtype in (jnp.int32, jnp.int64)


def test_discrete_schedule_get_sigmas():
    alphas_cumprod = jnp.cumprod(1 - jnp.linspace(1e-4, 0.02, 100))
    wrap = external.DiscreteEpsDDPMDenoiser(lambda x, t: x, alphas_cumprod, quantize=False)
    s = wrap.get_sigmas(20)
    assert s.shape == (21,)
    assert float(s[-1]) == 0.0
    assert np.all(np.diff(np.asarray(s[:-1])) < 0)
    s_full = wrap.get_sigmas()
    assert s_full.shape == (101,)


def test_discrete_eps_denoiser_identity():
    """If the inner model predicts the exact eps, forward returns the exact x0."""
    alphas_cumprod = jnp.cumprod(1 - jnp.linspace(1e-4, 0.02, 1000))
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (2, 8))

    def eps_model(x_in, t):
        return noise  # oracle

    wrap = external.DiscreteEpsDDPMDenoiser(eps_model, alphas_cumprod, quantize=False)
    sigma = jnp.full([2], 3.0)
    noised = x0 + noise * 3.0
    out = wrap(noised, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_openai_denoiser_splits_channels():
    alphas_cumprod = jnp.cumprod(1 - jnp.linspace(1e-4, 0.02, 100))

    def model(x_in, t):
        return jnp.concatenate([jnp.zeros_like(x_in), jnp.ones_like(x_in)], axis=-1)

    wrap = external.OpenAIDenoiser(model, alphas_cumprod)
    out = wrap(jnp.ones([2, 4, 4, 3]), jnp.full([2], 1.0))
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)  # eps==0 -> x unchanged


# --- log-likelihood ---

def test_log_likelihood_gaussian():
    """For the exact Gaussian denoiser, log-likelihood must match the
    analytic N(0, sd^2 + sigma_min^2) density."""
    sd = 1.0

    def model(x, sigma):
        sig = sigma.reshape(sigma.shape + (1,) * (x.ndim - sigma.ndim))
        return x * sd ** 2 / (sd ** 2 + sig ** 2)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16))
    sigma_min, sigma_max = 1e-3, 80.0
    ll, info = ode.log_likelihood(model, x, sigma_min, sigma_max,
                                  key=jax.random.fold_in(key, 1))
    var = sd ** 2 + sigma_min ** 2
    expected = np.sum(
        -0.5 * np.asarray(x) ** 2 / var - 0.5 * np.log(2 * np.pi * var), axis=1)
    np.testing.assert_allclose(np.asarray(ll), expected, rtol=2e-3, atol=2e-2)
    assert int(info["fevals"]) > 0

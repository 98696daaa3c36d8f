"""Sampler suite tests: schedule closed forms, ancestral-step algebra,
Brownian-tree invariants, and solver convergence on an analytically solvable
denoiser (Gaussian data => exact posterior mean; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import sampling

SIGMA_DATA = 1.0
SIGMA_MIN, SIGMA_MAX = 1e-2, 80.0


def gaussian_denoiser(x, sigma, sigma_data=SIGMA_DATA):
    """Exact posterior mean for x0 ~ N(0, sigma_data^2 I)."""
    s = sampling.append_zero(jnp.zeros([0]))  # noqa: F841  (keep import surface)
    sig = sigma.reshape(sigma.shape + (1,) * (x.ndim - sigma.ndim))
    return x * sigma_data ** 2 / (sigma_data ** 2 + sig ** 2)


def exact_solution(x_max, sigma_from, sigma_to, sigma_data=SIGMA_DATA):
    """Probability-flow ODE solution for the Gaussian denoiser:
    x(s2) = x(s1) * sqrt((sd^2 + s2^2) / (sd^2 + s1^2))."""
    return x_max * np.sqrt((sigma_data ** 2 + sigma_to ** 2) /
                           (sigma_data ** 2 + sigma_from ** 2))


# --- schedules ---

def test_karras_schedule_endpoints():
    s = sampling.get_sigmas_karras(10, SIGMA_MIN, SIGMA_MAX)
    assert s.shape == (11,)
    assert np.isclose(float(s[0]), SIGMA_MAX, rtol=1e-5)
    assert np.isclose(float(s[-2]), SIGMA_MIN, rtol=1e-5)
    assert float(s[-1]) == 0.0
    assert np.all(np.diff(np.asarray(s)) < 0)


def test_exponential_schedule():
    s = np.asarray(sampling.get_sigmas_exponential(8, 0.1, 10.0))
    assert np.isclose(s[0], 10.0, rtol=1e-5)
    assert np.isclose(s[-2], 0.1, rtol=1e-5)
    # log-linear: constant ratio
    ratios = s[:-2][1:] / s[:-2][:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


def test_polyexponential_rho1_equals_exponential():
    a = np.asarray(sampling.get_sigmas_polyexponential(8, 0.1, 10.0, rho=1.0))
    b = np.asarray(sampling.get_sigmas_exponential(8, 0.1, 10.0))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_vp_schedule_monotone():
    s = np.asarray(sampling.get_sigmas_vp(10))
    assert np.all(np.diff(s) < 0)
    assert s[-1] == 0.0


def test_ancestral_step_algebra():
    sd, su = sampling.get_ancestral_step(jnp.float32(2.0), jnp.float32(1.0), eta=1.0)
    # sigma_down^2 + sigma_up^2 == sigma_to^2
    assert np.isclose(float(sd) ** 2 + float(su) ** 2, 1.0, rtol=1e-5)
    sd0, su0 = sampling.get_ancestral_step(jnp.float32(2.0), jnp.float32(1.0), eta=0.0)
    assert float(sd0) == 1.0 and float(su0) == 0.0


def test_to_d():
    x = jnp.ones([2, 4])
    denoised = jnp.zeros([2, 4])
    d = sampling.to_d(x, jnp.full([2], 2.0), denoised)
    np.testing.assert_allclose(np.asarray(d), 0.5)


# --- Brownian tree ---

def test_brownian_tree_consistency():
    key = jax.random.PRNGKey(3)
    tree = sampling.VirtualBrownianTree(key, 0.0, 10.0, (4, 8))
    w_25 = tree(2.5)
    w_50 = tree(5.0)
    w_75 = tree(7.5)
    # increments add up exactly: W(2.5->7.5) == W(2.5->5) + W(5->7.5)
    np.testing.assert_allclose(
        np.asarray(w_75 - w_25), np.asarray((w_50 - w_25) + (w_75 - w_50)), atol=1e-5)
    # endpoint anchors
    np.testing.assert_allclose(np.asarray(tree(0.0)), 0.0, atol=1e-6)


def test_brownian_tree_determinism_and_step_invariance():
    key = jax.random.PRNGKey(7)
    shape = (2, 16)
    ns = sampling.BrownianTreeNoiseSampler(jnp.zeros(shape), 0.01, 10.0, key)
    a = ns(None, 5.0, 2.0)
    b = ns(None, 5.0, 2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # coarse increment equals the weighted sum of fine increments
    w_coarse = ns(None, 5.0, 1.0) * np.sqrt(4.0)
    w_f1 = ns(None, 5.0, 3.0) * np.sqrt(2.0)
    w_f2 = ns(None, 3.0, 1.0) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(w_coarse), np.asarray(w_f1 + w_f2), atol=1e-4)


def test_brownian_tree_variance():
    key = jax.random.PRNGKey(11)
    tree = sampling.VirtualBrownianTree(key, 0.0, 1.0, (50000,))
    w = np.asarray(tree(0.37))
    assert abs(w.var() - 0.37) < 0.02
    assert abs(w.mean()) < 0.02


# --- ODE samplers on the analytic Gaussian denoiser ---

ODE_SAMPLERS = [
    ("euler", sampling.sample_euler, 6e-2),
    ("heun", sampling.sample_heun, 1e-2),
    ("dpm_2", sampling.sample_dpm_2, 1e-2),
    ("lms", sampling.sample_lms, 1e-2),
    ("dpmpp_2m", sampling.sample_dpmpp_2m, 1e-2),
]


@pytest.mark.parametrize("name,sampler,tol", ODE_SAMPLERS)
def test_ode_sampler_accuracy(name, sampler, tol):
    key = jax.random.PRNGKey(0)
    sigmas = sampling.get_sigmas_karras(50, SIGMA_MIN, SIGMA_MAX)
    x = jax.random.normal(key, (4, 16)) * SIGMA_MAX
    out = sampler(gaussian_denoiser, x, sigmas)
    expected = exact_solution(np.asarray(x), SIGMA_MAX, 0.0)
    err = np.abs(np.asarray(out) - expected).max() / np.abs(expected).max()
    assert err < tol, f"{name}: rel err {err}"


def test_ode_samplers_agree():
    key = jax.random.PRNGKey(1)
    sigmas = sampling.get_sigmas_karras(100, SIGMA_MIN, SIGMA_MAX)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    outs = [np.asarray(s(gaussian_denoiser, x, sigmas)) for _, s, _ in ODE_SAMPLERS[1:]]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=0, atol=2e-2 * SIGMA_DATA)


def test_heun_converges_faster_than_euler():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    errs = {}
    for name, sampler in [("euler", sampling.sample_euler), ("heun", sampling.sample_heun)]:
        sigmas = sampling.get_sigmas_karras(20, SIGMA_MIN, SIGMA_MAX)
        out = sampler(gaussian_denoiser, x, sigmas)
        expected = exact_solution(np.asarray(x), SIGMA_MAX, 0.0)
        errs[name] = np.abs(np.asarray(out) - expected).max()
    assert errs["heun"] < errs["euler"] / 3


def test_sampler_jits():
    sigmas = sampling.get_sigmas_karras(10, SIGMA_MIN, SIGMA_MAX)
    x = jnp.ones((2, 8)) * SIGMA_MAX

    @jax.jit
    def run(x, sigmas):
        return sampling.sample_dpmpp_2m(gaussian_denoiser, x, sigmas)

    out = run(x, sigmas)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


# --- stochastic samplers: distributional correctness ---

STOCHASTIC_SAMPLERS = [
    ("euler_ancestral", sampling.sample_euler_ancestral),
    ("dpm_2_ancestral", sampling.sample_dpm_2_ancestral),
    ("dpmpp_2s_ancestral", sampling.sample_dpmpp_2s_ancestral),
    ("dpmpp_sde", sampling.sample_dpmpp_sde),
    ("dpmpp_2m_sde", sampling.sample_dpmpp_2m_sde),
    ("dpmpp_3m_sde", sampling.sample_dpmpp_3m_sde),
]


@pytest.mark.parametrize("name,sampler", STOCHASTIC_SAMPLERS)
def test_stochastic_sampler_distribution(name, sampler):
    """Sampling from N(0, sd^2) data with any correct sampler must land near
    N(0, sd^2): check the empirical std of the output."""
    key = jax.random.PRNGKey(0)
    k_init, k_samp = jax.random.split(key)
    n = 4096
    sigmas = sampling.get_sigmas_karras(100, SIGMA_MIN, SIGMA_MAX)
    x = jax.random.normal(k_init, (n,)).reshape(n // 16, 16) * SIGMA_MAX
    out = np.asarray(sampler(gaussian_denoiser, x, sigmas, key=k_samp)).ravel()
    # std of N(0,1) estimate from 4096 samples: se ~ 1/sqrt(2n) ~ 0.011
    assert abs(out.std() - SIGMA_DATA) < 0.08, f"{name}: std {out.std()}"
    assert abs(out.mean()) < 0.08, f"{name}: mean {out.mean()}"


@pytest.mark.parametrize("solver_type", ["heun", "midpoint"])
def test_dpmpp_2m_sde_eta0_matches_ode(solver_type):
    """With eta=0 the 2M SDE sampler is deterministic and should agree with
    the other ODE solvers."""
    key = jax.random.PRNGKey(1)
    sigmas = sampling.get_sigmas_karras(100, SIGMA_MIN, SIGMA_MAX)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    out = sampling.sample_dpmpp_2m_sde(
        gaussian_denoiser, x, sigmas, eta=0.0, solver_type=solver_type)
    expected = exact_solution(np.asarray(x), SIGMA_MAX, 0.0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-2)


# --- DPM-Solver fast & adaptive ---

def test_dpm_fast_accuracy():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    out = sampling.sample_dpm_fast(gaussian_denoiser, x, SIGMA_MIN, SIGMA_MAX, 30)
    expected = exact_solution(np.asarray(x), SIGMA_MAX, SIGMA_MIN)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("order", [2, 3])
def test_dpm_adaptive_accuracy(order):
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    out, info = sampling.sample_dpm_adaptive(
        gaussian_denoiser, x, SIGMA_MIN, SIGMA_MAX, order=order,
        rtol=0.002, atol=1e-5, return_info=True)
    expected = exact_solution(np.asarray(x), SIGMA_MAX, SIGMA_MIN)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-2, atol=2e-2)
    assert int(info["n_accept"]) > 0


def test_dpm_solver_class_adaptive_matches_functional():
    """DPMSolver.dpm_solver_adaptive (reference sampling.py:427-478) wraps
    sample_dpm_adaptive with t = -log(sigma) endpoints."""
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    solver = sampling.DPMSolver(gaussian_denoiser)
    t_start, t_end = -np.log(SIGMA_MAX), -np.log(SIGMA_MIN)
    out, info = solver.dpm_solver_adaptive(
        x, t_start, t_end, rtol=0.002, atol=1e-5)
    ref = sampling.sample_dpm_adaptive(
        gaussian_denoiser, x, SIGMA_MIN, SIGMA_MAX, rtol=0.002, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert int(info["n_accept"]) > 0


def test_lms_coeff_exact_for_linear():
    # For order 2 the LMS coefficients integrate the linear interpolant exactly:
    # sum of coeffs == t[i+1] - t[i]
    t = np.array([10.0, 7.0, 5.0, 2.0])
    c0 = sampling.linear_multistep_coeff(2, t, 1, 0)
    c1 = sampling.linear_multistep_coeff(2, t, 1, 1)
    assert np.isclose(c0 + c1, t[2] - t[1], rtol=1e-6)


def test_callback_is_invoked():
    calls = []
    sigmas = sampling.get_sigmas_karras(5, SIGMA_MIN, SIGMA_MAX)
    x = jnp.ones((1, 4)) * SIGMA_MAX
    sampling.sample_euler(gaussian_denoiser, x, sigmas,
                          callback=lambda info: calls.append(int(info["i"])))
    jax.effects_barrier()
    assert calls == list(range(5))


def test_sampler_determinism_fixed_key():
    """Identical PRNG keys must give bit-identical samples (reproducibility
    story replacing the reference's RNG-state checkpointing)."""
    key = jax.random.PRNGKey(5)
    sigmas = sampling.get_sigmas_karras(20, SIGMA_MIN, SIGMA_MAX)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    a = sampling.sample_dpmpp_2m_sde(gaussian_denoiser, x, sigmas, key=key)
    b = sampling.sample_dpmpp_2m_sde(gaussian_denoiser, x, sigmas, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sampling.sample_dpmpp_2m_sde(gaussian_denoiser, x, sigmas,
                                     key=jax.random.fold_in(key, 1))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


def test_brownian_noise_reduces_step_count_variance():
    """The point of the Brownian tree (reference sampling.py:92-114): with the
    same seed, sampling at different step counts stays correlated."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (4, 16)) * SIGMA_MAX

    def run(steps, noise_key):
        sigmas = sampling.get_sigmas_karras(steps, SIGMA_MIN, SIGMA_MAX)
        ns = sampling.BrownianTreeNoiseSampler(x, SIGMA_MIN, SIGMA_MAX, noise_key)
        return np.asarray(sampling.sample_dpmpp_2m_sde(
            gaussian_denoiser, x, sigmas, key=noise_key, noise_sampler=ns))

    nk = jax.random.fold_in(key, 7)
    a20, a40 = run(20, nk), run(40, nk)
    # different seed at the same step counts
    nk2 = jax.random.fold_in(key, 8)
    b40 = run(40, nk2)
    same_seed_dist = np.abs(a20 - a40).mean()
    diff_seed_dist = np.abs(a40 - b40).mean()
    assert same_seed_dist < diff_seed_dist


def test_call_sampler_dispatch():
    """call_sampler passes the key only to samplers whose signature takes
    one, and matches calling the sampler directly (VERDICT r2 weak #5)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 8)) * SIGMA_MAX
    sigmas = sampling.get_sigmas_karras(10, SIGMA_MIN, SIGMA_MAX)
    # deterministic sampler: key must be dropped, not TypeError
    a = sampling.call_sampler("dpmpp_2m", gaussian_denoiser, x, sigmas, key=key)
    b = sampling.sample_dpmpp_2m(gaussian_denoiser, x, sigmas)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stochastic sampler: key must be forwarded
    c = sampling.call_sampler("euler_ancestral", gaussian_denoiser, x, sigmas,
                              key=key)
    d = sampling.sample_euler_ancestral(gaussian_denoiser, x, sigmas, key=key)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
    with pytest.raises(ValueError, match="unknown sampler"):
        sampling.call_sampler("nope", gaussian_denoiser, x, sigmas)


def test_call_sampler_propagates_internal_type_error(monkeypatch):
    """A TypeError raised INSIDE a sampler must propagate — the old
    try/except dispatch swallowed it and silently retried without a key."""
    def broken_sampler(model, x, sigmas, extra_args=None, key=None):
        raise TypeError("genuine bug inside the sampler")

    monkeypatch.setattr(sampling, "sample_broken", broken_sampler,
                        raising=False)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 4))
    sigmas = sampling.get_sigmas_karras(5, SIGMA_MIN, SIGMA_MAX)
    with pytest.raises(TypeError, match="genuine bug"):
        sampling.call_sampler("broken", gaussian_denoiser, x, sigmas, key=key)

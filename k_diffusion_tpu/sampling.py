"""Sigma schedules and the full k-diffusion sampler suite, TPU-native.

Re-design of the reference's ``k_diffusion/sampling.py`` (702 LoC of Python
step loops over CUDA ops) as pure JAX: every fixed-step sampler is a single
``lax.scan`` whose body fuses the solver algebra into the model forward under
jit, the adaptive DPM-Solver driver is a ``lax.while_loop``, and the
torchsde BrownianTree is replaced by a counter-based *virtual Brownian tree*
(``jax.random.fold_in`` over dyadic interval bisection) so SDE noise is
reproducible and step-count-invariant without any host state.

Model contract (same as reference sampling.py:118 ff.): ``model(x, sigma,
**extra_args) -> denoised`` where ``sigma`` has shape ``[batch]``.

Conventions that differ from the reference (because JAX):
- Stochastic samplers take an explicit ``key``. Deterministic samplers don't.
- ``noise_sampler(key, sigma, sigma_next) -> noise`` (key is threaded by the
  sampler; BrownianTreeNoiseSampler ignores it and uses its own seed key).
- ``callback`` is invoked via ``jax.debug.callback`` with the same info dict
  as the reference.
- Everything is jittable given static ``len(sigmas)`` except ``sample_lms``
  (host-precomputed integration coefficients, like the reference's
  ``sigmas_cpu`` at sampling.py:264) and the adaptive/fast DPM drivers'
  sigma_min/max, which must be python floats.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .utils import append_dims


def append_zero(x):
    """Appends the terminal sigma=0 to a schedule (reference sampling.py:13-14)."""
    return jnp.concatenate([x, jnp.zeros([1], x.dtype)])


def get_sigmas_karras(n, sigma_min, sigma_max, rho=7.0, dtype=jnp.float32):
    """Karras et al. (2022) rho-schedule (reference sampling.py:17-23)."""
    ramp = jnp.linspace(0, 1, n, dtype=dtype)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return append_zero(sigmas)


def get_sigmas_exponential(n, sigma_min, sigma_max, dtype=jnp.float32):
    """Log-linear schedule (reference sampling.py:26-29)."""
    sigmas = jnp.exp(jnp.linspace(math.log(sigma_max), math.log(sigma_min), n, dtype=dtype))
    return append_zero(sigmas)


def get_sigmas_polyexponential(n, sigma_min, sigma_max, rho=1.0, dtype=jnp.float32):
    """Polynomial-in-log-sigma schedule (reference sampling.py:32-36)."""
    ramp = jnp.linspace(1, 0, n, dtype=dtype) ** rho
    sigmas = jnp.exp(ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min))
    return append_zero(sigmas)


def get_sigmas_vp(n, beta_d=19.9, beta_min=0.1, eps_s=1e-3, dtype=jnp.float32):
    """Continuous VP schedule (reference sampling.py:39-43)."""
    t = jnp.linspace(1, eps_s, n, dtype=dtype)
    sigmas = jnp.sqrt(jnp.exp(beta_d * t ** 2 / 2 + beta_min * t) - 1)
    return append_zero(sigmas)


def to_d(x, sigma, denoised):
    """Converts a denoiser output to a Karras ODE derivative (reference sampling.py:46-48)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta=1.0):
    """Splits a step into deterministic ``sigma_down`` and stochastic
    ``sigma_up`` parts (reference sampling.py:51-58)."""
    if isinstance(eta, (int, float)) and eta == 0:
        return sigma_to, jnp.zeros_like(jnp.asarray(sigma_to))
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2) / sigma_from ** 2) ** 0.5,
    )
    sigma_down = (sigma_to ** 2 - sigma_up ** 2) ** 0.5
    return sigma_down, sigma_up


def default_noise_sampler(x):
    """Fresh gaussian per call, keyed explicitly (reference sampling.py:61-62)."""
    return lambda key, sigma, sigma_next: jax.random.normal(key, x.shape, x.dtype)


class VirtualBrownianTree:
    """A Brownian motion W on [t0, t1] queryable at arbitrary t, defined as a
    pure function of (key, t): dyadic bisection with Brownian-bridge midpoint
    sampling, keys derived by ``jax.random.fold_in`` along the descent path.

    TPU-native replacement for torchsde.BrownianTree (reference
    sampling.py:65-89): no host-side tree state, fully jittable, identical
    values for identical (key, t) regardless of query order or step count.
    """

    def __init__(self, key, t0, t1, shape, dtype=jnp.float32, levels=24):
        self.key = key
        self.t0 = jnp.asarray(t0, jnp.float32)
        self.t1 = jnp.asarray(t1, jnp.float32)
        self.shape = shape
        self.dtype = dtype
        self.levels = levels

    def __call__(self, t):
        """W(t); W(t0) = 0, increments have variance |interval|."""
        span = self.t1 - self.t0
        u = jnp.clip((jnp.asarray(t, jnp.float32) - self.t0) / span, 0.0, 1.0)
        w1 = jax.random.normal(jax.random.fold_in(self.key, 1), self.shape, self.dtype)
        w1 = w1 * jnp.sqrt(jnp.abs(span)).astype(self.dtype)

        def body(_, carry):
            a, b, wa, wb, k = carry
            m = 0.5 * (a + b)
            km = jax.random.fold_in(k, 2)
            bridge_std = jnp.sqrt(0.25 * (b - a) * jnp.abs(span)).astype(self.dtype)
            wm = 0.5 * (wa + wb) + jax.random.normal(km, self.shape, self.dtype) * bridge_std
            go_right = u > m
            a2 = jnp.where(go_right, m, a)
            b2 = jnp.where(go_right, b, m)
            wa2 = jnp.where(go_right, wm, wa)
            wb2 = jnp.where(go_right, wb, wm)
            k2 = jax.random.fold_in(k, go_right.astype(jnp.int32))
            return a2, b2, wa2, wb2, k2

        init = (jnp.float32(0.0), jnp.float32(1.0), jnp.zeros(self.shape, self.dtype), w1,
                jax.random.fold_in(self.key, 0))
        a, b, wa, wb, _ = jax.lax.fori_loop(0, self.levels, body, init)
        frac = ((u - a) / (b - a)).astype(self.dtype)
        return wa + (wb - wa) * frac


class BrownianTreeNoiseSampler:
    """Deterministic-in-(sigma, sigma_next) SDE noise, reproducible across
    step counts (reference sampling.py:92-114).

    The per-step ``key`` argument is accepted for noise-sampler interface
    compatibility but ignored — all randomness derives from the constructor
    key, exactly like the reference's seed semantics.
    """

    def __init__(self, x, sigma_min, sigma_max, key, transform=lambda s: s):
        self.transform = transform
        t0 = self.transform(jnp.asarray(sigma_min))
        t1 = self.transform(jnp.asarray(sigma_max))
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        self.tree = VirtualBrownianTree(key, lo, hi, jnp.shape(x), x.dtype)

    def __call__(self, key, sigma, sigma_next):
        t0 = self.transform(jnp.asarray(sigma))
        t1 = self.transform(jnp.asarray(sigma_next))
        w = self.tree(t1) - self.tree(t0)
        return w / jnp.sqrt(jnp.abs(t1 - t0)).astype(w.dtype)


def _call_callback(callback, **info):
    if callback is not None:
        jax.debug.callback(callback, info)


def _s_in(x):
    return jnp.ones([x.shape[0]], x.dtype)


def _churn_step(x, sigma, key, n, s_churn, s_tmin, s_tmax, s_noise):
    """Karras Algorithm 2 churn: inflate sigma to sigma_hat and add matching
    noise (reference sampling.py:123-127). Static no-op when s_churn == 0."""
    if s_churn == 0.0:
        return x, sigma
    churn = min(s_churn / n, 2 ** 0.5 - 1)
    in_range = (s_tmin <= sigma) & (sigma <= s_tmax)
    gamma = jnp.where(in_range, churn, 0.0)
    sigma_hat = sigma * (gamma + 1)
    eps = jax.random.normal(key, x.shape, x.dtype) * s_noise
    x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0)).astype(x.dtype)
    return x, sigma_hat


def sample_euler(model, x, sigmas, extra_args=None, callback=None, key=None,
                 s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    """Algorithm 2 (Euler steps) from Karras et al. 2022 (reference sampling.py:117-135)."""
    extra_args = {} if extra_args is None else extra_args
    if s_churn > 0 and key is None:
        raise ValueError("sample_euler with s_churn > 0 needs a PRNG key")
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        step_key = jax.random.fold_in(key, i) if key is not None else None
        x, sigma_hat = _churn_step(x, sigma, step_key, n, s_churn, s_tmin, s_tmax, s_noise)
        denoised = model(x, sigma_hat * s_in, **extra_args)
        d = to_d(x, sigma_hat, denoised)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma_hat, denoised=denoised)
        x = x + d * (sigma_next - sigma_hat)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_euler_ancestral(model, x, sigmas, extra_args=None, callback=None,
                           key=None, eta=1.0, s_noise=1.0, noise_sampler=None):
    """Ancestral sampling with Euler steps (reference sampling.py:138-155)."""
    extra_args = {} if extra_args is None else extra_args
    if key is None:
        raise ValueError("sample_euler_ancestral needs a PRNG key")
    noise_sampler = default_noise_sampler(x) if noise_sampler is None else noise_sampler
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)
        d = to_d(x, sigma, denoised)
        x = x + d * (sigma_down - sigma)
        noise = noise_sampler(jax.random.fold_in(key, i), sigma, sigma_next)
        x = jnp.where(sigma_next > 0, x + noise * (s_noise * sigma_up).astype(x.dtype), x)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_heun(model, x, sigmas, extra_args=None, callback=None, key=None,
                s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    """Algorithm 2 (Heun steps) from Karras et al. 2022 (reference sampling.py:158-184)."""
    extra_args = {} if extra_args is None else extra_args
    if s_churn > 0 and key is None:
        raise ValueError("sample_heun with s_churn > 0 needs a PRNG key")
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        step_key = jax.random.fold_in(key, i) if key is not None else None
        x, sigma_hat = _churn_step(x, sigma, step_key, n, s_churn, s_tmin, s_tmax, s_noise)
        denoised = model(x, sigma_hat * s_in, **extra_args)
        d = to_d(x, sigma_hat, denoised)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma_hat, denoised=denoised)
        dt = sigma_next - sigma_hat

        # straight-line body: the final sigma=0 step takes the Euler value via
        # select (reference branches in python, sampling.py:168-183); a
        # lax.cond here would add a branch sub-computation per step and block
        # fusion across it for no runtime saving on the other n-1 steps.
        x_euler = x + d * dt
        denoised_2 = model(x_euler, sigma_next * s_in, **extra_args)
        d_2 = to_d(x_euler, sigma_next, denoised_2)
        x = jnp.where(sigma_next == 0, x_euler, x + (d + d_2) / 2 * dt)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_dpm_2(model, x, sigmas, extra_args=None, callback=None, key=None,
                 s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    """DPM-Solver-2 with Karras churn (reference sampling.py:187-215)."""
    extra_args = {} if extra_args is None else extra_args
    if s_churn > 0 and key is None:
        raise ValueError("sample_dpm_2 with s_churn > 0 needs a PRNG key")
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        step_key = jax.random.fold_in(key, i) if key is not None else None
        x, sigma_hat = _churn_step(x, sigma, step_key, n, s_churn, s_tmin, s_tmax, s_noise)
        denoised = model(x, sigma_hat * s_in, **extra_args)
        d = to_d(x, sigma_hat, denoised)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma_hat, denoised=denoised)

        # straight-line body with a final-step Euler select (see sample_heun)
        log_hat = jnp.log(sigma_hat)
        sigma_mid = jnp.exp(log_hat + 0.5 * (jnp.log(sigma_next) - log_hat))
        dt_1 = sigma_mid - sigma_hat
        dt_2 = sigma_next - sigma_hat
        x_2 = x + d * dt_1
        denoised_2 = model(x_2, sigma_mid * s_in, **extra_args)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        x = jnp.where(sigma_next == 0, x + d * dt_2, x + d_2 * dt_2)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_dpm_2_ancestral(model, x, sigmas, extra_args=None, callback=None,
                           key=None, eta=1.0, s_noise=1.0, noise_sampler=None):
    """Ancestral sampling with DPM-Solver-2 steps (reference sampling.py:218-244)."""
    extra_args = {} if extra_args is None else extra_args
    if key is None:
        raise ValueError("sample_dpm_2_ancestral needs a PRNG key")
    noise_sampler = default_noise_sampler(x) if noise_sampler is None else noise_sampler
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)
        d = to_d(x, sigma, denoised)

        # straight-line body with a sigma_down=0 Euler select (see sample_heun)
        log_s = jnp.log(sigma)
        sigma_mid = jnp.exp(log_s + 0.5 * (jnp.log(sigma_down) - log_s))
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_down - sigma
        x_2 = x + d * dt_1
        denoised_2 = model(x_2, sigma_mid * s_in, **extra_args)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        noise = noise_sampler(jax.random.fold_in(key, i), sigma, sigma_next)
        x_dpm2 = x + d_2 * dt_2 + noise * (s_noise * sigma_up).astype(x.dtype)
        x = jnp.where(sigma_down == 0, x + d * dt_2, x_dpm2)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def linear_multistep_coeff(order, t, i, j):
    """Integral of the Lagrange basis polynomial over [t[i], t[i+1]], computed
    exactly with Gauss-Legendre (the integrand is a degree<order polynomial;
    replaces the reference's scipy.integrate.quad at sampling.py:247-257)."""
    if order - 1 > i:
        raise ValueError(f"Order {order} too high for step {i}")

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod = prod * (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    nodes, weights = np.polynomial.legendre.leggauss(max(1, (order + 1) // 2 + 1))
    a, b = t[i], t[i + 1]
    tau = 0.5 * (b - a) * nodes + 0.5 * (b + a)
    return float(0.5 * (b - a) * np.sum(weights * fn(tau)))


def sample_lms(model, x, sigmas, extra_args=None, callback=None, order=4):
    """Linear multistep sampler (reference sampling.py:260-277). ``sigmas``
    must be concrete (the integration coefficients are host-precomputed, like
    the reference's ``sigmas_cpu``); the step loop itself is a lax.scan."""
    extra_args = {} if extra_args is None else extra_args
    sigmas_np = np.asarray(sigmas, dtype=np.float64)
    n = len(sigmas_np) - 1
    coeffs = np.zeros([n, order], dtype=np.float32)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            coeffs[i, j] = linear_multistep_coeff(cur_order, sigmas_np, i, j)
    coeffs = jnp.asarray(coeffs)
    sigmas = jnp.asarray(sigmas_np, x.dtype)
    s_in = _s_in(x)

    def body(carry, i):
        x, ds = carry
        sigma = sigmas[i]
        denoised = model(x, sigma * s_in, **extra_args)
        d = to_d(x, sigma, denoised)
        ds = jnp.roll(ds, 1, axis=0).at[0].set(d)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)
        x = x + jnp.tensordot(coeffs[i].astype(x.dtype), ds, axes=1)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(body, (x, ds0), jnp.arange(n))
    return x


# DPM-Solver (Lu et al. 2022, arXiv:2206.00927), t = -log(sigma) space.
# Reference sampling.py:304-505.


def _t_dpm(sigma):
    return -jnp.log(sigma)


def _sigma_dpm(t):
    return jnp.exp(-t)


def _dpm_eps(model, extra_args, x, t):
    sigma = _sigma_dpm(t)
    denoised = model(x, sigma * _s_in(x), **extra_args)
    return (x - denoised) / sigma, denoised


def _dpm_solver_1_step(model, extra_args, x, t, t_next, eps):
    h = t_next - t
    return x - _sigma_dpm(t_next) * jnp.expm1(h) * eps


def _dpm_solver_2_step(model, extra_args, x, t, t_next, eps, r1=1 / 2):
    h = t_next - t
    s1 = t + r1 * h
    u1 = x - _sigma_dpm(s1) * jnp.expm1(r1 * h) * eps
    eps_r1, _ = _dpm_eps(model, extra_args, u1, s1)
    x_2 = (x - _sigma_dpm(t_next) * jnp.expm1(h) * eps
           - _sigma_dpm(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))
    return x_2, eps_r1


def _dpm_solver_3_step(model, extra_args, x, t, t_next, eps, eps_r1=None,
                       r1=1 / 3, r2=2 / 3):
    h = t_next - t
    s1 = t + r1 * h
    s2 = t + r2 * h
    if eps_r1 is None:
        u1 = x - _sigma_dpm(s1) * jnp.expm1(r1 * h) * eps
        eps_r1, _ = _dpm_eps(model, extra_args, u1, s1)
    u2 = (x - _sigma_dpm(s2) * jnp.expm1(r2 * h) * eps
          - _sigma_dpm(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps))
    eps_r2, _ = _dpm_eps(model, extra_args, u2, s2)
    x_3 = (x - _sigma_dpm(t_next) * jnp.expm1(h) * eps
           - _sigma_dpm(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps))
    return x_3


def sample_dpm_fast(model, x, sigma_min, sigma_max, n, extra_args=None,
                    callback=None, key=None, eta=0.0, s_noise=1.0, noise_sampler=None):
    """DPM-Solver-Fast, fixed NFE (reference sampling.py:388-425, 481-490).
    The order pattern is static given ``n``, so the step loop is unrolled at
    trace time into one fused XLA program."""
    extra_args = {} if extra_args is None else extra_args
    if sigma_min <= 0 or sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must not be 0")
    if eta and key is None and noise_sampler is None:
        raise ValueError("sample_dpm_fast with eta > 0 needs a PRNG key")
    if noise_sampler is None and key is not None:
        noise_sampler = default_noise_sampler(x)

    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    m = math.floor(n / 3) + 1
    ts = jnp.linspace(t_start, t_end, m + 1)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]

    for i, order in enumerate(orders):
        t, t_next = ts[i], ts[i + 1]
        if eta:
            sd, su = get_ancestral_step(_sigma_dpm(t), _sigma_dpm(t_next), eta)
            t_next_ = jnp.minimum(t_end, _t_dpm(sd))
            su = (_sigma_dpm(t_next) ** 2 - _sigma_dpm(t_next_) ** 2) ** 0.5
        else:
            t_next_, su = t_next, 0.0

        eps, denoised = _dpm_eps(model, extra_args, x, t)
        _call_callback(callback, x=x, i=i, t=ts[i], t_up=t, denoised=denoised,
                       sigma=_sigma_dpm(ts[i]), sigma_hat=_sigma_dpm(t))

        if order == 1:
            x = _dpm_solver_1_step(model, extra_args, x, t, t_next_, eps)
        elif order == 2:
            x, _ = _dpm_solver_2_step(model, extra_args, x, t, t_next_, eps)
        else:
            x = _dpm_solver_3_step(model, extra_args, x, t, t_next_, eps)

        if eta:
            noise = noise_sampler(jax.random.fold_in(key, i) if key is not None else None,
                                  _sigma_dpm(t), _sigma_dpm(t_next))
            x = x + (su * s_noise).astype(x.dtype) * noise
    return x


def sample_dpm_adaptive(model, x, sigma_min, sigma_max, extra_args=None,
                        callback=None, key=None, order=3, rtol=0.05, atol=0.0078,
                        h_init=0.05, pcoeff=0.0, icoeff=1.0, dcoeff=0.0,
                        accept_safety=0.81, eta=0.0, s_noise=1.0,
                        noise_sampler=None, return_info=False, max_steps=1000):
    """DPM-Solver-12/23 with adaptive PID step-size control
    (reference sampling.py:304-330, 427-478, 493-505), as a lax.while_loop.

    ``max_steps`` bounds the loop for XLA (the reference loop is unbounded);
    the PID controller state (h, last two inverse errors) lives in the carry.
    """
    extra_args = {} if extra_args is None else extra_args
    if sigma_min <= 0 or sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must not be 0")
    if order not in {2, 3}:
        raise ValueError("order should be 2 or 3")
    if eta and key is None and noise_sampler is None:
        raise ValueError("sample_dpm_adaptive with eta > 0 needs a PRNG key")
    if noise_sampler is None:
        noise_sampler = default_noise_sampler(x)
        if key is None:
            key = jax.random.PRNGKey(0)

    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    pid_order = 1.5 if eta else order
    b1 = (pcoeff + icoeff + dcoeff) / pid_order
    b2 = -(pcoeff + 2 * dcoeff) / pid_order
    b3 = dcoeff / pid_order
    pid_eps = 1e-8

    def cond_fn(carry):
        s = carry["s"]
        return (s < t_end - 1e-5) & (carry["steps"] < max_steps)

    def body_fn(carry):
        x, x_prev, s, h = carry["x"], carry["x_prev"], carry["s"], carry["h"]
        t = jnp.minimum(t_end, s + h)
        if eta:
            sd, su = get_ancestral_step(_sigma_dpm(s), _sigma_dpm(t), eta)
            t_ = jnp.minimum(t_end, _t_dpm(sd))
            su = (_sigma_dpm(t) ** 2 - _sigma_dpm(t_) ** 2) ** 0.5
        else:
            t_, su = t, jnp.float32(0.0)

        eps, denoised = _dpm_eps(model, extra_args, x, s)
        if order == 2:
            x_low = _dpm_solver_1_step(model, extra_args, x, s, t_, eps)
            x_high, _ = _dpm_solver_2_step(model, extra_args, x, s, t_, eps)
        else:
            x_low, eps_r1 = _dpm_solver_2_step(model, extra_args, x, s, t_, eps, r1=1 / 3)
            x_high = _dpm_solver_3_step(model, extra_args, x, s, t_, eps, eps_r1=eps_r1)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        error = jnp.linalg.norm((x_low - x_high) / delta) / x.size ** 0.5

        # PID controller (reference sampling.py:304-330)
        inv_error = 1 / (error + pid_eps)
        e1 = jnp.where(carry["first"], inv_error, carry["errs"][0])
        e2 = jnp.where(carry["first"], inv_error, carry["errs"][1])
        factor = inv_error ** b1 * e1 ** b2 * e2 ** b3
        factor = 1 + jnp.arctan(factor - 1)
        accept = factor >= accept_safety
        errs = jnp.where(accept, jnp.stack([inv_error, e1]), jnp.stack([e1, e2]))

        if eta:
            step_key = jax.random.fold_in(key, carry["steps"])
            noise = noise_sampler(step_key, _sigma_dpm(s), _sigma_dpm(t))
            x_acc = x_high + (su * s_noise).astype(x.dtype) * noise
        else:
            x_acc = x_high

        new = dict(carry)
        new["x"] = jnp.where(accept, x_acc, x)
        new["x_prev"] = jnp.where(accept, x_low, x_prev)
        new["s"] = jnp.where(accept, t, s)
        new["h"] = h * factor
        new["errs"] = errs
        new["first"] = jnp.logical_and(carry["first"], False)
        new["n_accept"] = carry["n_accept"] + accept.astype(jnp.int32)
        new["n_reject"] = carry["n_reject"] + (~accept).astype(jnp.int32)
        new["nfe"] = carry["nfe"] + order
        new["steps"] = carry["steps"] + 1
        _call_callback(callback, x=new["x"], i=carry["steps"], t=new["s"], t_up=new["s"],
                       denoised=denoised, error=error, h=new["h"],
                       sigma=_sigma_dpm(new["s"]), sigma_hat=_sigma_dpm(new["s"]),
                       steps=new["steps"], nfe=new["nfe"],
                       n_accept=new["n_accept"], n_reject=new["n_reject"])
        return new

    init = {
        "x": x, "x_prev": x, "s": jnp.float32(t_start),
        "h": jnp.float32(abs(h_init)),
        "errs": jnp.ones([2], jnp.float32), "first": jnp.bool_(True),
        "n_accept": jnp.int32(0), "n_reject": jnp.int32(0),
        "nfe": jnp.int32(0), "steps": jnp.int32(0),
    }
    final = jax.lax.while_loop(cond_fn, body_fn, init)
    info = {k: final[k] for k in ("steps", "nfe", "n_accept", "n_reject")}
    if return_info:
        return final["x"], info
    return final["x"]


def sample_dpmpp_2s_ancestral(model, x, sigmas, extra_args=None, callback=None,
                              key=None, eta=1.0, s_noise=1.0, noise_sampler=None):
    """Ancestral DPM-Solver++(2S) (reference sampling.py:508-539)."""
    extra_args = {} if extra_args is None else extra_args
    if key is None:
        raise ValueError("sample_dpmpp_2s_ancestral needs a PRNG key")
    noise_sampler = default_noise_sampler(x) if noise_sampler is None else noise_sampler
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)

        # straight-line body with a sigma_down=0 Euler select (see sample_heun)
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_down)
        r = 1 / 2
        h = t_next - t
        s = t + r * h
        x_2 = (_sigma_dpm(s) / _sigma_dpm(t)) * x - jnp.expm1(-h * r) * denoised
        denoised_2 = model(x_2, _sigma_dpm(s) * s_in, **extra_args)
        x_dpmpp = (_sigma_dpm(t_next) / _sigma_dpm(t)) * x - jnp.expm1(-h) * denoised_2
        x_euler = x + to_d(x, sigma, denoised) * (sigma_down - sigma)
        x = jnp.where(sigma_down == 0, x_euler, x_dpmpp)
        noise = noise_sampler(jax.random.fold_in(key, i), sigma, sigma_next)
        x = jnp.where(sigma_next > 0, x + noise * (s_noise * sigma_up).astype(x.dtype), x)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def _brownian_default(x, sigmas, key, noise_sampler):
    if noise_sampler is not None:
        return noise_sampler
    if key is None:
        raise ValueError("this sampler needs a PRNG key (or an explicit noise_sampler)")
    sigmas_pos = jnp.where(sigmas > 0, sigmas, jnp.inf)
    sigma_min, sigma_max = jnp.min(sigmas_pos), jnp.max(sigmas)
    return BrownianTreeNoiseSampler(x, sigma_min, sigma_max, key)


def sample_dpmpp_sde(model, x, sigmas, extra_args=None, callback=None, key=None,
                     eta=1.0, s_noise=1.0, noise_sampler=None, r=1 / 2):
    """DPM-Solver++ (stochastic), 2 stages (reference sampling.py:542-581)."""
    extra_args = {} if extra_args is None else extra_args
    noise_sampler = _brownian_default(x, sigmas, key, noise_sampler)
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)

        # straight-line body with a final-step Euler select (see sample_heun)
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_next)
        h = t_next - t
        s = t + h * r
        fac = 1 / (2 * r)

        # Step 1
        sd, su = get_ancestral_step(_sigma_dpm(t), _sigma_dpm(s), eta)
        s_ = _t_dpm(sd)
        x_2 = (_sigma_dpm(s_) / _sigma_dpm(t)) * x - jnp.expm1(t - s_) * denoised
        noise = noise_sampler(jax.random.fold_in(key, 2 * i) if key is not None else None,
                              _sigma_dpm(t), _sigma_dpm(s))
        x_2 = x_2 + noise * (s_noise * su).astype(x.dtype)
        denoised_2 = model(x_2, _sigma_dpm(s) * s_in, **extra_args)

        # Step 2
        sd, su = get_ancestral_step(_sigma_dpm(t), _sigma_dpm(t_next), eta)
        t_next_ = _t_dpm(sd)
        denoised_d = (1 - fac) * denoised + fac * denoised_2
        x_sde = (_sigma_dpm(t_next_) / _sigma_dpm(t)) * x - jnp.expm1(t - t_next_) * denoised_d
        noise = noise_sampler(jax.random.fold_in(key, 2 * i + 1) if key is not None else None,
                              _sigma_dpm(t), _sigma_dpm(t_next))
        x_sde = x_sde + noise * (s_noise * su).astype(x.dtype)
        x_euler = x + to_d(x, sigma, denoised) * (sigma_next - sigma)
        x = jnp.where(sigma_next == 0, x_euler, x_sde)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_dpmpp_2m(model, x, sigmas, extra_args=None, callback=None):
    """DPM-Solver++(2M), deterministic multistep (reference sampling.py:584-607)."""
    extra_args = {} if extra_args is None else extra_args
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(carry, i):
        x, old_denoised = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_next)
        h = t_next - t
        use_multistep = (i > 0) & (sigma_next > 0)
        sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
        h_last = t - (-jnp.log(sigma_prev))
        r = jnp.where(use_multistep, h_last / h, 1.0)
        denoised_d = jnp.where(
            use_multistep,
            (1 + 1 / (2 * r)).astype(x.dtype) * denoised - (1 / (2 * r)).astype(x.dtype) * old_denoised,
            denoised,
        )
        x = (sigma_next / sigma).astype(x.dtype) * x - jnp.expm1(-h).astype(x.dtype) * denoised_d
        return (x, denoised), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(n))
    return x


def sample_dpmpp_2m_sde(model, x, sigmas, extra_args=None, callback=None, key=None,
                        eta=1.0, s_noise=1.0, noise_sampler=None, solver_type="midpoint"):
    """DPM-Solver++(2M) SDE, heun/midpoint variants — the reference's default
    demo/eval sampler (reference sampling.py:610-652, train.py:362-363)."""
    if solver_type not in {"heun", "midpoint"}:
        raise ValueError("solver_type must be 'heun' or 'midpoint'")
    extra_args = {} if extra_args is None else extra_args
    if eta:
        noise_sampler = _brownian_default(x, sigmas, key, noise_sampler)
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(carry, i):
        x, old_denoised, h_last, have_old = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)

        t, s = -jnp.log(sigma), -jnp.log(sigma_next)
        h = s - t
        eta_h = eta * h

        x_new = ((sigma_next / sigma) * jnp.exp(-eta_h)).astype(x.dtype) * x \
            + (-jnp.expm1(-h - eta_h)).astype(x.dtype) * denoised

        r_safe = jnp.where(have_old, h_last / jnp.where(h == 0, 1.0, h), 1.0)
        if solver_type == "heun":
            corr = (jnp.expm1(-h - eta_h) / (h + eta_h) + 1) * (1 / r_safe)
        else:
            corr = 0.5 * -jnp.expm1(-h - eta_h) * (1 / r_safe)
        x_new = jnp.where(have_old, x_new + corr.astype(x.dtype) * (denoised - old_denoised), x_new)

        if eta:
            noise = noise_sampler(jax.random.fold_in(key, i) if key is not None else None,
                                  sigma, sigma_next)
            amt = sigma_next * jnp.sqrt(-jnp.expm1(-2 * eta_h)) * s_noise
            x_new = x_new + noise * amt.astype(x.dtype)

        x = jnp.where(sigma_next == 0, denoised, x_new)
        return (x, denoised, h, jnp.bool_(True)), None

    init = (x, jnp.zeros_like(x), jnp.float32(1.0), jnp.bool_(False))
    (x, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(n))
    return x


def sample_dpmpp_3m_sde(model, x, sigmas, extra_args=None, callback=None, key=None,
                        eta=1.0, s_noise=1.0, noise_sampler=None):
    """DPM-Solver++(3M) SDE (reference sampling.py:655-702)."""
    extra_args = {} if extra_args is None else extra_args
    if eta:
        noise_sampler = _brownian_default(x, sigmas, key, noise_sampler)
    n = len(sigmas) - 1
    s_in = _s_in(x)

    def body(carry, i):
        x, denoised_1, denoised_2, h_1, h_2, n_old = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model(x, sigma * s_in, **extra_args)
        _call_callback(callback, x=x, i=i, sigma=sigma, sigma_hat=sigma, denoised=denoised)

        t, s = -jnp.log(sigma), -jnp.log(sigma_next)
        h = s - t
        h_eta = h * (eta + 1)
        h_safe = jnp.where(h_eta == 0, 1.0, h_eta)

        x_new = jnp.exp(-h_eta).astype(x.dtype) * x + (-jnp.expm1(-h_eta)).astype(x.dtype) * denoised

        phi_2 = jnp.expm1(-h_eta) / h_safe + 1
        phi_3 = phi_2 / h_safe - 0.5

        # two-history correction (guarded against the uninitialized lanes)
        r0 = jnp.where(n_old >= 1, h_1 / h, 1.0)
        r1 = jnp.where(n_old >= 2, h_2 / h, 1.0)
        d1_0 = (denoised - denoised_1) / r0
        d1_1 = (denoised_1 - denoised_2) / r1
        d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        x_two = x_new + (phi_2.astype(x.dtype) * d1 - phi_3.astype(x.dtype) * d2)
        x_one = x_new + phi_2.astype(x.dtype) * d1_0
        x_new = jnp.where(n_old >= 2, x_two, jnp.where(n_old >= 1, x_one, x_new))

        if eta:
            noise = noise_sampler(jax.random.fold_in(key, i) if key is not None else None,
                                  sigma, sigma_next)
            amt = sigma_next * jnp.sqrt(-jnp.expm1(-2 * h * eta)) * s_noise
            x_new = x_new + noise * amt.astype(x.dtype)

        x = jnp.where(sigma_next == 0, denoised, x_new)
        return (x, denoised, denoised_1, h, h_1, jnp.minimum(n_old + 1, 2)), None

    init = (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.float32(1.0),
            jnp.float32(1.0), jnp.int32(0))
    (x, _, _, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(n))
    return x


def call_sampler(name, model, x, sigmas, extra_args=None, key=None, **kwargs):
    """Dispatch a fixed-step sampler by short name (``'euler'`` ->
    ``sample_euler``), passing ``key`` only when the sampler's SIGNATURE
    takes one (deterministic samplers like lms/dpmpp_2m don't). Dispatching
    on ``inspect.signature`` — never via try/except TypeError, which would
    swallow a genuine TypeError raised inside the sampler and silently
    retry it without a key (reference sample.py:58-61 only ever calls
    sample_lms; this is our multi-sampler CLI's dispatcher)."""
    import inspect
    fn = globals().get(f"sample_{name}")
    if fn is None:
        raise ValueError(f"unknown sampler '{name}'")
    if "key" in inspect.signature(fn).parameters and key is not None:
        kwargs["key"] = key
    return fn(model, x, sigmas, extra_args=extra_args, **kwargs)


def __getattr__(name):
    # the reference exposes log_likelihood from sampling (sampling.py:280);
    # ours lives in ode.py (lazy import avoids the circular dependency)
    if name == "log_likelihood":
        from .ode import log_likelihood
        return log_likelihood
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


class DPMSolver:
    """Thin object interface over the DPM-Solver step functions for API
    parity with the reference's DPMSolver class (sampling.py:333-478)."""

    def __init__(self, model, extra_args=None):
        self.model = model
        self.extra_args = {} if extra_args is None else extra_args

    def t(self, sigma):
        return -jnp.log(sigma)

    def sigma(self, t):
        return jnp.exp(-t)

    def eps(self, x, t):
        return _dpm_eps(self.model, self.extra_args, x, t)[0]

    def dpm_solver_1_step(self, x, t, t_next):
        eps, _ = _dpm_eps(self.model, self.extra_args, x, t)
        return _dpm_solver_1_step(self.model, self.extra_args, x, t, t_next, eps)

    def dpm_solver_2_step(self, x, t, t_next, r1=1 / 2):
        eps, _ = _dpm_eps(self.model, self.extra_args, x, t)
        out, _ = _dpm_solver_2_step(self.model, self.extra_args, x, t, t_next,
                                    eps, r1=r1)
        return out

    def dpm_solver_3_step(self, x, t, t_next, r1=1 / 3, r2=2 / 3):
        eps, _ = _dpm_eps(self.model, self.extra_args, x, t)
        return _dpm_solver_3_step(self.model, self.extra_args, x, t, t_next,
                                  eps, r1=r1, r2=r2)

    def dpm_solver_fast(self, x, t_start, t_end, nfe, eta=0.0, s_noise=1.0,
                        noise_sampler=None, key=None):
        return sample_dpm_fast(
            self.model, x, float(jnp.exp(-t_end)), float(jnp.exp(-t_start)),
            nfe, extra_args=self.extra_args, eta=eta, s_noise=s_noise,
            noise_sampler=noise_sampler, key=key)

    def dpm_solver_adaptive(self, x, t_start, t_end, order=3, rtol=0.05,
                            atol=0.0078, h_init=0.05, pcoeff=0.0, icoeff=1.0,
                            dcoeff=0.0, accept_safety=0.81, eta=0.0,
                            s_noise=1.0, noise_sampler=None, key=None):
        """Adaptive DPM-Solver-12/23 driver (reference sampling.py:427-478);
        t in -log(sigma) space like the other class methods. Returns
        (x, info)."""
        return sample_dpm_adaptive(
            self.model, x, float(jnp.exp(-t_end)), float(jnp.exp(-t_start)),
            extra_args=self.extra_args, order=order, rtol=rtol, atol=atol,
            h_init=h_init, pcoeff=pcoeff, icoeff=icoeff, dcoeff=dcoeff,
            accept_safety=accept_safety, eta=eta, s_noise=s_noise,
            noise_sampler=noise_sampler, key=key, return_info=True)

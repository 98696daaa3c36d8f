"""Adaptive Dormand-Prince (dopri5) ODE integration over pytrees, and exact
log-likelihood via the Hutchinson trace estimator.

TPU-native replacement for the reference's torchdiffeq ``odeint`` +
autograd.grad pipeline (reference sampling.py:280-301): the integrator is a
single ``lax.while_loop`` (so the whole likelihood evaluation compiles to one
XLA program, dynamic NFE and all), and the Jacobian trace probe uses
forward-mode ``jax.jvp`` — one extra forward-cost pass per eval instead of
torch's reverse-mode graph, which maps better onto the MXU.
"""

import jax
import jax.numpy as jnp

from .sampling import to_d
from .utils import append_dims

# Dormand-Prince 5(4) Butcher tableau.
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B_HIGH = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B_LOW = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40)


def _tree_axpy(a, x, y):
    """y + a * x over pytrees (a scalar)."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


def _tree_lincomb(h, coeffs, trees, base):
    """base + h * sum(c_i * tree_i); c_i are static floats, h may be traced."""
    out = base
    for c, t in zip(coeffs, trees):
        if c != 0.0:
            out = _tree_axpy(h * c, t, out)
    return out


def _error_ratio(err, y0, y1, rtol, atol):
    def leaf_sq(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = (e / scale) ** 2
        return jnp.sum(r), r.size

    parts = [leaf_sq(e, a, b) for e, a, b in zip(
        jax.tree_util.tree_leaves(err),
        jax.tree_util.tree_leaves(y0),
        jax.tree_util.tree_leaves(y1))]
    total = sum(p[0] for p in parts)
    count = sum(p[1] for p in parts)
    return jnp.sqrt(total / count)


def odeint_dopri5(f, y0, t0, t1, rtol=1e-4, atol=1e-4, max_steps=2000, h_init=None):
    """Integrates dy/dt = f(t, y) from t0 to t1 (t1 > t0), y a pytree.

    Returns (y1, info) where info has the step/feval counters. Fixed-order
    PI step-size control (0.9 safety, exponent 1/5), matching dopri5's
    conventional controller.
    """
    t0 = jnp.float32(t0)
    t1 = jnp.float32(t1)
    if h_init is None:
        h0 = (t1 - t0) * 0.01
    else:
        h0 = jnp.float32(h_init)

    f0 = f(t0, y0)

    def body(carry):
        t, y, fy, h, steps, nfe, naccept = (
            carry["t"], carry["y"], carry["fy"], carry["h"],
            carry["steps"], carry["nfe"], carry["naccept"],
        )
        h = jnp.minimum(h, t1 - t)
        ks = [fy]
        for i in range(1, 7):
            ti = t + _C[i] * h
            yi = _tree_lincomb(h, _A[i], ks, y)
            ks.append(f(ti, yi))
        y_high = _tree_lincomb(h, _B_HIGH, ks, y)
        err = _tree_lincomb(
            h, [bh - bl for bh, bl in zip(_B_HIGH, _B_LOW)], ks,
            jax.tree_util.tree_map(jnp.zeros_like, y),
        )
        ratio = _error_ratio(err, y, y_high, rtol, atol)
        accept = ratio <= 1.0
        factor = jnp.clip(0.9 * jnp.where(ratio == 0, 10.0, ratio ** -0.2), 0.2, 10.0)

        new_t = jnp.where(accept, t + h, t)
        new_y = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), y_high, y)
        # FSAL: k7 = f(t+h, y_high) is stage 7
        new_fy = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), ks[6], fy)
        return {
            "t": new_t, "y": new_y, "fy": new_fy, "h": h * factor,
            "steps": steps + 1, "nfe": nfe + 6,
            "naccept": naccept + accept.astype(jnp.int32),
        }

    def cond(carry):
        return (carry["t"] < t1 - 1e-8) & (carry["steps"] < max_steps)

    init = {"t": t0, "y": y0, "fy": f0, "h": h0,
            "steps": jnp.int32(0), "nfe": jnp.int32(1), "naccept": jnp.int32(0)}
    final = jax.lax.while_loop(cond, body, init)
    info = {k: final[k] for k in ("steps", "nfe", "naccept")}
    return final["y"], info


def log_likelihood(model, x, sigma_min, sigma_max, extra_args=None, key=None,
                   atol=1e-4, rtol=1e-4, max_steps=2000):
    """Exact log-likelihood of x under the model's probability-flow ODE
    (reference sampling.py:280-301).

    The divergence is estimated with a Rademacher probe v and forward-mode
    jvp: d_ll = v . (dd/dx) v, equal to the reference's v . grad((d*v).sum()).
    Returns (ll, info).

    The model trace runs under ``ops.pallas.force_xla()``: custom_vjp Pallas
    kernels do not support forward-mode autodiff, so the attention/FFN
    dispatchers must take their pure-XLA paths here. Callers need no
    incantation of their own.
    """
    from .ops import pallas as _pallas

    extra_args = {} if extra_args is None else extra_args
    if key is None:
        raise ValueError("log_likelihood needs a PRNG key for the Hutchinson probe")
    s_in = jnp.ones([x.shape[0]], x.dtype)
    v = jax.random.rademacher(key, x.shape, x.dtype)

    def ode_fn(sigma, state):
        xt, _ = state

        def d_fn(xin):
            denoised = model(xin, sigma * s_in, **extra_args)
            return to_d(xin, sigma, denoised)

        d, jvp_v = jax.jvp(d_fn, (xt,), (v,))
        d_ll = jnp.sum((v * jvp_v).reshape(x.shape[0], -1), axis=1)
        return d, d_ll

    y0 = (x, jnp.zeros([x.shape[0]], x.dtype))
    with _pallas.force_xla():
        (latent, delta_ll), info = odeint_dopri5(
            ode_fn, y0, sigma_min, sigma_max, rtol=rtol, atol=atol, max_steps=max_steps)
    d = latent.reshape(x.shape[0], -1)
    ll_prior = jnp.sum(
        -0.5 * (d / sigma_max) ** 2 - 0.5 * jnp.log(2 * jnp.pi) - jnp.log(sigma_max),
        axis=1,
    )
    return ll_prior + delta_ll, {"fevals": info["nfe"], **info}

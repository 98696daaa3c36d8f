"""Division- and exp-free erf/gelu for Mosaic kernels.

Mosaic has no erf primitive; round 1/2 used the Abramowitz-Stegun 7.1.26
rational approximation, but its divide + exp dominate the VPU time of the
fused FFN kernels (the GEGLU chain is the kernels' bottleneck, not the
matmuls — see PERFORMANCE.md). These are plain clamped polynomials:

- ``erf_poly``: erf(z) ~ z * P(t), t = 2 z^2 / B^2 - 1, with P a
  degree-12 Chebyshev-node least-squares fit on |z| <= B = 3.2, clamped
  outside where erf has saturated. The normalized variable keeps the f32
  Horner evaluation conditioned; max abs f32 error 2.4e-7 — the same
  class as the A&S 7.1.26 rational it replaces (1.5e-7), so even
  f32-precision gradient tests see no difference.
- ``gauss_pdf_poly``: even degree-14 fit of the standard normal pdf on
  |g| <= 4.8 (phi < 4e-6 outside), abs error < 2.3e-3. NOT used by the
  GELU backward (its error shows up in f32-precision gradient tests);
  kept for kernels that can afford it.

Cost per element: ~12 multiply-adds each, all on the main VPU pipe.
"""

import jax.numpy as jnp

_ERF_B = 3.2
_ERF_C = (4.4133439411e-01, -2.1729512626e-01, 1.5433980817e-01,
          -1.1389889031e-01, 8.0803864115e-02, -5.3307235615e-02,
          3.2428308215e-02, -1.8446977266e-02, 9.4124039317e-03,
          -3.8186039222e-03, 1.6886493159e-03, -1.1736545548e-03,
          4.3120816940e-04)

_PHI_B = 4.8
_PHI_C = (3.9814471733e-01, -1.9428662926e-01, 4.4192190000e-02,
          -5.8350787926e-03, 4.6637368877e-04, -2.2062298215e-05,
          5.6545183490e-07, -6.0299442016e-09)


def _horner(u, coefs):
    acc = coefs[-1]
    for c in reversed(coefs[:-1]):
        acc = acc * u + c
    return acc


def erf_poly(z):
    """erf(z) on f32, max abs error 2.4e-7."""
    zc = jnp.clip(z, -_ERF_B, _ERF_B)
    t = zc * zc * (2.0 / (_ERF_B * _ERF_B)) - 1.0
    return zc * _horner(t, _ERF_C)


def gelu_poly(g):
    """Exact-erf GELU g * Phi(g) with the polynomial erf."""
    return 0.5 * g * (1.0 + erf_poly(g * (2.0 ** -0.5)))


def gauss_pdf_poly(g):
    """Standard normal pdf phi(g), abs error < 2.3e-3."""
    gc = jnp.clip(g, -_PHI_B, _PHI_B)
    return _horner(gc * gc, _PHI_C)


def gelu_and_grad_poly(g):
    """(gelu(g), gelu'(g)) = (g*Phi, Phi + g*phi). Phi comes from the
    polynomial erf; phi uses the exact exp — a single EUP op, and the
    2.2e-3 error of the polynomial pdf is visible in f32-precision
    gradient tests (the fwd-side 7e-5 erf error is not)."""
    Phi = 0.5 * (1.0 + erf_poly(g * (2.0 ** -0.5)))
    phi = jnp.exp(-0.5 * g * g) * ((2.0 * jnp.pi) ** -0.5)
    return g * Phi, Phi + g * phi

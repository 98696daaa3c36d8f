"""Shared NN building blocks (flax.linen), NHWC layout.

Counterparts of reference k_diffusion/layers.py:116-312 that the models need.
Design difference from the reference: no ConditionedModule/thread-the-dict
machinery — conditioning is an explicit argument everywhere (JAX functional
style), and FourierFeatures uses a fixed deterministic random basis instead
of a per-init buffer (a fixed random projection is statistically equivalent
and removes the only non-param state from the model pytree).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

# Re-export the denoiser wrappers at their reference location (k_diffusion
# exposes Denoiser from layers; see reference k_diffusion/__init__.py:2).
from .denoiser import Denoiser, DenoiserWithVariance, SimpleLossDenoiser  # noqa: F401


class FourierFeatures(nn.Module):
    """Random Fourier embedding with a fixed gaussian basis
    (reference layers.py:285-293). The torch reference stores the basis as a
    state_dict *buffer* (randn, never trained); here it is a ``basis`` param
    with a deterministic init (seed 0x5EED) frozen via stop_gradient — same
    function as a fixed projection, but portable: reference checkpoints'
    Fourier buffers land in the param tree (scripts/port_reference_checkpoint
    .py) instead of being lost. ``basis`` is (in, out//2) = the transpose of
    the reference's (out//2, in) weight. Classified no-wd by the taxonomy, so
    the frozen value survives AdamW (zero grad => zero Adam update)."""

    in_features: int
    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x):
        assert self.out_features % 2 == 0
        basis = self.param(
            "basis",
            lambda _key, shape: jax.random.normal(
                jax.random.PRNGKey(0x5EED), shape, jnp.float32) * self.std,
            (self.in_features, self.out_features // 2))
        weight = jax.lax.stop_gradient(basis.astype(jnp.float32))
        f = 2 * math.pi * (x.astype(jnp.float32) @ weight)
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1).astype(x.dtype)


_RESAMPLE_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
              0.43359375, 0.11328125, -0.03515625, -0.01171875],
    "lanczos3": [0.003689131001010537, 0.015056144446134567, -0.03399861603975296,
                 -0.066637322306633, 0.13550527393817902, 0.44638532400131226,
                 0.44638532400131226, 0.13550527393817902, -0.066637322306633,
                 -0.03399861603975296, 0.015056144446134567, 0.003689131001010537],
}
_RESAMPLE_KERNELS["bilinear"] = _RESAMPLE_KERNELS["linear"]
_RESAMPLE_KERNELS["bicubic"] = _RESAMPLE_KERNELS["cubic"]


def _pad_reflect(x, pad, axis):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad, pad)
    return jnp.pad(x, pads, mode="reflect")


def downsample2d(x, kernel="linear", pad_mode="reflect"):
    """Fixed low-pass stride-2 downsampling, NHWC (reference layers.py:251-264).

    Separable: two depthwise 1-D convs instead of the reference's dense
    identity-expanded 2-D kernel — same math, C x k work instead of C^2 k^2,
    and XLA maps depthwise convs onto the VPU efficiently.
    """
    k1d = jnp.asarray(_RESAMPLE_KERNELS[kernel], jnp.float32)
    pad = len(k1d) // 2 - 1
    n, h, w, c = x.shape
    kh = k1d.reshape(-1, 1, 1, 1)
    kw = k1d.reshape(1, -1, 1, 1)
    x = _pad_reflect(_pad_reflect(x, pad, 1), pad, 2)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.tile(kh, (1, 1, 1, c)), (2, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c)
    y = jax.lax.conv_general_dilated(
        y, jnp.tile(kw, (1, 1, 1, c)), (1, 2), "VALID",
        dimension_numbers=dn, feature_group_count=c)
    return y.astype(x.dtype)


def upsample2d(x, kernel="linear", pad_mode="reflect"):
    """Fixed low-pass 2x upsampling, NHWC (reference layers.py:267-280),
    via transposed separable depthwise convs with kernel gain 2 per axis."""
    k1d = jnp.asarray(_RESAMPLE_KERNELS[kernel], jnp.float32) * 2
    pad = len(k1d) // 2 - 1
    n, h, w, c = x.shape
    x = _pad_reflect(_pad_reflect(x, (pad + 1) // 2, 1), (pad + 1) // 2, 2)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    # Transposed conv as zero-insertion (lhs_dilation=2) + VALID conv; the
    # resampling kernels are symmetric so no kernel flip is needed.
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kh, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(2, 1),
        dimension_numbers=dn, feature_group_count=c)
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(1, 2),
        dimension_numbers=dn, feature_group_count=c)
    return y.astype(x.dtype)

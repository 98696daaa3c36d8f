"""Guided-sampling model-fn wrappers (reference sample_clip_guided.py:20-41,
train.py:331-344). All are pure function combinators over the denoiser
contract — under jit the guidance gradient fuses into the sampling step."""

import jax
import jax.numpy as jnp

from .utils import append_dims


def spherical_dist_loss(x, y):
    """Squared arc distance on the unit sphere (reference
    sample_clip_guided.py:20-24)."""
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.arcsin(jnp.linalg.norm(x - y, axis=-1) / 2) ** 2 * 2


def make_cond_model_fn(model, cond_fn):
    """denoised += sigma^2 * cond_fn(x, sigma, denoised) — the reference's
    autograd.grad dance (sample_clip_guided.py:27-35) becomes jax.grad in the
    caller's cond_fn; here we just compose."""

    def model_fn(x, sigma, **kwargs):
        denoised = model(x, sigma, **kwargs)
        cond_grad = cond_fn(x, sigma, denoised=denoised, **kwargs)
        return denoised + cond_grad * append_dims(sigma ** 2, x.ndim)

    return model_fn


def make_static_thresh_model_fn(model, value=1.0):
    """Clamps the denoised prediction (reference sample_clip_guided.py:38-41)."""

    def model_fn(x, sigma, **kwargs):
        return jnp.clip(model(x, sigma, **kwargs), -value, value)

    return model_fn


def make_cfg_model_fn(model, cfg_scale, num_classes):
    """Classifier-free guidance: batched uncond+cond pass,
    uncond + (cond - uncond) * scale (reference train.py:331-344)."""

    def model_fn(x, sigma, class_cond, **kwargs):
        x_in = jnp.concatenate([x, x])
        sigma_in = jnp.concatenate([sigma, sigma])
        class_uncond = jnp.full_like(class_cond, num_classes)
        class_in = jnp.concatenate([class_uncond, class_cond])
        out = model(x_in, sigma_in, class_cond=class_in, **kwargs)
        out_uncond, out_cond = jnp.split(out, 2)
        return out_uncond + (out_cond - out_uncond) * cfg_scale

    if cfg_scale == 1:
        return model
    return model_fn

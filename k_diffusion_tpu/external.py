"""Wrappers that expose foreign diffusion models through the continuous-sigma
denoiser interface, so every sampler and the log-likelihood work on them.

Behavior parity: reference ``k_diffusion/external.py`` (177 LoC). The inner
model is any callable ``(x, t, **kwargs) -> output`` (a flax apply, a shimmed
torch module on host, etc.); all schedule math is pure jnp.
"""

import math

import jax.numpy as jnp

from . import sampling
from .utils import append_dims


class VDenoiser:
    """Wraps a v-objective continuous-time model (sigma <-> t via atan/tan)
    into the sigma interface (reference external.py:9-38)."""

    def __init__(self, inner_model):
        self.inner_model = inner_model
        self.sigma_data = 1.0

    def get_scalings(self, sigma):
        c_skip = self.sigma_data ** 2 / (sigma ** 2 + self.sigma_data ** 2)
        c_out = -sigma * self.sigma_data / (sigma ** 2 + self.sigma_data ** 2) ** 0.5
        c_in = 1 / (sigma ** 2 + self.sigma_data ** 2) ** 0.5
        return c_skip, c_out, c_in

    def sigma_to_t(self, sigma):
        return jnp.arctan(sigma) / math.pi * 2

    def t_to_sigma(self, t):
        return jnp.tan(t * math.pi / 2)

    def loss(self, input, noise, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(s, input.ndim) for s in self.get_scalings(sigma)]
        noised_input = input + noise * append_dims(sigma, input.ndim)
        model_output = self.inner_model(noised_input * c_in, self.sigma_to_t(sigma), **kwargs)
        target = (input - c_skip * noised_input) / c_out
        return jnp.mean(((model_output - target) ** 2).reshape(input.shape[0], -1), axis=1)

    def __call__(self, input, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(s, input.ndim) for s in self.get_scalings(sigma)]
        return self.inner_model(input * c_in, self.sigma_to_t(sigma), **kwargs) * c_out + input * c_skip


class DiscreteSchedule:
    """Maps between continuous sigmas and a model's discrete timestep indices
    via log-sigma interpolation (reference external.py:41-84)."""

    def __init__(self, sigmas, quantize):
        self.sigmas = jnp.asarray(sigmas)
        self.log_sigmas = jnp.log(self.sigmas)
        self.quantize = quantize

    @property
    def sigma_min(self):
        return self.sigmas[0]

    @property
    def sigma_max(self):
        return self.sigmas[-1]

    def get_sigmas(self, n=None):
        """Resamples the discrete schedule to n steps (descending, +0)."""
        if n is None:
            return sampling.append_zero(self.sigmas[::-1])
        t_max = len(self.sigmas) - 1
        t = jnp.linspace(t_max, 0, n)
        return sampling.append_zero(self.t_to_sigma(t))

    def sigma_to_t(self, sigma, quantize=None):
        quantize = self.quantize if quantize is None else quantize
        log_sigma = jnp.log(sigma)
        dists = log_sigma - self.log_sigmas[:, None]
        if quantize:
            return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)
        low_idx = jnp.clip(
            jnp.argmax(jnp.cumsum(dists >= 0, axis=0), axis=0),
            0, self.log_sigmas.shape[0] - 2)
        high_idx = low_idx + 1
        low, high = self.log_sigmas[low_idx], self.log_sigmas[high_idx]
        w = jnp.clip((low - log_sigma) / (low - high), 0, 1)
        t = (1 - w) * low_idx + w * high_idx
        return t.reshape(sigma.shape)

    def t_to_sigma(self, t):
        t = t.astype(jnp.float32)
        low_idx = jnp.floor(t).astype(jnp.int32)
        high_idx = jnp.ceil(t).astype(jnp.int32)
        w = t - low_idx
        log_sigma = (1 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[high_idx]
        return jnp.exp(log_sigma)


class DiscreteEpsDDPMDenoiser(DiscreteSchedule):
    """Wrapper for discrete-schedule DDPM models that predict eps
    (reference external.py:87-113)."""

    def __init__(self, model, alphas_cumprod, quantize):
        super().__init__(((1 - alphas_cumprod) / alphas_cumprod) ** 0.5, quantize)
        self.inner_model = model
        self.sigma_data = 1.0

    def get_scalings(self, sigma):
        c_out = -sigma
        c_in = 1 / (sigma ** 2 + self.sigma_data ** 2) ** 0.5
        return c_out, c_in

    def get_eps(self, *args, **kwargs):
        return self.inner_model(*args, **kwargs)

    def loss(self, input, noise, sigma, **kwargs):
        c_out, c_in = [append_dims(s, input.ndim) for s in self.get_scalings(sigma)]
        noised_input = input + noise * append_dims(sigma, input.ndim)
        eps = self.get_eps(noised_input * c_in, self.sigma_to_t(sigma), **kwargs)
        return jnp.mean(((eps - noise) ** 2).reshape(input.shape[0], -1), axis=1)

    def __call__(self, input, sigma, **kwargs):
        c_out, c_in = [append_dims(s, input.ndim) for s in self.get_scalings(sigma)]
        eps = self.get_eps(input * c_in, self.sigma_to_t(sigma), **kwargs)
        return input + eps * c_out


class OpenAIDenoiser(DiscreteEpsDDPMDenoiser):
    """Wrapper for OpenAI guided-diffusion models: splits the learned-sigma
    output channels (reference external.py:116-128). Channels-last layout."""

    def __init__(self, model, alphas_cumprod, quantize=False, has_learned_sigmas=True):
        super().__init__(model, jnp.asarray(alphas_cumprod, jnp.float32), quantize=quantize)
        self.has_learned_sigmas = has_learned_sigmas

    def get_eps(self, *args, **kwargs):
        model_output = self.inner_model(*args, **kwargs)
        if self.has_learned_sigmas:
            return jnp.split(model_output, 2, axis=-1)[0]
        return model_output


class CompVisDenoiser(DiscreteEpsDDPMDenoiser):
    """Wrapper for CompVis latent-diffusion models that predict eps
    (reference external.py:131-138). ``apply_model`` is the inner callable."""

    def __init__(self, model, alphas_cumprod, quantize=False):
        super().__init__(model, alphas_cumprod, quantize=quantize)

    def get_eps(self, *args, **kwargs):
        return self.inner_model(*args, **kwargs)


class DiscreteVDDPMDenoiser(DiscreteSchedule):
    """Wrapper for discrete-schedule DDPM models that predict v
    (reference external.py:141-167)."""

    def __init__(self, model, alphas_cumprod, quantize):
        super().__init__(((1 - alphas_cumprod) / alphas_cumprod) ** 0.5, quantize)
        self.inner_model = model
        self.sigma_data = 1.0

    def get_scalings(self, sigma):
        c_skip = self.sigma_data ** 2 / (sigma ** 2 + self.sigma_data ** 2)
        c_out = -sigma * self.sigma_data / (sigma ** 2 + self.sigma_data ** 2) ** 0.5
        c_in = 1 / (sigma ** 2 + self.sigma_data ** 2) ** 0.5
        return c_skip, c_out, c_in

    def get_v(self, *args, **kwargs):
        return self.inner_model(*args, **kwargs)

    def loss(self, input, noise, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(s, input.ndim) for s in self.get_scalings(sigma)]
        noised_input = input + noise * append_dims(sigma, input.ndim)
        model_output = self.get_v(noised_input * c_in, self.sigma_to_t(sigma), **kwargs)
        target = (input - c_skip * noised_input) / c_out
        return jnp.mean(((model_output - target) ** 2).reshape(input.shape[0], -1), axis=1)

    def __call__(self, input, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(s, input.ndim) for s in self.get_scalings(sigma)]
        return self.get_v(input * c_in, self.sigma_to_t(sigma), **kwargs) * c_out + input * c_skip


class CompVisVDenoiser(DiscreteVDDPMDenoiser):
    """Wrapper for CompVis models that predict v (reference external.py:170-177)."""

    def __init__(self, model, alphas_cumprod, quantize=False):
        super().__init__(model, alphas_cumprod, quantize=quantize)

    def get_v(self, x, t, cond=None, **kwargs):
        return self.inner_model(x, t, cond)

"""k-diffusion-tpu: a TPU-native (JAX/XLA/Pallas) diffusion framework with the
capability surface of crowsonkb/k-diffusion (Karras et al. 2022, EDM)."""

from . import (augmentation, checkpoint, condcache, config, data, denoiser,
               evaluation, external, gns, guidance, layers, layout, models,
               ode, ops, parallel, sampling, training, utils)
from .denoiser import Denoiser, DenoiserWithVariance, SimpleLossDenoiser
from .ode import log_likelihood

__version__ = "0.1.0"

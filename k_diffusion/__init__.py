"""Drop-in import alias: ``import k_diffusion as K`` resolves to the
TPU-native implementation (k_diffusion_tpu), keeping the reference's public
API paths (K.sampling.*, K.config.*, K.Denoiser, ...) working unchanged."""

import sys

import k_diffusion_tpu as _impl
from k_diffusion_tpu import *  # noqa: F401,F403
from k_diffusion_tpu import (augmentation, checkpoint, config, data, denoiser,
                             evaluation, external, gns, guidance, layers,
                             models, ode, ops, parallel, sampling, training,
                             utils)
from k_diffusion_tpu.denoiser import (Denoiser, DenoiserWithVariance,
                                      SimpleLossDenoiser)

# submodule paths like `import k_diffusion.sampling` must resolve too
for _name in ("augmentation", "checkpoint", "config", "data", "denoiser",
              "evaluation", "external", "gns", "guidance", "layers", "models",
              "ode", "ops", "parallel", "sampling", "training", "utils"):
    sys.modules[f"{__name__}.{_name}"] = getattr(_impl, _name)

__version__ = _impl.__version__

"""Core math and utility functions.

TPU-native re-design of the reference's ``k_diffusion/utils.py`` (see
/root/reference/k_diffusion/utils.py): everything is a pure function over JAX
arrays with explicit PRNG keys; the reference's thread-local stratification
context becomes an explicit ``stratified`` argument; torch LR scheduler classes
become optax-style schedule closures.
"""

from .array import (append_dims, dct, freq_weight_1d, freq_weight_nd, idct,
                    matmul_precision, n_params, transfer_params)
from .schedules import (
    EMAWarmup,
    constant_lr_with_warmup,
    exponential_lr,
    inverse_lr,
)
from .ema import ema_update, ema_update_dict
from .random import (
    rand_cosine_interpolated,
    rand_log_logistic,
    rand_log_normal,
    rand_log_uniform,
    rand_split_log_normal,
    rand_v_diffusion,
    stratified_uniform,
    uniform_maybe_stratified,
)
from .image import from_pil_image, make_grid, to_pil_image
from .logging import CSVLogger
from .io import download_file, get_safetensors_metadata

__all__ = [
    "append_dims", "n_params", "dct", "idct", "freq_weight_1d", "freq_weight_nd",
    "matmul_precision", "transfer_params",
    "EMAWarmup", "constant_lr_with_warmup", "exponential_lr", "inverse_lr",
    "ema_update", "ema_update_dict",
    "rand_cosine_interpolated", "rand_log_logistic", "rand_log_normal",
    "rand_log_uniform", "rand_split_log_normal", "rand_v_diffusion",
    "stratified_uniform", "uniform_maybe_stratified",
    "from_pil_image", "make_grid", "to_pil_image",
    "CSVLogger", "download_file", "get_safetensors_metadata",
]

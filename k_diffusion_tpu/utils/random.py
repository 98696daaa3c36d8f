"""Training-time sigma sample densities with explicit stratification.

Behavior parity: reference utils.py:267-385. The reference injects
stratification via a thread-local context manager (utils.py:279-320); here it
is an explicit ``stratified=(group, groups)`` argument so the same pure
function works inside jit/shard_map — on a device mesh, pass
``group = host_or_shard_index * accum_steps + accum_step`` to reproduce the
reference's cross-rank variance reduction (train.py:453-454).
"""

import math

import jax
import jax.numpy as jnp


def stratified_uniform(key, shape, group=0, groups=1, dtype=jnp.float32):
    """Stratified U(0,1) samples: this group's samples land in strata
    ``group, group+groups, ...`` of ``shape[-1] * groups`` equal bins
    (reference utils.py:267-276)."""
    if groups <= 0:
        raise ValueError(f"groups must be positive, got {groups}")
    n = shape[-1] * groups
    offsets = jnp.arange(group, n, groups, dtype=dtype)
    u = jax.random.uniform(key, shape, dtype=dtype)
    return (offsets + u) / n


def uniform_maybe_stratified(key, shape, stratified=None, dtype=jnp.float32):
    """U(0,1), stratified when ``stratified=(group, groups)`` is given."""
    if stratified is None:
        return jax.random.uniform(key, shape, dtype=dtype)
    group, groups = stratified
    return stratified_uniform(key, shape, group, groups, dtype=dtype)


def rand_log_normal(key, shape, loc=0.0, scale=1.0, stratified=None, dtype=jnp.float32):
    """Lognormal sigma density (reference utils.py:323-326)."""
    u = uniform_maybe_stratified(key, shape, stratified, dtype) * (1 - 2e-7) + 1e-7
    return jnp.exp(jax.scipy.special.ndtri(u) * scale + loc)


def rand_log_logistic(key, shape, loc=0.0, scale=1.0, min_value=0.0,
                      max_value=float("inf"), stratified=None, dtype=jnp.float32):
    """Optionally truncated log-logistic sigma density (reference utils.py:329-336).

    The reference does the CDF math in float64; TPUs have no fast f64 so this
    stays in f32 — the truncation bounds differ by <1e-6 relative.
    """
    min_cdf = jax.nn.sigmoid((math.log(min_value) - loc) / scale) if min_value > 0 else 0.0
    max_cdf = jax.nn.sigmoid((math.log(max_value) - loc) / scale) if max_value != float("inf") else 1.0
    u = uniform_maybe_stratified(key, shape, stratified, dtype) * (max_cdf - min_cdf) + min_cdf
    return jnp.exp(jax.scipy.special.logit(u) * scale + loc).astype(dtype)


def rand_log_uniform(key, shape, min_value, max_value, stratified=None, dtype=jnp.float32):
    """Log-uniform sigma density (reference utils.py:339-343)."""
    lo, hi = math.log(min_value), math.log(max_value)
    u = uniform_maybe_stratified(key, shape, stratified, dtype)
    return jnp.exp(u * (hi - lo) + lo)


def rand_v_diffusion(key, shape, sigma_data=1.0, min_value=0.0,
                     max_value=float("inf"), stratified=None, dtype=jnp.float32):
    """Truncated v-diffusion (arctan-uniform) sigma density (reference utils.py:346-351)."""
    min_cdf = math.atan(min_value / sigma_data) * 2 / math.pi
    max_cdf = math.atan(max_value / sigma_data) * 2 / math.pi if max_value != float("inf") else 1.0
    u = uniform_maybe_stratified(key, shape, stratified, dtype) * (max_cdf - min_cdf) + min_cdf
    return jnp.tan(u * math.pi / 2) * sigma_data


def rand_cosine_interpolated(key, shape, image_d, noise_d_low, noise_d_high,
                             sigma_data=1.0, min_value=1e-3, max_value=1e3,
                             stratified=None, dtype=jnp.float32):
    """Resolution-shifted interpolated cosine logSNR density from simple
    diffusion — the default density in all shipped configs
    (reference utils.py:354-375, configs/config_oxford_flowers.json:22-24)."""

    def logsnr_schedule_cosine(t, logsnr_min, logsnr_max):
        t_min = math.atan(math.exp(-0.5 * logsnr_max))
        t_max = math.atan(math.exp(-0.5 * logsnr_min))
        return -2 * jnp.log(jnp.tan(t_min + t * (t_max - t_min)))

    def shifted(t, noise_d, logsnr_min, logsnr_max):
        shift = 2 * math.log(noise_d / image_d)
        return logsnr_schedule_cosine(t, logsnr_min - shift, logsnr_max - shift) + shift

    logsnr_min = -2 * math.log(min_value / sigma_data)
    logsnr_max = -2 * math.log(max_value / sigma_data)
    u = uniform_maybe_stratified(key, shape, stratified, dtype)
    logsnr_low = shifted(u, noise_d_low, logsnr_min, logsnr_max)
    logsnr_high = shifted(u, noise_d_high, logsnr_min, logsnr_max)
    logsnr = logsnr_low + u * (logsnr_high - logsnr_low)
    return jnp.exp(-logsnr / 2) * sigma_data


def rand_split_log_normal(key, shape, loc, scale_1, scale_2, dtype=jnp.float32):
    """Split lognormal sigma density (reference utils.py:378-385; the reference
    does not stratify this one either)."""
    k_n, k_u = jax.random.split(key)
    n = jnp.abs(jax.random.normal(k_n, shape, dtype=dtype))
    u = jax.random.uniform(k_u, shape, dtype=dtype)
    n_left = n * -scale_1 + loc
    n_right = n * scale_2 + loc
    ratio = scale_1 / (scale_1 + scale_2)
    return jnp.exp(jnp.where(u < ratio, n_left, n_right))

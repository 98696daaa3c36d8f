"""Headline benchmark: 256x256 samples/sec/chip at 50-step DPM++(2M) on the
flagship hourglass DiT (BASELINE.json metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline is measured against this framework's round-1 XLA-fallback path
(the pre-Pallas number recorded below), since the reference publishes no
quantitative numbers (BASELINE.md): parity/improvement across rounds shows up
as vs_baseline > 1.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# Round-1 baseline: XLA masked-SDPA attention paths, same model/sampler/shapes
# (measured on TPU v5e before the Pallas NA/flash kernels landed:
# 1.497 s per batch-2 forward -> 50-step DPM++(2M) sampling throughput).
BASELINE_SAMPLES_PER_SEC = 2.0 / (1.497 * 50)


def main():
    import __graft_entry__
    from k_diffusion_tpu import config as config_mod, sampling
    from k_diffusion_tpu.denoiser import Denoiser

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    batch = 8  # measured sweet spot on v5e (negative batch scaling beyond)
    steps = 50
    x_shape = (batch, 256, 256, 3)

    sigma_min, sigma_max = config["model"]["sigma_min"], config["model"]["sigma_max"]
    init_x = jax.random.normal(key, x_shape) * sigma_max
    variables = jax.jit(model.init)(key, init_x[:1], jnp.ones([1]))
    params = variables["params"]

    sigmas = sampling.get_sigmas_karras(steps, sigma_min, sigma_max)

    def denoiser_fn(params):
        return Denoiser(
            lambda xi, si, **kw: model.apply({"params": params}, xi, si, **kw),
            sigma_data=config["model"]["sigma_data"])

    @jax.jit
    def sample(params, x, sigmas):
        return sampling.sample_dpmpp_2m(denoiser_fn(params), x, sigmas)

    # NOTE: under the axon tunnel block_until_ready does not reliably
    # synchronize; a host readback does. Use a scalar readback as the fence.
    def run_once():
        out = sample(params, init_x, sigmas)
        return float(jnp.sum(out[:, 0, 0, 0]))

    run_once()  # compile
    run_once()  # warmup

    n_iters = 5
    times = []
    for _ in range(n_iters):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)
    dt = sorted(times)[n_iters // 2]

    samples_per_sec = batch / dt
    print(json.dumps({
        "metric": "256x256 samples/sec/chip (50-step DPM++ 2M, flagship HDiT)",
        "value": round(samples_per_sec, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

"""512x512 4-level HDiT sampling throughput (configs/config_512_hdit.json).

Usage: python scripts/bench_512.py [--batch 4] [--steps 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from k_diffusion_tpu import config as config_mod, sampling
    from k_diffusion_tpu.denoiser import Denoiser

    config = config_mod.load_config("configs/config_512_hdit.json")
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (1, 512, 512, 3))
    params = jax.jit(model.init)(key, x1, jnp.ones([1]))["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    b = args.batch
    mcfg = config["model"]
    init_x = jax.random.normal(key, (b, 512, 512, 3)) * mcfg["sigma_max"]
    sigmas = sampling.get_sigmas_karras(args.steps, mcfg["sigma_min"],
                                        mcfg["sigma_max"])

    @jax.jit
    def sample(params, x, sigmas):
        den = Denoiser(
            lambda xi, si, **kw: model.apply({"params": params}, xi, si, **kw),
            sigma_data=mcfg["sigma_data"])
        return sampling.sample_dpmpp_2m(den, x, sigmas)

    def run():
        out = sample(params, init_x, sigmas)
        return float(jnp.sum(out[:, 0, 0, 0]))

    run(); run()
    ts = []
    for _ in range(3):
        t0 = time.time(); run(); ts.append(time.time() - t0)
    dt = sorted(ts)[1]
    print(f"512x512 sampling: {b/dt:.2f} samples/sec/chip "
          f"({dt/args.steps*1e3:.1f} ms/model-step at batch {b})")


if __name__ == "__main__":
    main()

"""Trace the HEADLINE sampling composition (bench.py's folded-layout 50-step
DPM++(2M) scan on the flagship HDiT) and print the per-step op breakdown.

Usage: python scripts/profile_sample.py [--batch 8] [--top 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

STEPS = 50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--condcache", action="store_true",
                    help="trace the precomputed-cond path bench.py uses")
    args = ap.parse_args()

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod, layout, sampling
    from k_diffusion_tpu.denoiser import Denoiser
    from scripts.profile_step import parse_xplane

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    b = args.batch
    mcfg = config["model"]
    params = jax.jit(model.init)(
        key, jax.random.normal(key, (1, 256, 256, 3)), jnp.ones([1]))["params"]
    init_x = jax.random.normal(key, (b, 64, 64, 48)) * mcfg["sigma_max"]
    sigmas = sampling.get_sigmas_karras(STEPS, mcfg["sigma_min"], mcfg["sigma_max"])

    @jax.jit
    def sample(params, x, sigmas):
        if args.condcache:
            from k_diffusion_tpu import condcache
            inner = condcache.scheduled_inner_fn(
                model, {"params": params}, sigmas[:-1], b,
                image_layout="tokens")
        else:
            inner = lambda xi, si, **kw: model.apply(
                {"params": params}, xi, si, image_layout="tokens", **kw)
        den = Denoiser(inner, sigma_data=mcfg["sigma_data"])
        return layout.from_tokens(sampling.sample_dpmpp_2m(den, x, sigmas), (4, 4), 3)

    def run():
        return float(jnp.sum(sample(params, init_x, sigmas)[:, 0, 0, 0]))

    run(); run()
    trace_dir = "/tmp/kdt_sample_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()
    parse_xplane(trace_dir, top=args.top, inner=STEPS)


if __name__ == "__main__":
    main()

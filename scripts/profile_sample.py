"""Trace the flagship eval forward (sampling composition) and print top ops.

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

INNER = 50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod
    from k_diffusion_tpu.denoiser import Denoiser
    from scripts.profile_step import parse_xplane

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    b = args.batch
    x = jax.random.normal(key, (b, 256, 256, 3))
    params = jax.jit(model.init)(key, x[:1], jnp.ones([1]))["params"]

    @jax.jit
    def scan_fwd(params, x):
        den = Denoiser(
            lambda xi, si, **kw: model.apply({"params": params}, xi, si, **kw),
            sigma_data=config["model"]["sigma_data"])
        def body(carry, i):
            out = den(carry, jnp.full([b], 2.0))
            return out * 0.99, None
        out, _ = jax.lax.scan(body, x, jnp.arange(INNER))
        return out

    def run():
        return float(jnp.sum(scan_fwd(params, x)[:, 0, 0, 0]))

    run(); run()
    trace_dir = "/tmp/kdt_sample_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()
    parse_xplane(trace_dir, top=args.top, inner=INNER)


if __name__ == "__main__":
    main()

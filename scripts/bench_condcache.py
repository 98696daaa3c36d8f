"""A/B the precomputed-cond sampling path (condcache.py) at small-model
scale, where sampler steps are launch-bound and the hoisted per-step cond
work is a larger share of the step than on the flagship (+1.4% there,
PERFORMANCE.md).

Model: one-level global HDiT, d=128, 16x16 tokens (64x64 px, patch 4),
depth 4 — mnist/cifar-transformer class. 50-step DPM++(2M), batch 8,
steady-state convention (reps batches per dispatch, host readback fence).

Usage: python scripts/bench_condcache.py [--reps 16] [--iters 5]
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
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from k_diffusion_tpu import condcache, layout, sampling
    from k_diffusion_tpu.denoiser import Denoiser
    from k_diffusion_tpu.models import image_transformer_v2 as itv2

    model = itv2.ImageTransformerDenoiserModelV2(
        levels=(itv2.LevelSpec(4, 128, 256,
                               itv2.GlobalAttentionSpec(64), 0.0),),
        mapping=itv2.MappingSpec(2, 128, 256, 0.0),
        in_channels=3, out_channels=3, patch_size=(4, 4),
        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    b, steps = 8, 50
    params = jax.jit(model.init)(
        key, jax.random.normal(key, (1, 64, 64, 3)), jnp.ones([1]))["params"]
    variables = {"params": params}
    init_x = jax.random.normal(key, (args.reps, b, 16, 16, 48)) * 80.0
    sigmas = sampling.get_sigmas_karras(steps, 1e-2, 80.0)

    def make_sample(condcached):
        @jax.jit
        def sample(params, xs, sigmas):
            if condcached:
                inner = condcache.scheduled_inner_fn(
                    model, {"params": params}, sigmas[:-1], b,
                    image_layout="tokens")
            else:
                inner = lambda xi, si, **kw: model.apply(
                    {"params": params}, xi, si, image_layout="tokens", **kw)
            den = Denoiser(inner, sigma_data=0.5)
            out = jax.lax.map(
                lambda x: sampling.sample_dpmpp_2m(den, x, sigmas), xs)
            return layout.from_tokens(out, (4, 4), 3)
        return sample

    results = {}
    for name, condcached in (("plain", False), ("condcache", True)):
        fn = make_sample(condcached)

        def run():
            out = fn(params, init_x, sigmas)
            return float(jnp.sum(out[:, :, 0, 0, 0]))

        run(); run()
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        dt = sorted(times)[args.iters // 2] / args.reps
        results[name] = b / dt
        print(f"{name}: {b / dt:.1f} samples/sec ({dt / steps * 1e3:.3f} ms/step)")

    print(f"condcache speedup: "
          f"{results['condcache'] / results['plain'] - 1:+.1%}")


if __name__ == "__main__":
    main()

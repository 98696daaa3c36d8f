"""Sweep the fused GEGLU FFN token-block size for the TRAINING fwd+bwd at
flagship shapes. Slope-timed (see PERFORMANCE.md's measurement lesson).

Usage: python scripts/bench_ffn_bwd.py [--shape l0|l1|mid]
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

from k_diffusion_tpu.ops.pallas import fused_geglu_ffn


def time_block(shape, block, lens=(8, 32)):
    b, t, d, d_ff = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, t, d), jnp.bfloat16) * 0.3
    scale = jnp.ones((b, d), jnp.float32)
    w_up = jax.random.normal(jax.random.fold_in(key, 1), (d, 2 * d_ff),
                             jnp.float32) * 0.05
    w_down = jax.random.normal(jax.random.fold_in(key, 2), (d_ff, d),
                               jnp.float32) * 0.05

    def loss(x, w_up, w_down):
        return jnp.sum(fused_geglu_ffn(x, scale, w_up, w_down,
                                       block=block) ** 2).astype(jnp.float32)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def make_scan(n):
        @jax.jit
        def scan(x, w_up, w_down):
            def body(carry, _):
                xc, acc = carry
                gx, gu, gd = grad(xc, w_up, w_down)
                return (xc + 1e-6 * gx.astype(xc.dtype),
                        acc + jnp.sum(gu).astype(jnp.float32)), None
            (xf, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)),
                                        None, length=n)
            return jnp.sum(xf).astype(jnp.float32) + acc
        return scan

    times = {}
    for n in lens:
        scan = make_scan(n)
        float(scan(x, w_up, w_down))
        float(scan(x, w_up, w_down))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(scan(x, w_up, w_down))
            ts.append(time.time() - t0)
        times[n] = sorted(ts)[1]
    return (times[lens[1]] - times[lens[0]]) / (lens[1] - lens[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="l0", choices=["l0", "l1", "mid"])
    ap.add_argument("--blocks", nargs="*", type=int, default=[512, 1024, 2048])
    args = ap.parse_args()
    shape = {"l0": (32, 4096, 128, 384), "l1": (32, 1024, 256, 768),
             "mid": (32, 256, 512, 1536)}[args.shape]
    print(f"shape {shape} (b, t, d, d_ff), grad fwd+bwd per call:")
    for blk in args.blocks:
        if shape[1] % blk:
            continue
        try:
            dt = time_block(shape, blk)
            print(f"  block {blk:5d}: {dt*1e3:7.3f} ms")
        except Exception as e:
            print(f"  block {blk:5d}: FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()

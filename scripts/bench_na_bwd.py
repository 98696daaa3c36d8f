"""Sweep (tile, gq, gc) for the packed NA TRAINING fwd+bwd at flagship
level shapes (b=32). Slope-timed over two scan lengths with a loop-carried
dependence (see PERFORMANCE.md's measurement lesson).

Usage: python scripts/bench_na_bwd.py [--shape l0|l1] [--combos t,gq,gc ...]
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

import importlib
na2d = importlib.import_module("k_diffusion_tpu.ops.pallas.na2d")


def time_combo(shape, tile, gq, gc, lens=(8, 32)):
    b, hw, c, heads = shape
    kk = 7
    na2d.TRAIN_GROUP_ROWS = gq
    na2d.GROUP_COLS = gc
    key = jax.random.PRNGKey(0)
    q, k, v = [jax.random.normal(jax.random.fold_in(key, i),
                                 (b, hw, hw, c), jnp.bfloat16) * 0.3
               for i in range(3)]

    def loss(q, k, v):
        return jnp.sum(na2d.na2d_packed(q, k, v, heads, kk, scale=1.0,
                                        tile=tile) ** 2).astype(jnp.float32)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def make_scan(n):
        @jax.jit
        def scan(q, k, v):
            def body(carry, _):
                qc, acc = carry
                gq_, gk_, gv_ = grad(qc, k, v)
                # loop-carried dependence so XLA cannot hoist
                return (qc + 1e-6 * gq_.astype(qc.dtype),
                        acc + jnp.sum(gk_).astype(jnp.float32)), None
            (qf, acc), _ = jax.lax.scan(body, (q, jnp.float32(0)),
                                        None, length=n)
            return jnp.sum(qf).astype(jnp.float32) + acc
        return scan

    times = {}
    for n in lens:
        scan = make_scan(n)
        float(scan(q, k, v))  # compile
        float(scan(q, k, v))  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(scan(q, k, v))
            ts.append(time.time() - t0)
        times[n] = sorted(ts)[1]
    dt = (times[lens[1]] - times[lens[0]]) / (lens[1] - lens[0])
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="l0", choices=["l0", "l1"])
    ap.add_argument("--combos", nargs="*",
                    default=["32,8,16", "32,8,8", "32,4,8", "16,8,16",
                             "32,16,16", "32,8,32"])
    args = ap.parse_args()
    shape = {"l0": (32, 64, 128, 2), "l1": (32, 32, 256, 4)}[args.shape]
    print(f"shape {shape} (b, hw, c, heads), k=7, grad fwd+bwd per call:")
    for combo in args.combos:
        t, gq, gc = map(int, combo.split(","))
        try:
            dt = time_combo(shape, t, gq, gc)
            print(f"  tile {t:3d} gq {gq:3d} gc {gc:3d}: {dt*1e3:7.3f} ms")
        except Exception as e:
            print(f"  tile {t:3d} gq {gq:3d} gc {gc:3d}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()

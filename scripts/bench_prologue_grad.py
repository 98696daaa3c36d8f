"""Sweep the fused qkv prologue spatial tile for the TRAINING fwd+bwd at
flagship shapes (batch 32). Slope-timed via a loop-carried scan (see
PERFORMANCE.md's measurement lesson: loop-invariant in-scan ops get hoisted).

Usage: python scripts/bench_prologue_grad.py [--batch 32]
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

from k_diffusion_tpu.ops.pallas import fused_qkv as fq
from k_diffusion_tpu.ops import make_axial_pos


def time_tile(b, hw, d, heads, tile, lens=(8, 32)):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, d), jnp.float32) * 0.3
    pos = make_axial_pos(hw, hw)
    norm_scale = jnp.ones((b, d), jnp.float32)
    w_qkv = jax.random.normal(jax.random.fold_in(key, 1), (d, 3 * d),
                              jnp.float32) * d ** -0.5
    scale = jnp.full((heads,), 10.0, jnp.float32)

    def loss(x, ns, w, s):
        q, k, v = fq.fused_qkv_prologue(x, pos, ns, w, s, heads, tile=tile)
        t = q.astype(jnp.float32) + (k * v).astype(jnp.float32)
        return jnp.sum(t ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3))

    def make_scan(n):
        @jax.jit
        def scan(x, ns, w, s):
            def body(carry, _):
                xc, acc = carry
                gx, gns, gw, gs = grad(xc, ns, w, s)
                return (xc + 1e-6 * gx.astype(xc.dtype),
                        acc + jnp.sum(gw).astype(jnp.float32)), None
            (xf, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)),
                                        None, length=n)
            return jnp.sum(xf).astype(jnp.float32) + acc
        return scan

    times = {}
    for n in lens:
        scan = make_scan(n)
        float(scan(x, norm_scale, w_qkv, scale))
        float(scan(x, norm_scale, w_qkv, scale))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(scan(x, norm_scale, w_qkv, scale))
            ts.append(time.time() - t0)
        times[n] = sorted(ts)[1]
    n0, n1 = lens
    return (times[n1] - times[n0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    for (hw, d, heads) in ((64, 128, 2), (32, 256, 4)):
        for tile in (16, 32):
            if hw % tile:
                continue
            t = time_tile(args.batch, hw, d, heads, tile)
            print(f"PROLOGUE-GRAD b={args.batch} hw={hw} d={d} tile={tile}: "
                  f"{t * 1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()

"""Flash-attention kernel vs XLA SDPA at small sequence lengths (TPU).

Decides MIN_PALLAS_SEQ / the training dispatch in ops/pallas/flash.py: the
XLA fallback's forward is competitive at tiny seqs, but its BACKWARD
materializes f32 (b, heads, s, s) logits + softmax recompute, which at the
flagship's 256-token global level costs ~0.4 ms/layer-step.

Usage: python scripts/bench_flash.py [--batch 32] [--heads 8] [--e 64]
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

from scripts.bench_na import timeit
from k_diffusion_tpu.ops.pallas import flash


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--e", type=int, default=64)
    ap.add_argument("--seqs", type=int, nargs="*", default=[256, 512])
    args = ap.parse_args()
    b, h, e = args.batch, args.heads, args.e

    for s in args.seqs:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, s, h, e), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.bfloat16)

        def pallas_fn(q, k, v):
            def pack(t):
                return jnp.moveaxis(t, 2, 1).reshape(b * h, s, e)
            return jnp.moveaxis(
                flash._flash_inner(pack(q), pack(k), pack(v), 1.0,
                                   min(256, s)).reshape(b, h, s, e), 1, 2)

        def sdpa_fn(q, k, v):
            return jax.nn.dot_product_attention(q, k, v, scale=1.0)

        def make_bwd(f):
            def g(q, k, v):
                def loss(q, k, v):
                    return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2) * 1e-6
                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)[0]
            return g

        print(f"--- seq {s} (b={b}, heads={h}, e={e})")
        for name, fn in [("flash fwd", pallas_fn), ("sdpa  fwd", sdpa_fn),
                         ("flash fwd+bwd", make_bwd(pallas_fn)),
                         ("sdpa  fwd+bwd", make_bwd(sdpa_fn))]:
            t = timeit(fn, q, k, v)
            print(f"  {name:14s} {t * 1e6:8.1f} us")


if __name__ == "__main__":
    main()

"""NA2D kernel microbenchmark on the real TPU: per-variant in-scan timing,
effective FLOP/s and HBM bandwidth vs the v5e roofline.

Usage: python scripts/bench_na.py [--hw 64] [--c 128] [--heads 2] [--k 7]
                                  [--batch 8] [--bwd]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N_SHORT, N_LONG = 50, 400


def _make_scan(fn, length):
    @jax.jit
    def scan_fn(*args):
        def body(carry, _):
            a, acc = carry
            out = fn(a, *args[1:])
            acc = acc + jnp.sum(out[..., 0].astype(jnp.float32)) * 1e-9
            # data dependence: the first operand changes (immeasurably)
            # every iteration so XLA cannot hoist the kernel out of the loop
            a = a + (acc * 1e-30).astype(a.dtype)
            return (a, acc), None
        (a, acc), _ = jax.lax.scan(
            body, (args[0], jnp.float32(0)), None, length=length)
        return acc + jnp.sum(a[..., 0].astype(jnp.float32)) * 1e-9
    return scan_fn


def timeit(fn, *args):
    """Slope timing: per-iter = (t_long - t_short) / (N_LONG - N_SHORT),
    cancelling the ~25 ms per-dispatch RPC overhead of the axon tunnel."""
    s_short = _make_scan(fn, N_SHORT)
    s_long = _make_scan(fn, N_LONG)
    def med(s):
        r = lambda: float(s(*args))
        r(); r()
        ts = []
        for _ in range(3):
            t0 = time.time(); r(); ts.append(time.time() - t0)
        return sorted(ts)[1]
    t_s, t_l = med(s_short), med(s_long)
    return (t_l - t_s) / (N_LONG - N_SHORT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--tile", type=int, default=16)
    args = ap.parse_args()

    import importlib
    na_mod = importlib.import_module("k_diffusion_tpu.ops.pallas.na2d")

    b, hw, c, heads, kk = args.batch, args.hw, args.c, args.heads, args.k
    e = c // heads
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    qp = jax.random.normal(ks[0], (b, hw, hw, c), jnp.bfloat16)
    kp = jax.random.normal(ks[1], (b, hw, hw, c), jnp.bfloat16)
    vp = jax.random.normal(ks[2], (b, hw, hw, c), jnp.bfloat16)
    q = qp.reshape(b, hw, hw, heads, e)
    k_ = kp.reshape(b, hw, hw, heads, e)
    v = vp.reshape(b, hw, hw, heads, e)

    n_tok = b * hw * hw
    # useful FLOPs (2 matmuls, k^2 keys/query, mul+add)
    flops = 4 * n_tok * kk * kk * c
    # minimal HBM traffic: q,k,v in + out, bf16
    bytes_min = 4 * n_tok * c * 2

    def report(name, dt, mult=1.0):
        f = flops * mult
        print(f"{name:28s} {dt*1e6:9.1f} us  {f/dt/1e12:6.2f} TF/s "
              f"({f/dt/197e12*100:5.1f}% MXU)  "
              f"{bytes_min*mult/dt/1e9:6.1f} GB/s min-traffic")

    if not args.bwd:
        dt = timeit(functools.partial(
            na_mod.na2d_packed, n_heads=heads, kernel_size=kk,
            tile=args.tile), qp, kp, vp)
        report("packed fwd", dt)
        dt = timeit(lambda a, b_, c_: na_mod.na2d(
            a, b_, c_, kk, tile=args.tile), q, k_, v)
        report("per-head fwd", dt)
        dt = timeit(lambda a, b_, c_: na_mod.na2d_reference(a, b_, c_, kk),
                    q, k_, v)
        report("XLA masked SDPA", dt, mult=1.0)
    else:
        def grad_packed(qp, kp, vp):
            f = lambda *a: jnp.sum(jnp.asarray(
                na_mod.na2d_packed(*a, n_heads=heads, kernel_size=kk,
                                   tile=args.tile), jnp.float32) ** 2)
            return jax.grad(f, argnums=0)(qp, kp, vp)
        dt = timeit(grad_packed, qp, kp, vp)
        report("packed fwd+bwd", dt, mult=3.5)

        def grad_perhead(q, k_, v):
            f = lambda *a: jnp.sum(jnp.asarray(
                na_mod.na2d(*a, kernel_size=kk, tile=args.tile),
                jnp.float32) ** 2)
            return jax.grad(f, argnums=0)(q, k_, v)
        dt = timeit(grad_perhead, q, k_, v)
        report("per-head fwd+bwd", dt, mult=3.5)


if __name__ == "__main__":
    main()

"""Eval-path prologue/FFN kernel tuning ladder (slope-timed in-scan).

Sweeps fused_qkv_prologue tile {16, 32} and fused_geglu_ffn token block
{512, 1024, 2048} at the flagship eval shapes (levels 0/1).

Usage: python scripts/bench_prologue_ffn.py
"""

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
            first = out[0] if isinstance(out, tuple) else out
            acc = acc + jnp.sum(first[..., 0].astype(jnp.float32)) * 1e-9
            a = a + (acc * 1e-30).astype(a.dtype)
            return (a, acc), None
        (a, acc), _ = jax.lax.scan(
            body, (args[0], jnp.float32(0)), None, length=length)
        return acc + jnp.sum(a[..., 0].astype(jnp.float32)) * 1e-9
    return scan_fn


def timeit(fn, *args):
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
    from k_diffusion_tpu.ops.pallas import fused_qkv as fq
    from k_diffusion_tpu.ops.pallas import fused_ffn as ff
    from k_diffusion_tpu.ops import make_axial_pos

    key = jax.random.PRNGKey(0)
    for (hw, d, heads) in ((64, 128, 2), (32, 256, 4)):
        b = 8
        x = jax.random.normal(key, (b, hw, hw, d), jnp.bfloat16)
        pos = make_axial_pos(hw, hw)
        norm_scale = jnp.ones((b, d), jnp.bfloat16)
        w_qkv = jax.random.normal(jax.random.fold_in(key, 1), (d, 3 * d),
                                  jnp.bfloat16) * 0.05
        scale = jnp.full((heads,), 10.0)
        for tile in (16, 32):
            if hw % tile:
                continue
            t = timeit(lambda a: fq.fused_qkv_prologue(
                a, pos, norm_scale, w_qkv, scale, heads, tile=tile), x)
            print(f"PROLOGUE hw={hw} d={d} tile={tile}: {t*1e6:.1f} us",
                  flush=True)

        d_ff = d * 3
        w_up = jax.random.normal(jax.random.fold_in(key, 2), (d, 2 * d_ff),
                                 jnp.bfloat16) * 0.05
        w_down = jax.random.normal(jax.random.fold_in(key, 3), (d_ff, d),
                                   jnp.bfloat16) * 0.05
        xt = x.reshape(b, hw * hw, d)
        for block in (512, 1024, 2048):
            if hw * hw < block:
                continue
            t = timeit(lambda a: ff.fused_geglu_ffn(
                a, norm_scale, w_up, w_down, block=block), xt)
            print(f"FFN hw={hw} d={d} block={block}: {t*1e6:.1f} us",
                  flush=True)


if __name__ == "__main__":
    main()

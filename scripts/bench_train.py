"""Train-step time breakdown on the flagship HDiT (TPU).

Times, each as a lax.scan over INNER iterations with a host-readback fence
(per-dispatch RPC through the tunnel is ~25 ms; see PERFORMANCE.md):
  - forward loss only
  - forward + backward (grads)
  - optimizer + EMA only (fixed grads)
  - full train step (fwd+bwd+clip+opt+EMA)

Usage: python scripts/bench_train.py [--batch 32] [--remat] [--fused]
                                     [--inner 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

INNER = 32  # steady-state: amortizes the ~25 ms/dispatch+readback tunnel RPC


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(run, label, reps=3, inner=INNER):
    run()  # compile
    run()  # warmup
    ts = []
    for _ in range(reps):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    dt = sorted(ts)[reps // 2] / inner
    print(f"{label:32s} {dt * 1e3:8.2f} ms/iter")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", type=str, default=None)
    ap.add_argument("--remat-levels", nargs="*", default=None,
                    type=lambda s: int(s) if s.isdigit() else s)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset: fwd,grad,opt,full")
    ap.add_argument("--inner", type=int, default=INNER)
    args = ap.parse_args()
    inner = args.inner

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod, training
    from k_diffusion_tpu.models import image_transformer_v2 as itv2

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16,
                                  checkpointing=args.remat,
                                  remat_policy=args.remat_policy,
                                  remat_levels=args.remat_levels)
    den_factory = config_mod.make_denoiser_wrapper(config)
    sample_density = config_mod.make_sample_density(config["model"])

    key = jax.random.PRNGKey(0)
    b = args.batch
    reals = jax.random.normal(key, (b, 256, 256, 3))
    sigma1 = jnp.ones([1])
    variables = jax.jit(model.init)(key, reals[:1], sigma1)
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M, batch {b}, remat={args.remat}")

    labels = itv2.param_group_labels(params)
    opt = training.make_optimizer(config, labels)
    opt_state = opt.init(params)

    def loss_fn(params, key):
        from k_diffusion_tpu import layout
        k_sig, k_noise, k_drop = jax.random.split(key, 3)
        sigma = sample_density(k_sig, (b,))
        def inner(x, sig, **kw):
            return model.apply({"params": params}, x, sig, train=True,
                               rngs={"dropout": k_drop}, **kw)
        # folded image layout for the loss math, as in training.py
        den = den_factory(layout.folded_model_fn(inner, reals.shape[-1]))
        reals_f = layout.fold_images(reals)
        noise = jax.random.normal(k_noise, reals_f.shape, reals_f.dtype)
        return jnp.mean(den.loss(reals_f, noise, sigma))

    only = set(args.only.split(",")) if args.only else None

    # 1. forward only
    if only is None or "fwd" in only:
        @jax.jit
        def scan_fwd(params, key):
            def body(acc, i):
                return acc + loss_fn(params, jax.random.fold_in(key, i)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
            return acc
        t_fwd = timeit(lambda: fence(scan_fwd(params, key)), "forward loss",
                       inner=inner)
    else:
        t_fwd = 0.0

    # 2. forward + backward
    if only is None or "grad" in only:
        @jax.jit
        def scan_grad(params, key):
            def body(acc, i):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, jax.random.fold_in(key, i))
                sq = sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(grads))
                return acc + loss + sq * 1e-20, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
            return acc
        t_grad = timeit(lambda: fence(scan_grad(params, key)),
                        "forward+backward", inner=inner)
    else:
        t_grad = 0.0

    ema0 = params

    def opt_tail(grads, opt_state, params, ema):
        """The train step's post-gradient tail (training.py step_fn)."""
        from k_diffusion_tpu.utils import ema_update
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(params, ema, 0.99)
        return params, opt_state, ema

    # 3. optimizer + EMA only (fixed grads)
    if only is None or "opt" in only:
        grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-6, params)

        @jax.jit
        def scan_opt(params, opt_state, grads):
            def body(carry, _):
                params, opt_state, ema = carry
                params, opt_state, ema = opt_tail(grads, opt_state, params, ema)
                return (params, opt_state, ema), None
            carry, _ = jax.lax.scan(body, (params, opt_state, ema0),
                                    None, length=inner)
            return carry[0]
        t_opt = timeit(lambda: fence(scan_opt(params, opt_state, grads)),
                       "clip+optimizer+EMA", inner=inner)
    else:
        t_opt = 0.0

    # 4. full step
    if only is None or "full" in only:
        @jax.jit
        def scan_full(params, opt_state, key):
            def body(carry, i):
                params, opt_state, ema = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, jax.random.fold_in(key, i))
                params, opt_state, ema = opt_tail(grads, opt_state, params, ema)
                return (params, opt_state, ema), loss
            carry, losses = jax.lax.scan(body, (params, opt_state, ema0),
                                         jnp.arange(inner))
            # one scalar so a single readback fences the scan
            return (jnp.sum(jax.tree_util.tree_leaves(carry[0])[0])
                    + losses.sum())
        def run_full():
            return float(scan_full(params, opt_state, key))
        t_full = timeit(run_full, "full train step", inner=inner)
        print(f"\nimgs/sec/chip (full step): {b / t_full:.1f}")

    if (only is None) and t_grad and t_fwd:
        print(f"backward-only: {(t_grad - t_fwd) * 1e3:.2f} ms")
        print(f"residual (full - grad - opt): "
              f"{(t_full - t_grad - t_opt) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()

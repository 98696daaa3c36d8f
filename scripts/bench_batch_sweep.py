"""Batch-size ladder for the two headline paths (same-session A/B).

The headline metrics are per-chip THROUGHPUT; batch is an internal choice.
This sweeps sampling batch {8,16,32} and train batch {32,48,64} with the
steady-state in-scan conventions of bench.py and prints one line each.

Usage: python scripts/bench_batch_sweep.py [--paths sample,train]
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


def _median_time(run, n_iters=5):
    run(); run()
    times = []
    for _ in range(n_iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return sorted(times)[n_iters // 2]


def bench_sampling(config, model, params, key, batch, reps, steps=50):
    from k_diffusion_tpu import layout, sampling
    from k_diffusion_tpu.denoiser import Denoiser

    mcfg = config["model"]
    init_x = jax.random.normal(key, (reps, batch, 256, 256 * 3)) * mcfg["sigma_max"]
    sigmas = sampling.get_sigmas_karras(steps, mcfg["sigma_min"], mcfg["sigma_max"])

    @jax.jit
    def sample(params, xs, sigmas):
        den = Denoiser(
            layout.folded_model_fn(
                lambda xi, si, **kw: model.apply({"params": params}, xi, si, **kw),
                3),
            sigma_data=mcfg["sigma_data"])
        out = jax.lax.map(lambda x: sampling.sample_dpmpp_2m(den, x, sigmas), xs)
        return layout.unfold_images(out, 3)

    def run_once():
        return float(jnp.sum(sample(params, init_x, sigmas)[:, :, 0, 0, 0]))

    dt = _median_time(run_once) / reps
    return batch / dt


def bench_train(config, batch, inner=16):
    import optax
    from k_diffusion_tpu import config as config_mod, training, layout
    from k_diffusion_tpu.models import image_transformer_v2 as itv2
    from k_diffusion_tpu.utils import ema_update

    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    den_factory = config_mod.make_denoiser_wrapper(config)
    sample_density = config_mod.make_sample_density(config["model"])

    key = jax.random.PRNGKey(0)
    reals = jax.random.normal(key, (batch, 256, 256, 3))
    variables = jax.jit(model.init)(key, reals[:1], jnp.ones([1]))
    params = variables["params"]
    opt = training.make_optimizer(config, itv2.param_group_labels(params))
    opt_state = opt.init(params)

    def loss_fn(params, key):
        k_sig, k_noise, k_drop = jax.random.split(key, 3)
        sigma = sample_density(k_sig, (batch,))
        den = den_factory(layout.folded_model_fn(
            lambda x, s, **kw: model.apply({"params": params}, x, s,
                                           train=True,
                                           rngs={"dropout": k_drop}, **kw), 3))
        reals_f = layout.fold_images(reals)
        noise = jax.random.normal(k_noise, reals_f.shape, reals_f.dtype)
        return jnp.mean(den.loss(reals_f, noise, sigma))

    @jax.jit
    def scan_steps(params, opt_state, key):
        def body(carry, i):
            params, opt_state, ema = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, jax.random.fold_in(key, i))
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = ema_update(params, ema, 0.99)
            return (params, opt_state, ema), loss
        carry, losses = jax.lax.scan(body, (params, opt_state, params),
                                     jnp.arange(inner))
        return jnp.sum(jax.tree_util.tree_leaves(carry[0])[0]) + losses.sum()

    def run_once():
        return float(scan_steps(params, opt_state, key))

    dt = _median_time(run_once, n_iters=3) / inner
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=str, default="sample,train")
    args = ap.parse_args()

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod

    config = config_mod.load_config(__graft_entry__._flagship_config())
    paths = args.paths.split(",")

    if "sample" in paths:
        model = config_mod.make_model(config, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        params = jax.jit(model.init)(
            key, jax.random.normal(key, (1, 256, 256, 3)), jnp.ones([1]))["params"]
        for batch, reps in ((8, 8), (16, 4), (32, 2)):
            sps = bench_sampling(config, model, params, key, batch, reps)
            print(f"SAMPLE batch={batch}: {sps:.2f} samples/sec", flush=True)

    if "train" in paths:
        for batch in (32, 48, 64):
            ips = bench_train(config, batch)
            print(f"TRAIN batch={batch}: {ips:.1f} imgs/sec", flush=True)


if __name__ == "__main__":
    main()

"""A/B the sampler carry layout: folded (b, h, w*c) vs token
(b, h/ph, w/pw, ph*pw*c). With a token carry both patch boundaries inside
the 50-step scan are plain matmuls — the pixel gather/scatter happens once
outside the loop (layout.to_tokens / from_tokens).

Usage: python scripts/bench_token_layout.py [--train]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod, layout, sampling
    from k_diffusion_tpu.denoiser import Denoiser

    config = config_mod.load_config(__graft_entry__._flagship_config())
    mcfg = config["model"]
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jax.random.normal(key, (1, 256, 256, 3)), jnp.ones([1]))["params"]
    batch, steps, reps = 8, 50, 8
    sigmas = sampling.get_sigmas_karras(steps, mcfg["sigma_min"], mcfg["sigma_max"])

    if not args.train:
        # folded baseline
        init_f = jax.random.normal(key, (reps, batch, 256, 256 * 3)) * mcfg["sigma_max"]

        @jax.jit
        def sample_folded(params, xs, sigmas):
            den = Denoiser(
                layout.folded_model_fn(
                    lambda xi, si, **kw: model.apply({"params": params}, xi, si, **kw), 3),
                sigma_data=mcfg["sigma_data"])
            out = jax.lax.map(lambda x: sampling.sample_dpmpp_2m(den, x, sigmas), xs)
            return layout.unfold_images(out, 3)

        def run_f():
            return float(jnp.sum(sample_folded(params, init_f, sigmas)[:, :, 0, 0, 0]))

        dt = _median_time(run_f) / reps
        print(f"FOLDED : {batch/dt:.2f} samples/sec ({dt/steps*1e3:.3f} ms/step)", flush=True)

        # token layout
        init_t = jax.random.normal(key, (reps, batch, 64, 64, 48)) * mcfg["sigma_max"]

        @jax.jit
        def sample_tokens(params, xs, sigmas):
            den = Denoiser(
                lambda xi, si, **kw: model.apply(
                    {"params": params}, xi, si, image_layout="tokens", **kw),
                sigma_data=mcfg["sigma_data"])
            out = jax.lax.map(lambda x: sampling.sample_dpmpp_2m(den, x, sigmas), xs)
            return layout.from_tokens(out, (4, 4), 3)

        def run_t():
            return float(jnp.sum(sample_tokens(params, init_t, sigmas)[:, :, 0, 0, 0]))

        dt = _median_time(run_t) / reps
        print(f"TOKENS : {batch/dt:.2f} samples/sec ({dt/steps*1e3:.3f} ms/step)", flush=True)
        return

    # --- train A/B: folded loss vs token-layout loss ---
    import optax
    from k_diffusion_tpu import training
    from k_diffusion_tpu.models import image_transformer_v2 as itv2
    from k_diffusion_tpu.utils import ema_update

    den_factory = config_mod.make_denoiser_wrapper(config)
    sample_density = config_mod.make_sample_density(mcfg)
    b, inner = 32, 32
    reals = jax.random.normal(key, (b, 256, 256, 3))
    opt = training.make_optimizer(config, itv2.param_group_labels(params))
    opt_state = opt.init(params)

    def make_scan(token_mode):
        def loss_fn(params, key):
            k_sig, k_noise, k_drop = jax.random.split(key, 3)
            sigma = sample_density(k_sig, (b,))
            if token_mode:
                den = den_factory(
                    lambda x, s, **kw: model.apply(
                        {"params": params}, x, s, train=True,
                        image_layout="tokens", rngs={"dropout": k_drop}, **kw))
                reals_l = layout.to_tokens(reals, (4, 4))
            else:
                den = den_factory(layout.folded_model_fn(
                    lambda x, s, **kw: model.apply({"params": params}, x, s,
                                                   train=True,
                                                   rngs={"dropout": k_drop}, **kw), 3))
                reals_l = layout.fold_images(reals)
            noise = jax.random.normal(k_noise, reals_l.shape, reals_l.dtype)
            return jnp.mean(den.loss(reals_l, noise, sigma))

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
        return scan_steps

    for token_mode in (False, True):
        scan = make_scan(token_mode)

        def run():
            return float(scan(params, opt_state, key))

        dt = _median_time(run, n_iters=3) / inner
        tag = "TOKENS" if token_mode else "FOLDED"
        print(f"TRAIN {tag}: {b/dt:.1f} imgs/sec ({dt*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

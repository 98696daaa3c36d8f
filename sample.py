#!/usr/bin/env python3
"""Samples from k-diffusion-tpu models (reference sample.py)."""

import argparse
import math
import os
from pathlib import Path

import jax

if os.environ.get("KDT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["KDT_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

import k_diffusion_tpu as K


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--batch-size", type=int, default=64, help="the batch size")
    p.add_argument("--checkpoint", type=Path, required=True,
                   help="the (safetensors inference) checkpoint to use")
    p.add_argument("--config", type=Path, help="the model config")
    p.add_argument("-n", type=int, default=64,
                   help="the number of images to sample")
    p.add_argument("--prefix", type=str, default="out", help="the output prefix")
    p.add_argument("--sampler", type=str, default="lms",
                   help="the sampler (lms like the reference, or dpmpp_2m, "
                        "dpmpp_2m_sde, euler, heun, ...)")
    p.add_argument("--steps", type=int, default=50,
                   help="the number of denoising steps")
    p.add_argument("--seed", type=int, default=0, help="the random seed")
    args = p.parse_args()

    config = K.config.load_config(args.config if args.config else args.checkpoint)
    model_config = config["model"]
    assert len(model_config["input_size"]) == 2 \
        and model_config["input_size"][0] == model_config["input_size"][1]
    size = model_config["input_size"]

    model = K.config.make_model(config, dtype=jnp.bfloat16)
    params, _ = K.checkpoint.load_inference(args.checkpoint)
    print("Parameters:", f"{K.utils.n_params(params):,}")
    channels = model_config["input_channels"]
    # fast sampler carry layouts (k_diffusion_tpu/layout.py): ITv2 uses the
    # token layout (patch boundaries become matmuls, zero relayout in the
    # scan); other families use the folded (b, h, w*c) layout. The model
    # computes the identical function on either carry; the folded layout is
    # also seed-for-seed identical to NHWC (its noise draw is a flat
    # reshape), while the token layout draws initial noise at token shape —
    # a different permutation of the threefry bits, so samples for a given
    # seed differ from the NHWC path (the distribution is unchanged).
    token_patch = (tuple(model_config["patch_size"])
                   if model_config["type"] == "image_transformer_v2" else None)
    if token_patch:
        model_fn = lambda x, s, **kw: model.apply(
            {"params": params}, x, s, image_layout="tokens", **kw)
    else:
        model_fn = K.layout.folded_model_fn(
            lambda x, s, **kw: model.apply({"params": params}, x, s, **kw),
            channels)
    denoiser = K.Denoiser(model_fn, sigma_data=model_config["sigma_data"])

    sigma_min, sigma_max = model_config["sigma_min"], model_config["sigma_max"]
    sigmas = K.sampling.get_sigmas_karras(args.steps, sigma_min, sigma_max, rho=7.0)

    print("Sampling...")
    key = jax.random.PRNGKey(args.seed)
    num_classes = config["dataset"].get("num_classes", 0)

    # samplers that evaluate the model ONLY at schedule sigmas (no churn,
    # no mid-interval stages) are eligible for the precomputed-cond fast
    # path (K.condcache): mapping network + all AdaRMSNorm scale
    # projections hoisted out of the sampling scan, bit-identical
    # (tests/test_condcache.py)
    # heun's second stage evaluates at sigmas[i+1] — a schedule point, and
    # the terminal sigma=0 eval is select-discarded in both paths
    schedule_point_samplers = {"lms", "euler", "euler_ancestral", "heun",
                               "dpmpp_2m", "dpmpp_2m_sde", "dpmpp_3m_sde"}
    use_condcache = (token_patch is not None
                     and args.sampler in schedule_point_samplers)

    def sample_fn(n):
        nonlocal key
        key, k_noise, k_cls, k_samp = jax.random.split(key, 4)
        if token_patch:
            ph, pw = token_patch
            noise_shape = [args.batch_size, size[0] // ph, size[1] // pw,
                           ph * pw * channels]
        else:
            noise_shape = [args.batch_size, size[0], size[1] * channels]
        x = jax.random.normal(k_noise, noise_shape) * sigma_max
        extra = {}
        if num_classes:
            # class-conditional model: sample random classes (the reference
            # sample.py predates class-conditional checkpoints)
            extra["class_cond"] = jax.random.randint(
                k_cls, [args.batch_size], 0, num_classes)
        if use_condcache:
            # class_cond is baked into the cond table, so the sampler gets
            # no extra_args
            inner = K.condcache.scheduled_inner_fn(
                model, {"params": params}, sigmas[:-1], args.batch_size,
                image_layout="tokens", class_cond=extra.get("class_cond"))
            den = K.Denoiser(inner, sigma_data=model_config["sigma_data"])
            x_0 = K.sampling.call_sampler(
                args.sampler, den, x, sigmas, extra_args={}, key=k_samp)
        else:
            x_0 = K.sampling.call_sampler(
                args.sampler, denoiser, x, sigmas, extra_args=extra,
                key=k_samp)
        if token_patch:
            return K.layout.from_tokens(x_0[:n], token_patch, channels)
        return K.layout.unfold_images(x_0[:n], channels)

    x_0 = K.evaluation.compute_features(sample_fn, lambda x: x, args.n,
                                        args.batch_size)
    for i, out in enumerate(x_0):
        filename = f"{args.prefix}_{i:05}.png"
        K.utils.to_pil_image(out).save(filename)
    print(f"Wrote {len(x_0)} images to {args.prefix}_*.png")


if __name__ == "__main__":
    main()

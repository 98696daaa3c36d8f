#!/usr/bin/env python3
"""CLIP guided sampling from k-diffusion-tpu models
(reference sample_clip_guided.py).

The guidance gradient is computed with jax.grad through the CLIP image
encoder (a flax CLIP vision tower via transformers), fused into the jitted
sampling step — no autograd context dance. Requires CLIP weights in the
local transformers cache (no network egress in this environment).
"""

import argparse
import os
from pathlib import Path

import jax

if os.environ.get("KDT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["KDT_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "jax_comp_cache"))

import jax.numpy as jnp

import k_diffusion_tpu as K
from k_diffusion_tpu.guidance import (make_cond_model_fn,
                                      make_static_thresh_model_fn,
                                      spherical_dist_loss)


def load_clip(name):
    """Loads a flax CLIP model from the local transformers cache."""
    from transformers import CLIPProcessor, FlaxCLIPModel
    model = FlaxCLIPModel.from_pretrained(name, local_files_only=True)
    processor = CLIPProcessor.from_pretrained(name, local_files_only=True)
    return model, processor


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("prompt", type=str, help="the prompt to use")
    p.add_argument("--batch-size", type=int, default=16, help="the batch size")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="the checkpoint to use")
    p.add_argument("--clip-guidance-scale", "-cgs", type=float, default=500.0,
                   help="the CLIP guidance scale")
    p.add_argument("--clip-model", type=str, default="openai/clip-vit-base-patch16",
                   help="the CLIP model to use (transformers id)")
    p.add_argument("--config", type=str, help="the model config")
    p.add_argument("-n", type=int, default=64,
                   help="the number of images to sample")
    p.add_argument("--prefix", type=str, default="out", help="the output prefix")
    p.add_argument("--steps", type=int, default=100,
                   help="the number of denoising steps")
    p.add_argument("--seed", type=int, default=0, help="the random seed")
    args = p.parse_args()

    config = K.config.load_config(args.config if args.config else args.checkpoint)
    model_config = config["model"]
    size = model_config["input_size"]

    model = K.config.make_model(config, dtype=jnp.bfloat16)
    params, _ = K.checkpoint.load_inference(args.checkpoint)
    print("Parameters:", f"{K.utils.n_params(params):,}")
    denoiser = K.Denoiser(
        lambda x, s, **kw: model.apply({"params": params}, x, s, **kw),
        sigma_data=model_config["sigma_data"])

    clip_model, processor = load_clip(args.clip_model)
    clip_size = clip_model.config.vision_config.image_size
    clip_mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    clip_std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    tokens = processor(text=[args.prompt], return_tensors="np", padding=True)
    text_embed = clip_model.get_text_features(**{k: jnp.asarray(v) for k, v in tokens.items()})
    text_embed = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)

    def get_image_embed(x):
        # x NHWC in [0, 1]
        x = jax.image.resize(x, (x.shape[0], clip_size, clip_size, x.shape[-1]),
                             method="cubic")
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        x = (x - clip_mean) / clip_std
        emb = clip_model.get_image_features(jnp.moveaxis(x, -1, 1))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def cond_fn(x, sigma, denoised, **kwargs):
        def loss_fn(xi):
            den = denoiser(xi, sigma, **kwargs)
            image_embed = get_image_embed((den + 1) / 2)
            return jnp.sum(spherical_dist_loss(image_embed, text_embed)) \
                * args.clip_guidance_scale
        return -jax.grad(loss_fn)(x)

    model_fn = make_cond_model_fn(denoiser, cond_fn)
    model_fn = make_static_thresh_model_fn(model_fn)

    sigma_min, sigma_max = model_config["sigma_min"], model_config["sigma_max"]
    sigmas = K.sampling.get_sigmas_karras(args.steps, sigma_min, sigma_max, rho=7.0)
    print("Sampling...")
    key = jax.random.PRNGKey(args.seed)

    num_classes = config["dataset"].get("num_classes", 0)

    def sample_fn(n):
        nonlocal key
        key, k_noise, k_cls, k_samp = jax.random.split(key, 4)
        x = jax.random.normal(
            k_noise, [args.batch_size, size[0], size[1],
                      model_config["input_channels"]]) * float(sigmas[0])
        extra = {}
        if num_classes:
            # class-conditional model: random classes (same convention as
            # sample.py; the reference CLI predates class-conditional ckpts)
            extra["class_cond"] = jax.random.randint(
                k_cls, [args.batch_size], 0, num_classes)
        x_0 = K.sampling.sample_dpmpp_2s_ancestral(
            model_fn, x, sigmas, eta=1.0, extra_args=extra, key=k_samp)
        return x_0[:n]

    x_0 = K.evaluation.compute_features(sample_fn, lambda x: x, args.n,
                                        args.batch_size)
    for i, out in enumerate(x_0):
        K.utils.to_pil_image(out).save(f"{args.prefix}_{i:05}.png")
    print(f"Wrote {len(x_0)} images")


if __name__ == "__main__":
    main()

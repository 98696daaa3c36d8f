#!/usr/bin/env python3
"""Trains Karras et al. (2022) diffusion models on TPU.

TPU-native counterpart of the reference train.py (525 LoC): one jitted
data-parallel train step over a device mesh (gradient all-reduce inserted by
XLA from the batch sharding) replaces Accelerate/DDP; augmentation runs
batched on-device; checkpoints are flax-msgpack pytrees with a
``{name}_state.json`` sidecar; demo grids use DPM++(2M) SDE exactly like the
reference (train.py:346-369).
"""

import argparse
import json
import math
import time
from functools import partial
from pathlib import Path

import os

import jax

# jax may be pre-imported by a site hook, so env-var platform selection can
# be too late; honor KDT_PLATFORM via config update instead.
if os.environ.get("KDT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["KDT_PLATFORM"])
    if os.environ.get("KDT_NUM_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices", int(os.environ["KDT_NUM_CPU_DEVICES"]))
jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import k_diffusion_tpu as K
from k_diffusion_tpu import (augmentation, checkpoint, config as config_mod,
                             data, gns as gns_mod, layout, parallel, sampling,
                             training)


class StarvationMonitor:
    """Warns when the input pipeline can't feed the device (the measured
    loader rate is below the device consumption rate).  The reference relies
    on torch DataLoader workers and never checks (reference train.py:238-239);
    at TPU rates (see PERFORMANCE.md 'Input pipeline') host JPEG decode is a
    real bottleneck, so starvation is made loud instead of silent.

    ``record(wait_s, step_s)`` per step; ``check()`` at the print cadence
    returns the warning string (and resets the window) when more than
    ``threshold`` of wall time was spent waiting on the loader."""

    def __init__(self, threshold=0.25, min_steps=10):
        self.threshold = threshold
        self.min_steps = min_steps
        self.wait_s = 0.0
        self.step_s = 0.0
        self.n = 0

    def record(self, wait_s, step_s):
        self.wait_s += max(0.0, wait_s)
        self.step_s += max(0.0, step_s)
        self.n += 1

    def check(self):
        if self.n < self.min_steps:
            return None
        total = self.wait_s + self.step_s
        frac = self.wait_s / total if total > 0 else 0.0
        wait_s, step_s, n = self.wait_s, self.step_s, self.n
        self.wait_s = self.step_s = 0.0
        self.n = 0
        if frac <= self.threshold:
            return None
        loader_rate = n / total if total else 0.0
        device_rate = n / step_s if step_s else float("inf")
        return (f"WARNING: input pipeline is starving the device: "
                f"{frac:.0%} of wall time spent waiting on the data loader "
                f"({loader_rate:.2f} batches/s fed vs {device_rate:.2f} "
                f"batches/s consumed). Raise --num-workers, use the native "
                f"loader (make -C native), or add host cores.")


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--batch-size", type=int, default=64,
                   help="the global batch size")
    p.add_argument("--checkpointing", action="store_true",
                   help="enable gradient checkpointing")
    p.add_argument("--checkpoint-format", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="orbax = sharded per-host async save (pod scale); "
                        "msgpack = single-file single-host (reference-style)")
    p.add_argument("--remat-levels", type=lambda s: int(s) if s.isdigit() else s,
                   nargs="*", default=None,
                   help="hourglass levels to remat under --checkpointing "
                        "(default all; e.g. '0' remats only the memory-"
                        "heavy high-res level, 'down_0' only its down "
                        "stack, cutting the remat tax)")
    p.add_argument("--config", type=str, required=True,
                   help="the configuration file")
    p.add_argument("--demo-every", type=int, default=500,
                   help="save a demo grid every this many steps")
    p.add_argument("--end-step", type=int, default=None,
                   help="the step to end training at")
    p.add_argument("--evaluate-every", type=int, default=10000,
                   help="evaluate every this many steps")
    p.add_argument("--evaluate-n", type=int, default=2000,
                   help="the number of samples to draw to evaluate")
    p.add_argument("--evaluate-only", action="store_true",
                   help="evaluate instead of training")
    p.add_argument("--evaluate-with", type=str, default="inception",
                   choices=["inception", "clip", "dinov2"],
                   help="the feature extractor to use for evaluation")
    p.add_argument("--clip-model", type=str, default="openai/clip-vit-base-patch16",
                   help="the CLIP model to use to evaluate")
    p.add_argument("--dinov2-model", type=str, default="facebook/dinov2-large",
                   help="the DINOv2 model to use to evaluate")
    p.add_argument("--gns", action="store_true",
                   help="measure the gradient noise scale (disables stratified sampling)")
    p.add_argument("--grad-accum-steps", type=int, default=1,
                   help="the number of gradient accumulation steps")
    p.add_argument("--lr", type=float, help="the learning rate")
    p.add_argument("--mixed-precision", type=str, default="bf16",
                   choices=["no", "bf16"], help="the compute precision")
    p.add_argument("--name", type=str, default="model",
                   help="the name of the run")
    p.add_argument("--num-workers", type=int, default=8,
                   help="the number of data loader workers")
    p.add_argument("--reset-ema", action="store_true", help="reset the EMA")
    p.add_argument("--resume", type=str, help="the checkpoint to resume from")
    p.add_argument("--resume-inference", type=str,
                   help="the inference checkpoint to resume from")
    p.add_argument("--sample-n", type=int, default=64,
                   help="the number of images to sample for demo grids")
    p.add_argument("--save-every", type=int, default=10000,
                   help="save every this many steps")
    p.add_argument("--profile-dir", type=str,
                   help="capture a jax.profiler trace of steps 10-15 to this dir")
    p.add_argument("--seed", type=int, help="the random seed")
    p.add_argument("--wandb-entity", type=str, help="the wandb entity name")
    p.add_argument("--wandb-group", type=str, help="the wandb group name")
    p.add_argument("--wandb-project", type=str,
                   help="the wandb project name (specify this to enable wandb)")
    args = p.parse_args()

    parallel.initialize_distributed()
    mesh = parallel.make_mesh()
    n_devices = len(jax.devices())
    world = parallel.process_count()
    rank = parallel.process_index()
    is_main = parallel.is_main_process()
    if is_main:
        print(f"World: {world} process(es), {n_devices} device(s)")

    config = config_mod.load_config(args.config)
    model_config = config["model"]
    dataset_config = config["dataset"]
    opt_config = config["optimizer"]
    sched_config = config["lr_sched"]
    ema_sched_config = config["ema_sched"]
    if args.lr is not None:
        opt_config["lr"] = args.lr

    seed = args.seed if args.seed is not None else 42
    key = jax.random.PRNGKey(seed)
    size = model_config["input_size"]
    size = size if isinstance(size, (list, tuple)) else [size, size]
    num_classes = dataset_config["num_classes"]
    cond_dropout_rate = dataset_config["cond_dropout_rate"]
    sigma_min, sigma_max = model_config["sigma_min"], model_config["sigma_max"]
    is_image_v1 = model_config["type"] == "image_v1"

    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    model = config_mod.make_model(config, dtype=dtype,
                                  checkpointing=args.checkpointing,
                                  remat_levels=args.remat_levels)

    # wandb (optional; rank 0 only, reference train.py:124)
    use_wandb = bool(args.wandb_project) and is_main
    if use_wandb:
        try:
            import wandb
            wandb.init(project=args.wandb_project, entity=args.wandb_entity,
                       group=args.wandb_group, config=config)
        except ImportError:
            print("wandb not available; logging disabled")
            use_wandb = False

    # dataset + loader: each host loads only its 1/world slice of the global
    # batch (the DistributedSampler analog, reference train.py:233-239);
    # local_batch_to_global assembles the sharded global arrays below.
    if args.batch_size % world:
        raise ValueError(f"--batch-size {args.batch_size} not divisible by "
                         f"the process count {world}")
    local_batch_size = args.batch_size // world
    train_set = data.make_dataset(dataset_config, size[0],
                                  config_dir=Path(args.config).parent)
    if is_main:
        try:
            print(f"Number of items in dataset: {len(train_set):,}")
        except TypeError:
            pass
    train_dl = data.DataLoader(train_set, local_batch_size * args.grad_accum_steps,
                               seed=seed, num_workers=args.num_workers,
                               process_index=rank, process_count=world)

    # on-device augmentation
    augment_prob = model_config["augment_prob"]
    aug_pipe = augmentation.KarrasAugmentationPipeline(
        augment_prob, disable_all=augment_prob == 0)
    aug_batch = jax.jit(jax.vmap(aug_pipe))

    # model apply / param taxonomy per model family
    if is_image_v1:
        from k_diffusion_tpu.models import image_v1 as model_mod
        labels_fn = model_mod.param_group_labels

        def apply_fn(params, x, sig, dropout_key, aug_cond=None, **kwargs):
            inner = augmentation.augment_wrapper_model_fn(
                lambda xi, si, **kw: model.apply(
                    {"params": params}, xi, si, train=True,
                    rngs={"dropout": dropout_key}, **kw))
            return inner(x, sig, aug_cond=aug_cond, **kwargs)
    else:
        from k_diffusion_tpu.models import image_transformer_v2 as model_mod
        labels_fn = model_mod.param_group_labels
        apply_fn = None

    # init params / optimizer / state
    example = {
        "reals": jnp.zeros([1, size[0], size[1], model_config["input_channels"]]),
    }
    init_kwargs = {}
    if num_classes and not is_image_v1:
        example["class_cond"] = jnp.zeros([1], jnp.int32)
    if is_image_v1:
        init_kwargs["mapping_cond"] = jnp.zeros(
            [1, model_config["mapping_cond_dim"] + 9]) \
            if model_config["augment_wrapper"] else None
        if init_kwargs["mapping_cond"] is None:
            del init_kwargs["mapping_cond"]
    variables = jax.jit(partial(model.init, train=False), static_argnames=())(
        key, example["reals"], jnp.ones([1]),
        **({"class_cond": example["class_cond"]} if "class_cond" in example else {}),
        **init_kwargs)
    params = variables["params"]
    if is_main:
        print(f"Parameters: {K.utils.n_params(params):,}")

    # forward-pass FLOPs from XLA cost analysis (reference train.py:243-251)
    try:
        from k_diffusion_tpu.models import flops as flops_mod
        gflops = flops_mod.xla_forward_flops(
            lambda *a, **kw: model.apply({"params": params}, *a, **kw),
            example["reals"], jnp.ones([1]),
            **({"class_cond": example["class_cond"]} if "class_cond" in example else {}),
            **init_kwargs)
        msg = f"Forward pass GFLOPs (XLA): {gflops / 1e9:,.3f}"
        if model_config["type"] == "image_transformer_v2":
            ana = flops_mod.analytic_transformer_flops(config, batch=1)
            msg += f"; analytic (reference convention): {ana / 1e9:,.3f}"
        if is_main:
            print(msg, flush=True)
    except Exception as e:
        if is_main:
            print(f"(FLOP analysis unavailable: {e})")

    labels = labels_fn(params)
    opt = training.make_optimizer(config, labels)
    ema_sched = config_mod.make_ema_sched(config)
    sample_density = config_mod.make_sample_density(model_config)
    denoiser_factory = config_mod.make_denoiser_wrapper(config)

    state = training.TrainState(
        step=jnp.int32(0), params=params, opt_state=opt.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params))
    host = {"epoch": 0, "step": 0, "elapsed": 0.0, "ema_stats": {},
            "ema_sched": ema_sched.state_dict(), "gns_stats": None,
            "config": config}
    gns_stats = gns_mod.GradientNoiseScale() if args.gns else None
    # GNS small-batch signal: per-device dp-shard grads when dp > 1 (the
    # reference's per-rank DDP hook analog), else accumulation microbatches.
    dp_size = mesh.shape[parallel.DATA_AXIS]
    gns_use_dp = args.gns and dp_size > 1
    if args.gns and not gns_use_dp and args.grad_accum_steps < 2:
        raise ValueError(
            "--gns needs a small batch distinct from the large one: run "
            "data-parallel on > 1 device or set --grad-accum-steps > 1")
    gns_n_small = (args.batch_size // dp_size) if gns_use_dp else args.batch_size

    # resume
    ckpt_path = args.resume or checkpoint.latest_checkpoint(args.name)
    if ckpt_path and Path(ckpt_path).exists():
        if is_main:
            print(f"Resuming from {ckpt_path}...")
        state, host = checkpoint.load_checkpoint(ckpt_path, state)
        host["config"] = config  # current run's config wins (as in reference)
        ema_sched.load_state_dict(host["ema_sched"])
        # restore the data order: each epoch's shuffle is derived from
        # DataLoader.epoch, which would otherwise restart at 0 and replay
        # epoch-0 batches after a resume (reference train.py:269-293 restores
        # the sampler epoch the same way)
        train_dl.epoch = host["epoch"]
        # ... and the position within it, so the resumed run consumes exactly
        # the batches the interrupted run would have (bit-identical resume)
        train_dl.start_batch = host.get("batch_in_epoch", 0)
        if args.gns and host.get("gns_stats"):
            gns_stats.load_state_dict(host["gns_stats"])
    if args.reset_ema:
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.copy, state.ema_params))
        ema_sched = config_mod.make_ema_sched(config)
    if args.resume_inference:
        if is_main:
            print(f"Loading {args.resume_inference}...")
        inf_params, _ = checkpoint.load_inference(args.resume_inference)
        inf_params = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(b, a.dtype), state.params, inf_params)
        state = state.replace(
            params=inf_params,
            ema_params=jax.tree_util.tree_map(jnp.copy, inf_params))

    state = parallel.replicate(state, mesh)

    # dp > 1 always takes the shard_map path: inside it every array is the
    # per-device shard, which is what lets the Pallas attention kernels
    # (not GSPMD-partitionable) run under data parallelism on real meshes
    # ITv2 runs loss and samplers on the token layout (b, h/ph, w/pw,
    # ph*pw*c): patch boundaries inside the step/scan are plain matmuls,
    # the pixel gather happens once outside (layout.py)
    token_patch = (tuple(model_config["patch_size"])
                   if model_config["type"] == "image_transformer_v2" else None)
    train_step = training.make_train_step(
        model, denoiser_factory, sample_density, opt,
        num_classes=num_classes, cond_dropout_rate=cond_dropout_rate,
        stratified=not args.gns, compute_gns=args.gns, apply_fn=apply_fn,
        mesh=mesh if dp_size > 1 else None,
        data_axis=parallel.DATA_AXIS,
        watch_labels=labels if use_wandb else None,
        token_patch=token_patch)

    # demo sampling (reference train.py:331-369)
    def make_cfg_model_fn(den, cfg_scale=1.0):
        def cfg_model_fn(x, sigma, class_cond):
            x_in = jnp.concatenate([x, x])
            sigma_in = jnp.concatenate([sigma, sigma])
            class_uncond = jnp.full_like(class_cond, num_classes)
            class_in = jnp.concatenate([class_uncond, class_cond])
            out = den(x_in, sigma_in, class_cond=class_in)
            out_uncond, out_cond = jnp.split(out, 2)
            return out_uncond + (out_cond - out_uncond) * cfg_scale
        if cfg_scale != 1:
            return cfg_model_fn
        return den

    def ema_denoiser(ema_params, folded=False):
        if is_image_v1:
            inner = augmentation.augment_wrapper_model_fn(
                lambda xi, si, **kw: model.apply({"params": ema_params}, xi, si, **kw))
        else:
            inner = lambda xi, si, **kw: model.apply({"params": ema_params}, xi, si, **kw)
        if folded:
            if token_patch:
                # token-layout sampler carry (layout.py): patch boundaries
                # are matmuls, zero relayout inside the sampler scan
                base = inner
                inner = lambda xi, si, **kw: base(
                    xi, si, image_layout="tokens", **kw)
            else:
                # folded (b, h, w*c) sampler layout (layout.py):
                # bitwise-identical samples, ~20% faster — the sampler
                # algebra runs lane-wide
                inner = layout.folded_model_fn(
                    inner, model_config["input_channels"])
        return denoiser_factory(inner)

    def sample_noise_shape(n):
        """Initial-noise shape for the fast sampler layout."""
        channels = model_config["input_channels"]
        if token_patch:
            ph, pw = token_patch
            return [n, size[0] // ph, size[1] // pw, ph * pw * channels]
        return [n, size[0], size[1] * channels]

    def samples_to_nhwc(x):
        channels = model_config["input_channels"]
        if token_patch:
            return layout.from_tokens(x, token_patch, channels)
        return layout.unfold_images(x, channels)

    def shard_sampler(run, n):
        """Wrap a batch-parallel ``run(x, class_cond) -> samples`` in
        shard_map over the data axis when dp divides the batch: inside it
        every array is the per-device shard, so sampling parallelizes over
        the mesh AND the Pallas kernels see local shapes (they are not
        GSPMD-partitionable). Replicated single-device execution otherwise."""
        if dp_size <= 1 or n % dp_size != 0:
            return run
        from jax import shard_map
        P = jax.sharding.PartitionSpec
        return shard_map(
            run, mesh=mesh, in_specs=(P(parallel.DATA_AXIS),
                                      P(parallel.DATA_AXIS)),
            out_specs=P(parallel.DATA_AXIS), check_vma=False,
            axis_names=frozenset({parallel.DATA_AXIS}))

    @jax.jit
    def demo_sample(ema_params, demo_key):
        den = make_cfg_model_fn(ema_denoiser(ema_params, folded=True))
        k_noise, k_cls = jax.random.split(demo_key)
        n = args.sample_n
        x = jax.random.normal(k_noise, sample_noise_shape(n)) * sigma_max
        sigmas = sampling.get_sigmas_karras(50, sigma_min, sigma_max, rho=7.0)
        class_cond = (jax.random.randint(k_cls, [n], 0, num_classes)
                      if num_classes else jnp.zeros([n], jnp.int32))

        def run(x, class_cond):
            extra = {"class_cond": class_cond} if num_classes else {}
            return sampling.sample_dpmpp_2m_sde(
                den, x, sigmas, extra_args=extra, eta=0.0, solver_type="heun")

        return samples_to_nhwc(shard_sampler(run, n)(x, class_cond))

    def demo(step):
        if is_main:
            print("Sampling...")
        demo_key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        # all hosts run the (collective) sampling; only rank 0 writes
        x_0 = jax.device_get(demo_sample(state.ema_params, demo_key))
        if not is_main:
            return
        grid = K.utils.make_grid(x_0, nrow=math.ceil(args.sample_n ** 0.5))
        filename = f"{args.name}_demo_{step:08}.png"
        K.utils.to_pil_image(grid).save(filename)
        print(f"Saved {filename}")
        if use_wandb:
            import wandb
            wandb.log({"demo_grid": wandb.Image(filename)}, step=step)

    # evaluation (FID/KID)
    evaluate_enabled = args.evaluate_every > 0 and args.evaluate_n > 0
    extractor = None
    if evaluate_enabled:
        from k_diffusion_tpu import evaluation
        try:
            kw = {}
            if args.evaluate_with == "clip":
                kw["model_name"] = args.clip_model
            elif args.evaluate_with == "dinov2":
                kw["model_name"] = args.dinov2_model
            extractor = evaluation.make_extractor(args.evaluate_with, **kw)
        except Exception as e:
            if is_main:
                # loud failure: print the full traceback so a typo in an
                # extractor path doesn't silently ship a run with no FID
                import traceback
                traceback.print_exc()
                print(f"Evaluation disabled (feature extractor unavailable: {e})",
                      flush=True)
            evaluate_enabled = False
    reals_features = None
    if evaluate_enabled:
        from k_diffusion_tpu import evaluation
        if is_main:
            print("Computing features for reals...")
        real_iter = iter(train_dl)

        def next_reals(n):
            batch = next(real_iter)
            return jnp.asarray(batch["image"][:n] * 2 - 1)

        reals_features = evaluation.compute_features(
            next_reals, extractor, args.evaluate_n, args.batch_size)

    metrics_log = K.utils.CSVLogger(
        f"{args.name}_metrics.csv", ["step", "time", "loss", "fid", "kid"]) \
        if is_main else None

    def evaluate(step):
        if not evaluate_enabled:
            return
        from k_diffusion_tpu import evaluation
        if is_main:
            print("Evaluating...")
        sigmas = sampling.get_sigmas_karras(50, sigma_min, sigma_max, rho=7.0)

        @partial(jax.jit, static_argnums=2)
        def sample_fn_jit(ema_params, k, n_static):
            den = make_cfg_model_fn(ema_denoiser(ema_params, folded=True))
            kx, kc = jax.random.split(k)
            x = jax.random.normal(kx, sample_noise_shape(n_static)) * sigma_max
            class_cond = (jax.random.randint(kc, [n_static], 0, num_classes)
                          if num_classes else jnp.zeros([n_static], jnp.int32))

            def run(x, class_cond):
                extra = {"class_cond": class_cond} if num_classes else {}
                return sampling.sample_dpmpp_2m_sde(
                    den, x, sigmas, extra_args=extra, eta=0.0,
                    solver_type="heun")

            return samples_to_nhwc(shard_sampler(run, n_static)(x, class_cond))

        counter = [0]

        def sample_fn(n):
            counter[0] += 1
            k = jax.random.fold_in(jax.random.PRNGKey(seed + 1), step * 1000 + counter[0])
            return sample_fn_jit(state.ema_params, k, args.batch_size)[:n]

        fakes_features = evaluation.compute_features(
            sample_fn, extractor, args.evaluate_n, args.batch_size)
        fid = evaluation.fid(fakes_features, reals_features)
        kid = evaluation.kid(fakes_features, reals_features)
        if not is_main:
            return
        print(f"FID: {float(fid):g}, KID: {float(kid):g}")
        metrics_log.write(step, host["elapsed"],
                          host["ema_stats"].get("loss", float("nan")),
                          float(fid), float(kid))
        if use_wandb:
            import wandb
            wandb.log({"FID": float(fid), "KID": float(kid)}, step=step)

    def save(step):
        host["step"] = step
        host["ema_sched"] = ema_sched.state_dict()
        host["gns_stats"] = gns_stats.state_dict() if gns_stats else None
        if args.checkpoint_format == "orbax":
            # all processes participate (each writes its own shards, async)
            filename = f"{args.name}_{step:08}.orbax"
            if is_main:
                print(f"Saving to {filename}...")
            checkpoint.save_checkpoint_sharded(filename, state, host)
            if is_main:
                # pointer update is deferred until the async save commits so
                # a crash mid-save never strands auto-resume (advisor r4)
                checkpoint.write_state_json_after_commit(args.name, filename)
            return
        if not is_main:
            return
        filename = f"{args.name}_{step:08}.ckpt"
        print(f"Saving to {filename}...")
        checkpoint.save_checkpoint(filename, state, host)
        checkpoint.write_state_json(args.name, filename)
        if use_wandb:
            import wandb
            wandb.save(filename)  # reference train.py:422-423

    if args.evaluate_only:
        if not evaluate_enabled:
            raise ValueError("--evaluate-only requested but evaluation is disabled")
        evaluate(host["step"])
        return

    # train loop (reference train.py:430-519)
    step = host["step"]
    epoch = host["epoch"]
    batch_in_epoch = host.get("batch_in_epoch", 0)
    losses_since_last_print = []
    gns_pending = []

    def drain_gns():
        for sqn_small, sqn_big in gns_pending:
            gns_stats.update(float(sqn_small), float(sqn_big),
                             gns_n_small, args.batch_size * accum)
        gns_pending.clear()
    accum = args.grad_accum_steps
    lr_sched = config_mod.make_lr_schedule(config)
    spec_batch = jax.sharding.PartitionSpec(None, parallel.DATA_AXIS)

    starvation = StarvationMonitor()
    t_body_end = None
    try:
        while True:
            for batch in train_dl:
                t0 = time.time()
                data_wait = t0 - t_body_end if t_body_end is not None else 0.0
                batch_in_epoch += 1
                host["batch_in_epoch"] = batch_in_epoch
                b = batch["image"].shape[0]
                if b != local_batch_size * accum:
                    continue
                # on-device augmentation of the host-local slice; per-host
                # keys must differ so noise decorrelates across processes
                aug_keys = jax.random.split(jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(seed + 2), step),
                    rank), b)
                aug_img, _, aug_cond = aug_batch(aug_keys, jnp.asarray(batch["image"]))
                dev_batch = {
                    "reals": aug_img.reshape(
                        accum, local_batch_size, *aug_img.shape[1:]),
                    "aug_cond": aug_cond.reshape(accum, local_batch_size, 9),
                }
                if num_classes and "class" in batch:
                    dev_batch["class_cond"] = jnp.asarray(batch["class"]).reshape(
                        accum, local_batch_size)
                dev_batch = parallel.local_batch_to_global(
                    dev_batch, mesh, spec=spec_batch)

                if args.profile_dir and step == 10:
                    jax.profiler.start_trace(args.profile_dir)
                step_key = jax.random.fold_in(jax.random.PRNGKey(seed + 3), step)
                ema_decay = ema_sched.get_value()
                state, metrics = train_step(state, dev_batch, step_key, ema_decay)
                if args.profile_dir and step == 15:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    print(f"Saved profiler trace to {args.profile_dir}")

                # keep losses as device scalars; sync to host only at the
                # print cadence so the device pipeline stays full
                losses_since_last_print.append((metrics["loss"], ema_decay))
                ema_sched.step()
                if args.gns:
                    # keep the sq-norms as device scalars; the estimator
                    # update is folded into the 25-step sync cadence below so
                    # --gns doesn't force a per-step host round-trip
                    # (the reference's DDP hook is async by construction,
                    # reference gns.py:5-34)
                    gns_pending.append((metrics["grad_sq_norm_small"],
                                        metrics["grad_sq_norm_big"]))
                t_body_end = time.time()
                host["elapsed"] += t_body_end - t0
                starvation.record(data_wait, t_body_end - t0)

                if step % 25 == 0 or use_wandb:
                    for dev_loss, decay in losses_since_last_print:
                        K.utils.ema_update_dict(
                            host["ema_stats"], {"loss": float(dev_loss)},
                            decay ** (1 / accum))
                    loss_vals = [float(l) for l, _ in losses_since_last_print]
                    loss = loss_vals[-1]
                    losses_since_last_print.clear()
                    drain_gns()
                if step % 25 == 0 and is_main:
                    loss_disp = sum(loss_vals) / len(loss_vals)
                    avg_loss = host["ema_stats"]["loss"]
                    gns_str = f", gns: {gns_stats.get_gns():g}" if args.gns else ""
                    print(f"Epoch: {epoch}, step: {step}, loss: {loss_disp:g}, "
                          f"avg loss: {avg_loss:g}{gns_str}", flush=True)
                    warn = starvation.check()
                    if warn:
                        print(warn, flush=True)
                if use_wandb:
                    import wandb
                    log_dict = {"epoch": epoch, "loss": loss,
                                "lr": float(lr_sched(step)), "ema_decay": ema_decay}
                    if args.gns:
                        log_dict["gradient_noise_scale"] = gns_stats.get_gns()
                    # wandb.watch analog (reference train.py:253-254)
                    log_dict.update({k: float(v) for k, v in metrics.items()
                                     if k.startswith(("param_norm/", "grad_norm/"))})
                    wandb.log(log_dict, step=step)

                step += 1
                host["step"] = step
                if args.demo_every > 0 and step % args.demo_every == 0:
                    demo(step)
                if evaluate_enabled and step > 0 and step % args.evaluate_every == 0:
                    evaluate(step)
                if step == args.end_step or (
                        args.save_every > 0 and step > 0
                        and step % args.save_every == 0):
                    if args.gns:
                        drain_gns()  # checkpoint the estimator fully up to date
                    save(step)
                if step == args.end_step:
                    if is_main:
                        print("Done!")
                    return
            epoch += 1
            host["epoch"] = epoch
            batch_in_epoch = 0
            host["batch_in_epoch"] = 0
    except KeyboardInterrupt:
        pass
    finally:
        checkpoint.wait_for_checkpoints()


if __name__ == "__main__":
    main()

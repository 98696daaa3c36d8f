"""Headline benchmark on the flagship hourglass DiT (BASELINE.json metric).

Prints ONE JSON line:
  metric/value/unit/vs_baseline : 256x256 samples/sec/chip at 50-step
    DPM++(2M) sampling (batch 8), vs this framework's round-1 pre-Pallas
    XLA-fallback path (the reference publishes no numbers; BASELINE.md).
  train_imgs_per_sec            : full train step (fwd+bwd+clip+AdamW+EMA),
    batch 32, no remat.
  train_imgs_per_sec_remat      : same with gradient checkpointing on the
    memory-dominant high-res DOWN stack (remat_levels=('down_0',): level 0
    holds ~2x the activation bytes/layer of level 1 and ~4x the global
    level, and its up stack's activations are consumed FIRST in the
    backward so only the down stack pays for saving — measured fastest in
    the r3 remat ladder, PERFORMANCE.md).
  sample_mfu / train_mfu        : measured model FLOPs / step time / peak,
    using the reference-convention analytic FLOP count (models/flops.py;
    2 FLOPs per MAC, backward = 2x forward) and the chip's bf16 peak.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# Round-1 baseline: XLA masked-SDPA attention paths, same model/sampler/shapes
# (measured on TPU v5e before the Pallas NA/flash kernels landed:
# 1.497 s per batch-2 forward -> 50-step DPM++(2M) sampling throughput).
BASELINE_SAMPLES_PER_SEC = 2.0 / (1.497 * 50)

# bf16 dense peak FLOP/s by device kind (for the MFU denominators)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops():
    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_BF16.items():
        if kind.lower().startswith(name.lower()):
            return peak, kind
    return 197e12, kind  # assume v5e-class if unknown


def _median_time(run, n_iters=5):
    run()  # compile
    run()  # warmup
    times = []
    for _ in range(n_iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return sorted(times)[n_iters // 2]


def bench_sampling(config, model, params, key):
    from k_diffusion_tpu import layout, sampling
    from k_diffusion_tpu.denoiser import Denoiser

    batch, steps, reps = 8, 50, 8
    mcfg = config["model"]
    sigma_min, sigma_max = mcfg["sigma_min"], mcfg["sigma_max"]
    # token (b, H/ph, W/pw, ph*pw*c) sampler carry (layout.py): both patch
    # boundaries inside the scan are plain matmuls, the pixel gather runs
    # once outside; the model computes the identical function on token
    # arrays (+6% over the folded layout). Note the initial noise is drawn
    # at token shape — a different permutation of the same bits than an
    # NHWC draw, so seed-for-seed outputs differ from the NHWC path.
    (ih, iw), (ph, pw) = mcfg["input_size"], mcfg["patch_size"]
    c = mcfg["input_channels"]
    init_x = jax.random.normal(
        key, (reps, batch, ih // ph, iw // pw, ph * pw * c)) * sigma_max
    sigmas = sampling.get_sigmas_karras(steps, sigma_min, sigma_max)

    @jax.jit
    def sample(params, xs, sigmas):
        # precomputed-cond path (condcache.py): the mapping network and all
        # per-layer AdaRMSNorm scale projections are hoisted out of the
        # 50-step scan into one table (bit-identical, tests/test_condcache.py)
        from k_diffusion_tpu import condcache
        den = Denoiser(
            condcache.scheduled_inner_fn(model, {"params": params},
                                         sigmas[:-1], batch,
                                         image_layout="tokens"),
            sigma_data=config["model"]["sigma_data"])
        # steady-state throughput: `reps` consecutive batches per dispatch
        # (amortizes this environment's ~25 ms per-dispatch tunnel RPC,
        # which is not a property of the framework or the hardware)
        out = jax.lax.map(
            lambda x: sampling.sample_dpmpp_2m(den, x, sigmas), xs)
        return layout.from_tokens(out, (ph, pw), c)

    # NOTE: under the axon tunnel block_until_ready does not reliably
    # synchronize; a host readback does. Use a scalar readback as the fence.
    def run_once():
        out = sample(params, init_x, sigmas)
        return float(jnp.sum(out[:, :, 0, 0, 0]))

    dt = _median_time(run_once) / reps
    return batch / dt, dt / steps, batch


def bench_512():
    """512x512 sampling on the 4-level HDiT (configs/config_512_hdit.json),
    50-step DPM++(2M) at batch 4 — the long-context scale story (a
    128x128-token neighborhood-attention level)."""
    from k_diffusion_tpu import config as config_mod, layout, sampling
    from k_diffusion_tpu.denoiser import Denoiser

    config = config_mod.load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "config_512_hdit.json"))
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jax.random.normal(key, (1, 512, 512, 3)), jnp.ones([1]))["params"]
    b, reps, mcfg = 4, 2, config["model"]
    # token-layout sampler carry (see bench_sampling / layout.py)
    ph, pw = mcfg["patch_size"]
    init_x = jax.random.normal(
        key, (reps, b, 512 // ph, 512 // pw, ph * pw * 3)) * mcfg["sigma_max"]
    sigmas = sampling.get_sigmas_karras(50, mcfg["sigma_min"],
                                        mcfg["sigma_max"])

    @jax.jit
    def sample(params, xs, sigmas):
        # precomputed-cond path (see bench_sampling)
        from k_diffusion_tpu import condcache
        den = Denoiser(
            condcache.scheduled_inner_fn(model, {"params": params},
                                         sigmas[:-1], b,
                                         image_layout="tokens"),
            sigma_data=mcfg["sigma_data"])
        # steady-state: `reps` batches per dispatch (see bench_sampling)
        out = jax.lax.map(
            lambda x: sampling.sample_dpmpp_2m(den, x, sigmas), xs)
        return layout.from_tokens(out, (ph, pw), 3)

    def run_once():
        out = sample(params, init_x, sigmas)
        return float(jnp.sum(out[:, :, 0, 0, 0]))

    dt = _median_time(run_once, n_iters=3) / reps
    return b / dt


def bench_train(config, remat):
    """Full train step (stratified sigmas, loss, grads, clip, 4-group AdamW,
    EMA) at batch 32, timed over a 32-step scan with one host readback —
    steady-state convention, like bench_sampling: the ~25 ms per-dispatch /
    per-readback tunnel RPC of this environment is amortized over the scan
    (real training dispatches steps asynchronously and never blocks on a
    per-step host sync; train.py reads metrics every 25 steps)."""
    import optax
    from k_diffusion_tpu import config as config_mod, training
    from k_diffusion_tpu.models import image_transformer_v2 as itv2
    from k_diffusion_tpu.utils import ema_update

    model = config_mod.make_model(
        config, dtype=jnp.bfloat16, checkpointing=remat,
        remat_levels=('down_0',) if remat else None)
    den_factory = config_mod.make_denoiser_wrapper(config)
    sample_density = config_mod.make_sample_density(config["model"])

    key = jax.random.PRNGKey(0)
    b, inner = 32, 32
    (ih, iw) = config["model"]["input_size"]
    patch = tuple(config["model"]["patch_size"])
    c = config["model"]["input_channels"]
    reals = jax.random.normal(key, (b, ih, iw, c))
    variables = jax.jit(model.init)(key, reals[:1], jnp.ones([1]))
    params = variables["params"]
    opt = training.make_optimizer(config, itv2.param_group_labels(params))
    opt_state = opt.init(params)

    def loss_fn(params, key):
        from k_diffusion_tpu import layout
        k_sig, k_noise, k_drop = jax.random.split(key, 3)
        sigma = sample_density(k_sig, (b,))
        # token image layout for the loss math, as in training.py
        den = den_factory(
            lambda x, s, **kw: model.apply({"params": params}, x, s,
                                           train=True, image_layout="tokens",
                                           rngs={"dropout": k_drop}, **kw))
        reals_f = layout.to_tokens(reals, patch)
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
        # one scalar: a single host readback fences the whole scan
        return jnp.sum(jax.tree_util.tree_leaves(carry[0])[0]) + losses.sum()

    def run_once():
        return float(scan_steps(params, opt_state, key))

    dt = _median_time(run_once, n_iters=3) / inner
    return b / dt, dt, b


def bench_shardmap():
    """1-device-mesh shard_map train step vs the mesh-free step on the real
    chip (invoked as ``python bench.py shardmap``; not part of the driver's
    headline line). dp meshes MUST go through shard_map because GSPMD cannot
    partition pallas_call — this mode certifies that lowering executes on
    silicon and records its overhead (tests/test_shard_map_tpu.py asserts
    the bit-equality side)."""
    import contextlib

    import numpy as np
    from jax.sharding import Mesh

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod, parallel, training
    from k_diffusion_tpu.models import image_transformer_v2 as itv2

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    b, steps = 32, 16
    v = jax.jit(model.init)(
        key, jax.random.normal(key, (1, 256, 256, 3)), jnp.ones([1]))
    opt = training.make_optimizer(
        config, itv2.param_group_labels(v["params"]))
    batch = {"reals": jax.random.normal(key, (1, b, 256, 256, 3))}

    def build(mesh):
        params = jax.tree_util.tree_map(jnp.copy, v["params"])
        state = training.TrainState(
            step=jnp.int32(0), params=params, opt_state=opt.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params))
        step = training.make_train_step(
            model, config_mod.make_denoiser_wrapper(config),
            config_mod.make_sample_density(config["model"]), opt,
            mesh=mesh, data_axis=parallel.DATA_AXIS, token_patch=(4, 4))
        return state, step

    results = {}
    for name, mesh in (
            ("meshfree", None),
            ("shardmap_1dev",
             Mesh(np.array(jax.devices()[:1]), (parallel.DATA_AXIS,)))):
        state, step = build(mesh)
        with (mesh if mesh is not None else contextlib.nullcontext()):
            if mesh is not None:
                # place state/batch under the mesh shardings up front —
                # committed single-device inputs would otherwise be
                # re-placed through the host on EVERY call (measured 96x)
                state = parallel.replicate(state, mesh)
                sharding = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(
                        None, parallel.DATA_AXIS))
                batch = {k: jax.device_put(v_, sharding)
                         for k, v_ in batch.items()}
            state, m = step(state, batch, jax.random.fold_in(key, 0), 0.99)
            float(m["loss"])  # fence the compile+first step (host readback)
            t0 = time.time()
            for i in range(steps):
                state, m = step(state, batch,
                                jax.random.fold_in(key, i + 1), 0.99)
            float(m["loss"])  # fence
            dt = (time.time() - t0) / steps
        results[name] = round(b / dt, 1)

    overhead = results["meshfree"] / results["shardmap_1dev"] - 1
    print(json.dumps({
        "metric": "train imgs/sec/chip: shard_map(1-dev mesh) vs mesh-free",
        **results,
        "shardmap_overhead_pct": round(100 * overhead, 2),
    }))


def main():
    import __graft_entry__
    from k_diffusion_tpu import config as config_mod
    from k_diffusion_tpu.models import flops as flops_mod

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    init_x = jax.random.normal(key, (1, 256, 256, 3))
    params = jax.jit(model.init)(key, init_x, jnp.ones([1]))["params"]

    samples_per_sec, dt_fwd_step, sample_batch = bench_sampling(
        config, model, params, key)
    del params
    train_ips, dt_train, train_batch = bench_train(config, remat=False)
    train_ips_remat, _, _ = bench_train(config, remat=True)
    samples_512 = bench_512()

    peak, kind = _peak_flops()
    fwd_flops = 2 * flops_mod.analytic_transformer_flops(config, batch=1)
    sample_mfu = fwd_flops * sample_batch / dt_fwd_step / peak
    train_mfu = 3 * fwd_flops * train_batch / dt_train / peak

    print(json.dumps({
        "metric": "256x256 samples/sec/chip (50-step DPM++ 2M, flagship HDiT)",
        "value": round(samples_per_sec, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
        "train_imgs_per_sec": round(train_ips, 1),
        "train_imgs_per_sec_remat": round(train_ips_remat, 1),
        "samples_per_sec_512": round(samples_512, 2),
        "sample_mfu": round(sample_mfu, 4),
        "train_mfu": round(train_mfu, 4),
        "device_kind": kind,
    }))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "shardmap":
        bench_shardmap()
    else:
        main()

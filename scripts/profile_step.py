"""Trace the flagship train fwd+bwd (or full step / forward) and print the
top device ops, aggregated from the xplane proto.

Usage: python scripts/profile_step.py [--batch 32] [--what grad|fwd|full]
                                      [--remat] [--remat-policy P] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

INNER = 8


def parse_xplane(trace_dir, top=40, inner=INNER, cat_filter=None):
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())
    def category(name):
        if "custom-call" in name or "custom_call" in name:
            return "pallas custom-call"
        if "-start" in name.split(" = ")[0]:
            return "async-start (overlaps)"
        if "-done" in name.split(" = ")[0]:
            return "async-done (wait)"
        if "%fusion" in name or " fusion(" in name:
            return "fusion"
        if "convolution" in name:
            return "convolution"
        if "%dot" in name or " dot(" in name:
            return "dot"
        if "%copy" in name or "%transpose" in name or "%bitcast" in name:
            return "copy/transpose"
        return "other"

    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        cats = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
                cats[category(name)] += ev.duration_ps / 1e9
        if not totals:
            continue
        print(f"=== plane: {plane.name}")
        print("--- categories (ms/iter; async overlaps compute):")
        for cat, ms in cats.most_common():
            print(f"{ms/inner:9.3f}  {cat}")
        print("--- top ops:")
        for name, ms in totals.most_common(top * 20):
            if category(name).startswith("async"):
                continue
            if cat_filter and cat_filter not in category(name):
                continue
            print(f"{ms/inner:9.3f} ms/iter  x{max(1, counts[name]//inner):<4d}"
                  f" {name[:110]}")
            top -= 1
            if top <= 0:
                break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--what", default="grad", choices=["grad", "fwd", "full"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", type=str, default=None)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/kdt_trace")
    ap.add_argument("--cat", default=None,
                    help="only show top ops whose category contains this")
    args = ap.parse_args()

    import __graft_entry__
    from k_diffusion_tpu import config as config_mod

    config = config_mod.load_config(__graft_entry__._flagship_config())
    model = config_mod.make_model(config, dtype=jnp.bfloat16,
                                  checkpointing=args.remat,
                                  remat_policy=args.remat_policy)
    den_factory = config_mod.make_denoiser_wrapper(config)
    sample_density = config_mod.make_sample_density(config["model"])

    key = jax.random.PRNGKey(0)
    b = args.batch
    reals = jax.random.normal(key, (b, 256, 256, 3))
    params = jax.jit(model.init)(key, reals[:1], jnp.ones([1]))["params"]

    def loss_fn(params, key):
        from k_diffusion_tpu import layout
        k_sig, k_noise, k_drop = jax.random.split(key, 3)
        sigma = sample_density(k_sig, (b,))
        # folded image layout, matching training.py / bench_train.py
        den = den_factory(layout.folded_model_fn(
            lambda x, s, **kw: model.apply({"params": params}, x, s,
                                           train=True,
                                           rngs={"dropout": k_drop}, **kw),
            reals.shape[-1]))
        reals_f = layout.fold_images(reals)
        noise = jax.random.normal(k_noise, reals_f.shape, reals_f.dtype)
        return jnp.mean(den.loss(reals_f, noise, sigma))

    if args.what == "fwd":
        @jax.jit
        def scan(params, key):
            def body(acc, i):
                return acc + loss_fn(params, jax.random.fold_in(key, i)), None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))[0]
    elif args.what == "full":
        import optax
        from k_diffusion_tpu import training
        from k_diffusion_tpu.models import image_transformer_v2 as itv2
        from k_diffusion_tpu.utils import ema_update
        opt = training.make_optimizer(config, itv2.param_group_labels(params))
        opt_state0 = opt.init(params)

        @jax.jit
        def scan(params, key):
            def body(carry, i):
                params, opt_state, ema = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, jax.random.fold_in(key, i))
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                ema = ema_update(params, ema, 0.99)
                return (params, opt_state, ema), loss
            carry, losses = jax.lax.scan(body, (params, opt_state0, params),
                                         jnp.arange(INNER))
            return losses.sum() + sum(
                jnp.sum(l) for l in jax.tree_util.tree_leaves(carry[0])[:1])
    else:
        @jax.jit
        def scan(params, key):
            def body(acc, i):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, jax.random.fold_in(key, i))
                sq = sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(grads))
                return acc + loss + sq * 1e-20, None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))[0]

    def run():
        return float(scan(params, key))

    run()
    run()
    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    run()
    jax.profiler.stop_trace()
    parse_xplane(args.trace_dir, top=args.top, cat_filter=args.cat)


if __name__ == "__main__":
    main()

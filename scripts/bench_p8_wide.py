"""Measure configs/config_256_p8_wide.json — the PERFORMANCE.md headroom-#3
experiment (patch 8, widths [256, 512]: trades the narrow width-128 level-0
contractions for MXU-wide matmuls at the same 256x256 resolution).

Reuses bench.py's bench_sampling/bench_train so the numbers are directly
comparable with the flagship headline. Prints one JSON line; the verdict
goes in PERFORMANCE.md (r4 verdict Weak #3: measure it or delete it).

Usage: python scripts/bench_p8_wide.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as bench_mod
from k_diffusion_tpu import config as config_mod
from k_diffusion_tpu.models import flops as flops_mod


def main():
    config = config_mod.load_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "config_256_p8_wide.json"))
    model = config_mod.make_model(config, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jax.random.normal(key, (1, 256, 256, 3)), jnp.ones([1]))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    samples_per_sec, dt_fwd_step, sample_batch = bench_mod.bench_sampling(
        config, model, params, key)
    del params
    train_ips, dt_train, train_batch = bench_mod.bench_train(
        config, remat=False)

    peak, kind = bench_mod._peak_flops()
    fwd_flops = 2 * flops_mod.analytic_transformer_flops(config, batch=1)
    print(json.dumps({
        "metric": "config_256_p8_wide (patch 8, widths [256,512]) vs flagship",
        "params_m": round(n_params / 1e6, 1),
        "gflops_fwd": round(fwd_flops / 1e9, 2),
        "samples_per_sec": round(samples_per_sec, 2),
        "train_imgs_per_sec": round(train_ips, 1),
        "sample_mfu": round(
            fwd_flops * sample_batch / dt_fwd_step / peak, 4),
        "train_mfu": round(
            3 * fwd_flops * train_batch / dt_train / peak, 4),
        "device_kind": kind,
    }))


if __name__ == "__main__":
    main()

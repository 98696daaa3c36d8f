"""shard_map(pallas_call) on real silicon.

dp meshes MUST route through shard_map (GSPMD cannot partition pallas_call),
but the CPU-mesh tests exercise only the XLA fallbacks and the TPU bench is
mesh-free — so before this test existed, the manual-partitioning lowering
path that real multi-chip dp depends on had never executed on hardware
(r4 verdict Weak #4). Here: the full train step under a 1-device mesh on the
real chip, at shapes that dispatch the Pallas NA/fused kernels, must
(a) actually lower to tpu_custom_call (the kernels ARE in the shard_mapped
program) and (b) produce bit-identical params/EMA to the mesh-free step.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU for Mosaic kernels")

CFG_DICT = {
    "model": {
        "type": "image_transformer_v2",
        "input_channels": 3,
        "input_size": [128, 128],
        "patch_size": [4, 4],
        "depths": [1, 1],
        "widths": [128, 256],
        "self_attns": [
            {"type": "neighborhood", "d_head": 64, "kernel_size": 7},
            {"type": "neighborhood", "d_head": 64, "kernel_size": 7},
        ],
        "loss_weighting": "soft-min-snr",
        "dropout_rate": [0.0, 0.0],
        "sigma_data": 0.5,
        "sigma_min": 1e-2,
        "sigma_max": 160,
        "sigma_sample_density": {"type": "cosine-interpolated"},
    },
    "dataset": {"type": "imagefolder", "num_classes": 0},
}


def _setup(mesh=None):
    from k_diffusion_tpu import config as config_mod, parallel, training
    from k_diffusion_tpu.models import image_transformer_v2 as itv2

    cfg = config_mod.load_config(CFG_DICT)
    model = config_mod.make_model(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.zeros([1, 128, 128, 3]), jnp.ones([1]))
    opt = training.make_optimizer(cfg, itv2.param_group_labels(v["params"]))
    state = training.init_train_state(
        model, opt, key, {"reals": jnp.zeros([2, 128, 128, 3])})
    step = training.make_train_step(
        model, config_mod.make_denoiser_wrapper(cfg),
        config_mod.make_sample_density(cfg["model"]), opt,
        mesh=mesh, data_axis=parallel.DATA_AXIS,
        token_patch=(4, 4))
    return state, step


@requires_tpu
def test_shard_map_pallas_train_step_on_tpu():
    from jax.sharding import Mesh

    from k_diffusion_tpu import parallel

    key = jax.random.PRNGKey(3)
    batch = {"reals": jax.random.normal(key, (1, 8, 128, 128, 3))}
    step_key = jax.random.fold_in(key, 1)

    # mesh-free step (the path bench.py and the kernel suite exercise)
    state1, step1 = _setup()
    state1, m1 = step1(state1, batch, step_key, 0.99)

    # 1-device mesh: same math, but through shard_map manual partitioning —
    # the lowering real dp pods take
    mesh = Mesh(np.array(jax.devices()[:1]), (parallel.DATA_AXIS,))
    state2, step2 = _setup(mesh=mesh)

    # (a) the Pallas kernels must be INSIDE the shard_mapped program
    lowered = step2.lower(state2, batch, step_key, 0.99)
    hlo = lowered.as_text()
    assert "tpu_custom_call" in hlo, (
        "no tpu_custom_call in the shard_map train step — the Pallas "
        "kernels fell back to XLA under the mesh")

    with mesh:
        state2, m2 = step2(state2, batch, step_key, 0.99)

    # (b) bit-equality with the mesh-free step (dropout=0; global-shape RNG)
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state1.ema_params)),
            jax.tree_util.tree_leaves(jax.device_get(state2.ema_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

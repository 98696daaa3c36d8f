"""Subprocess worker for test_two_process_execution: a REAL 2-process
``jax.distributed`` run on CPU (4 virtual devices per process, 8 global).

Exercises, with ``jax.process_count() == 2`` actually true (not
monkeypatched):
- ``jax.distributed.initialize`` + gloo CPU collectives;
- ``parallel.local_batch_to_global``'s ``make_array_from_process_local_data``
  branch (parallel/__init__.py:72-74);
- the shard_map train step over a mesh spanning both processes (3 steps of
  config_test_tiny's model, the reference's default multi-rank DDP mode,
  reference train.py:118-126);
- ``evaluation.compute_features``'s ``process_allgather`` branch
  (evaluation.py, reference evaluation.py:87);
- rank-gated side-effect writes (``parallel.is_main_process``).

Writes ``rank<i>.json`` with the per-step losses and the gathered feature
matrix; the test compares across ranks and against a single-process run.
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=rank)

    import jax.numpy as jnp
    import numpy as np
    from k_diffusion_tpu import evaluation, parallel

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    mesh = parallel.make_mesh()
    losses = two_process_train_losses(mesh, rank)

    # compute_features: each rank's sampler emits its own constant; the
    # process_allgather branch must leave BOTH ranks holding the identical
    # global feature matrix containing both contributions
    def sample_fn(n):
        return jnp.full((n, 8, 8, 3), float(rank + 1))

    def extractor(x):
        return x.reshape(x.shape[0], -1)[:, :4]

    feats = np.asarray(evaluation.compute_features(sample_fn, extractor, 8, 4))

    # rank-gated side effects
    if parallel.is_main_process():
        with open(os.path.join(outdir, "main_process_artifact.txt"), "w") as f:
            f.write("rank 0 owns side effects\n")

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({"losses": losses, "features": feats.tolist(),
                   "process_count": jax.process_count()}, f)


def two_process_train_losses(mesh, rank, steps=3):
    """3 shard_map train steps on config_test_tiny's model over ``mesh``.
    Batches are drawn at GLOBAL shape from fixed keys and sliced to this
    process's quarter-pair, so any process layout reproduces the same math
    (the single-process comparison run calls this with rank=None)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from k_diffusion_tpu import config as config_mod, parallel, training
    from k_diffusion_tpu.models import image_transformer_v2 as itv2

    cfg = config_mod.load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "configs", "config_test_tiny.json"))
    model = config_mod.make_model(cfg)
    den_factory = config_mod.make_denoiser_wrapper(cfg)
    sample_density = config_mod.make_sample_density(cfg["model"])

    key = jax.random.PRNGKey(0)
    b_global = 16
    variables = model.init(key, jnp.zeros((2, 32, 32, 3)), jnp.ones([2]),
                           class_cond=jnp.zeros((2,), jnp.int32))
    params = variables["params"]
    labels = itv2.param_group_labels(params)
    opt = training.make_optimizer(cfg, labels)
    state = training.TrainState(
        step=jnp.int32(0), params=params, opt_state=opt.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params))
    state = parallel.replicate(state, mesh)

    step_fn = training.make_train_step(
        model, den_factory, sample_density, opt, num_classes=4,
        cond_dropout_rate=0.0, stratified=True, mesh=mesh,
        data_axis=parallel.DATA_AXIS)

    spec = P(None, parallel.DATA_AXIS)
    losses = []
    for i in range(steps):
        k = jax.random.fold_in(jax.random.PRNGKey(42), i)
        k_img, k_cls = jax.random.split(k)
        reals_g = jax.random.normal(k_img, (1, b_global, 32, 32, 3))
        cls_g = jax.random.randint(k_cls, (1, b_global), 0, 4)
        if rank is None:  # single-process: whole batch local
            batch = {"reals": reals_g, "class_cond": cls_g}
        else:  # this process's contiguous half of the global batch
            lo = rank * (b_global // 2)
            hi = lo + b_global // 2
            batch = {"reals": reals_g[:, lo:hi], "class_cond": cls_g[:, lo:hi]}
        batch = parallel.local_batch_to_global(batch, mesh, spec=spec)
        state, metrics = step_fn(state, batch, jax.random.fold_in(k, 99),
                                 0.99)
        losses.append(float(metrics["loss"]))
    return losses


if __name__ == "__main__":
    main()

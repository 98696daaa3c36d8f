"""Device-mesh parallelism layer.

TPU-native replacement for the reference's DDP/NCCL/Accelerate stack
(reference train.py:118-126, 241; SURVEY.md §2.10/§5.8): one global
``jax.sharding.Mesh`` over ICI/DCN, data-parallel batch sharding via
``NamedSharding``, params replicated, and the gradient all-reduce inserted by
XLA from the sharding annotations on the jitted train step — no explicit
collectives in user code. Multi-host init goes through
``jax.distributed.initialize``.

The single-device path is the same code with a 1-device mesh.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, axis_name=DATA_AXIS):
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(tp=1, devices=None, data_axis=DATA_AXIS, model_axis=MODEL_AXIS):
    """A (data, model) mesh for dp x tp: the model axis shards attention
    heads / FF hidden dims (see ImageTransformerDenoiserModelV2.tp_axis);
    lay the model axis innermost so its collectives ride ICI neighbors."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (data_axis, model_axis))


def batch_spec(mesh, axis_name=DATA_AXIS):
    """Sharding for a batch array: leading dim split across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    """Sharding for fully replicated values (params, opt state, PRNG keys)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name=DATA_AXIS):
    """Places a pytree of host arrays onto the mesh, batch dim sharded."""
    sharding = batch_spec(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh):
    """Replicates a pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_to_global(local_batches, mesh, axis_name=DATA_AXIS, spec=None):
    """Multi-host: assembles a global array from per-host local shards
    (the jax.make_array_from_process_local_data path). On a single host this
    is just a device_put with the given sharding. ``spec`` defaults to
    sharding dim 0 over ``axis_name``; pass e.g. P(None, 'data') for arrays
    with an accumulation dim in front."""
    spec = P(axis_name) if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batches)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batches)


def process_index():
    """This host's process index (wrapped so tests can monkeypatch the
    multi-host gating logic without a real multi-process run)."""
    return jax.process_index()


def process_count():
    """Number of host processes (monkeypatchable, see process_index)."""
    return jax.process_count()


def is_main_process():
    """True on the process that owns side effects: checkpoint/demo/CSV/wandb
    writes must be gated on this (reference train.py:124,227,277,305,324,349)."""
    return process_index() == 0


def initialize_distributed(**kwargs):
    """Multi-host (DCN) process-group init; no-op when single-process
    (the TPU analog of the reference's ensure_distributed, train.py:28-30)."""
    import os
    if "JAX_COORDINATOR_ADDRESS" in os.environ or kwargs:
        jax.distributed.initialize(**kwargs)

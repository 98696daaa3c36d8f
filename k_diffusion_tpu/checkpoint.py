"""Checkpoint/resume and slim inference export.

Reference behavior (train.py:397-423, 269-311; convert_for_inference.py):
- full training checkpoint: config, model, model_ema, opt, scheds, step,
  gns/ema stats, demo RNG state, elapsed seconds; sidecar
  ``{name}_state.json`` recording the latest checkpoint path.
- slim inference checkpoint: EMA weights as safetensors with the config JSON
  embedded in the file metadata (loadable as a config source).

Here the train state is one pytree serialized with flax msgpack (the
TPU-native analog of the single .pth), and the safetensors export uses
'/'-joined pytree paths as tensor names.

Pod scale: the msgpack path round-trips the full state through one host —
fine at 61M params, wrong for sharded multi-host state. ``*_sharded``
variants write per-shard TensorStore files via orbax (each host writes only
its addressable shards, save is async) and restore each shard directly to
its device per the template's shardings. A checkpoint path that is a
directory is an orbax checkpoint; ``load_checkpoint`` dispatches on that, so
the two formats interoperate behind one resume flow (reference
train.py:397-423's single .pth has the same single-host limitation).
"""

import atexit
import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization, traverse_util


def save_checkpoint(path, state, host_state):
    """Writes the train state pytree + host-side state to ``path``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    payload = {
        "state": serialization.to_state_dict(state),
        "host": host_state,
    }
    path.write_bytes(serialization.msgpack_serialize(payload))
    return path


def load_checkpoint(path, state_template):
    """Returns (state, host_state); ``state_template`` supplies the pytree
    structure (an initialized TrainState). A directory path is an orbax
    sharded checkpoint and dispatches to ``load_checkpoint_sharded``."""
    if Path(path).is_dir():
        return load_checkpoint_sharded(path, state_template)
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, payload["host"]


_ASYNC_CHECKPOINTER = None


def _async_checkpointer():
    """One process-wide orbax AsyncCheckpointer (creating one per save leaks
    its thread pool); finalized at exit so queued saves always commit."""
    global _ASYNC_CHECKPOINTER
    if _ASYNC_CHECKPOINTER is None:
        import orbax.checkpoint as ocp
        _ASYNC_CHECKPOINTER = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(wait_for_checkpoints)
    return _ASYNC_CHECKPOINTER


def wait_for_checkpoints():
    """Blocks until any in-flight async sharded save has committed, then
    flushes any deferred ``{name}_state.json`` pointer update."""
    if _ASYNC_CHECKPOINTER is not None:
        _ASYNC_CHECKPOINTER.wait_until_finished()
    _flush_pending_state_json()


def save_checkpoint_sharded(path, state, host_state, async_save=True):
    """Pod-scale checkpoint: the state pytree goes to per-shard TensorStore
    files under the ``path`` directory (every host writes only its
    addressable shards — no single-host gather), the small host-side state to
    a msgpack sidecar written by process 0. ``async_save`` returns after the
    device->host copy of local shards; serialization overlaps training and is
    fenced by the next save / ``wait_for_checkpoints()`` / exit."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    if jax.process_index() == 0:
        Path(f"{path}_host.msgpack").write_bytes(
            serialization.msgpack_serialize({"host": host_state}))
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # one in-flight save at a time
        _flush_pending_state_json()  # previous save has committed
    else:
        # same handler as the async path (StandardCheckpointer.save has a
        # different signature — no args=; caught by the dryrun roundtrip)
        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    ckptr.save(path, args=ocp.args.StandardSave(
        serialization.to_state_dict(state)), force=True)
    if not async_save:
        ckptr.close()
    return path


def load_checkpoint_sharded(path, state_template, shardings=None):
    """Sharded restore: each shard is read straight to the device(s) the
    template's (or the explicit ``shardings`` pytree's) sharding places it
    on. Returns (state, host_state) like ``load_checkpoint``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    template_sd = serialization.to_state_dict(state_template)
    shardings_sd = (serialization.to_state_dict(shardings)
                    if shardings is not None else None)

    def to_abstract(x, s=None):
        sharding = s if s is not None else getattr(x, "sharding", None)
        dtype = x.dtype if hasattr(x, "dtype") else np.asarray(x).dtype
        return jax.ShapeDtypeStruct(np.shape(x), dtype, sharding=sharding)

    if shardings_sd is not None:
        abstract = jax.tree_util.tree_map(to_abstract, template_sd, shardings_sd)
    else:
        abstract = jax.tree_util.tree_map(to_abstract, template_sd)
    with_ckptr = ocp.StandardCheckpointer()
    restored = with_ckptr.restore(path, abstract)
    with_ckptr.close()
    state = serialization.from_state_dict(state_template, restored)
    host_payload = serialization.msgpack_restore(
        Path(f"{path}_host.msgpack").read_bytes())
    return state, host_payload["host"]


def write_state_json(name, ckpt_path):
    state_path = Path(f"{name}_state.json")
    json.dump({"latest_checkpoint": str(ckpt_path)}, open(state_path, "w"))
    return state_path


_PENDING_STATE_JSON = None


def _flush_pending_state_json():
    global _PENDING_STATE_JSON
    if _PENDING_STATE_JSON is not None:
        name, path = _PENDING_STATE_JSON
        _PENDING_STATE_JSON = None
        write_state_json(name, path)


def write_state_json_after_commit(name, ckpt_path):
    """Defer the ``{name}_state.json`` pointer update until the in-flight
    async sharded save has committed (flushed by the next save's fence,
    ``wait_for_checkpoints()``, or exit). Writing it immediately would leave
    the pointer at a directory that never materializes if the process dies
    before the async commit — auto-resume would then fail instead of falling
    back to the last good checkpoint (reference keeps the pointer valid by
    writing it after a synchronous save, train.py:419-421)."""
    global _PENDING_STATE_JSON
    _PENDING_STATE_JSON = (str(name), str(ckpt_path))


def latest_checkpoint(name):
    state_path = Path(f"{name}_state.json")
    if not state_path.exists():
        return None
    return json.load(open(state_path))["latest_checkpoint"]


def _flatten_params(params):
    flat = traverse_util.flatten_dict(jax.device_get(params))
    return {"/".join(k): np.asarray(v) for k, v in flat.items()}


def _unflatten_params(flat):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})


def save_inference(path, params, config, dtype=None):
    """Slim safetensors export of (EMA) params with config in the metadata
    (reference convert_for_inference.py:40-45)."""
    from safetensors.numpy import save_file

    tensors = _flatten_params(params)
    if dtype is not None:
        # bf16 is not a numpy dtype; ml_dtypes provides it (jax dependency)
        import ml_dtypes
        np_dtype = {"float16": np.float16, "bfloat16": ml_dtypes.bfloat16,
                    "float32": np.float32}[str(dtype)]
        tensors = {k: v.astype(np_dtype) for k, v in tensors.items()}
    save_file(tensors, str(path), metadata={"config": json.dumps(config)})
    return Path(path)


def load_inference(path):
    """Returns (params pytree, config dict) from a slim safetensors file."""
    from safetensors.numpy import load_file

    from .utils import get_safetensors_metadata

    flat = load_file(str(path))
    metadata = get_safetensors_metadata(path)
    config = json.loads(metadata["config"]) if "config" in metadata else None
    params = _unflatten_params({k: np.asarray(v) for k, v in flat.items()})
    return params, config

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
"""

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
    structure (an initialized TrainState)."""
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, payload["host"]


def write_state_json(name, ckpt_path):
    state_path = Path(f"{name}_state.json")
    json.dump({"latest_checkpoint": str(ckpt_path)}, open(state_path, "w"))
    return state_path


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

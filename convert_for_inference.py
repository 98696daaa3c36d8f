#!/usr/bin/env python3
"""Converts a training checkpoint to a slim safetensors inference checkpoint
of the EMA weights, with the config embedded in the metadata
(reference convert_for_inference.py)."""

import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("checkpoint", type=Path, help="the training checkpoint")
    p.add_argument("output", type=Path, help="the output safetensors file")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float16", "bfloat16", "float32"],
                   help="the output dtype")
    args = p.parse_args()

    from flax import serialization

    from k_diffusion_tpu import checkpoint

    payload = serialization.msgpack_restore(args.checkpoint.read_bytes())
    config = payload["host"].get("config")
    if not config:
        raise ValueError(
            "checkpoint has no embedded config (re-save it with current "
            "train.py, or pass a config and re-export)")
    ema_params = payload["state"]["ema_params"]
    checkpoint.save_inference(args.output, ema_params, config, dtype=args.dtype)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()

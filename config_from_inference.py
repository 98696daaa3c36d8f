#!/usr/bin/env python3
"""Extracts the configuration JSON from a slim inference checkpoint's
safetensors metadata (reference config_from_inference.py)."""

import argparse
import json
from pathlib import Path

from k_diffusion_tpu import utils


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("checkpoint", type=Path, help="the inference checkpoint")
    p.add_argument("output", type=Path, help="the output JSON file")
    args = p.parse_args()

    metadata = utils.get_safetensors_metadata(args.checkpoint)
    if "config" not in metadata:
        raise ValueError("no config found in checkpoint metadata")
    config = json.loads(metadata["config"])
    args.output.write_text(json.dumps(config, indent=4))
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()

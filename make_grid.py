#!/usr/bin/env python3
"""Assembles a grid of images (reference make_grid.py)."""

import argparse
import math
from pathlib import Path

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("images", type=Path, nargs="+", help="the input images")
    p.add_argument("--output", "-o", type=Path, default=Path("grid.png"),
                   help="the output image")
    p.add_argument("--nrow", type=int,
                   help="the number of images per row")
    args = p.parse_args()

    images = [np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1
              for p in args.images]
    x = np.stack(images)
    nrow = args.nrow if args.nrow else math.ceil(len(images) ** 0.5)

    from k_diffusion_tpu.utils import make_grid, to_pil_image

    grid = make_grid(x, nrow=nrow)
    to_pil_image(grid).save(args.output)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()

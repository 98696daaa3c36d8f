"""PIL <-> array conversion in [-1, 1] (reference utils.py:19-34).

Arrays are NHWC (TPU-native layout) rather than the reference's NCHW.
"""

import numpy as np
from PIL import Image


def from_pil_image(img):
    """PIL image -> float32 HWC array in [-1, 1]."""
    x = np.asarray(img, dtype=np.float32) / 255.0
    if x.ndim == 2:
        x = x[..., None]
    return x * 2 - 1


def to_pil_image(x):
    """Float HWC (or NHWC with N==1, or HW) array in [-1, 1] -> PIL image."""
    x = np.asarray(x)
    if x.ndim == 4:
        assert x.shape[0] == 1
        x = x[0]
    if x.ndim == 3 and x.shape[-1] == 1:
        x = x[..., 0]
    x = (np.clip(x, -1, 1) + 1) / 2
    return Image.fromarray((x * 255).round().astype(np.uint8))


def make_grid(x, nrow=8, padding=0, pad_value=0.0):
    """Assembles a (N, H, W, C) batch into one (H', W', C) grid image
    (torchvision make_grid equivalent used at reference train.py:366,
    make_grid.py:12-46)."""
    x = np.asarray(x)
    n, h, w, c = x.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.full((ncol * (h + padding) - padding,
                    nrow * (w + padding) - padding, c), pad_value, x.dtype)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * (h + padding):r * (h + padding) + h,
             col * (w + padding):col * (w + padding) + w] = x[i]
    return grid

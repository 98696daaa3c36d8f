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

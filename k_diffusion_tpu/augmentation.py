"""Karras (EDM) non-leaking augmentation, pure JAX.

Re-design of reference k_diffusion/augmentation.py: the reference composes
3x3 matrices per image and warps on CPU in DataLoader workers with
skimage order-3 splines (augmentation.py:32-89). Here the whole pipeline —
matrix composition, keyed randomness, and an EXACT order-3 B-spline affine
warp (DCT-domain prefilter; matches scipy/skimage's reflect-mode spline to
machine precision) — is a pure jittable/vmappable function, so augmentation
runs batched on the accelerator instead of per-image in Python workers. The
9-dim conditioning vector and the augmentation distributions match the
reference exactly.

Coordinate convention follows the reference (which uses PIL's (width,
height) via ``image.size``, so its 'h' is the width): matrices act on
(x=col, y=row, 1) homogeneous coordinates.
"""

import math
from functools import reduce

import jax
import jax.numpy as jnp


def translate2d(tx, ty):
    z = jnp.zeros_like(jnp.asarray(tx, jnp.float32))
    o = z + 1
    tx = jnp.asarray(tx, jnp.float32)
    ty = jnp.asarray(ty, jnp.float32)
    return jnp.stack([
        jnp.stack([o, z, tx]), jnp.stack([z, o, ty]), jnp.stack([z, z, o])])


def scale2d(sx, sy):
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    z = jnp.zeros_like(sx)
    o = z + 1
    return jnp.stack([
        jnp.stack([sx, z, z]), jnp.stack([z, sy, z]), jnp.stack([z, z, o])])


def rotate2d(theta):
    theta = jnp.asarray(theta, jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = z + 1
    return jnp.stack([
        jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])])


def _reflect_index(i, n):
    """scipy/skimage 'reflect' (symmetric) boundary: ... 2 1 0 0 1 2 ..."""
    period = 2 * n
    i = jnp.mod(i, period)
    return jnp.where(i >= n, period - 1 - i, i)


def _cubic_weights(t):
    """Catmull-Rom cubic kernel weights for the 4 taps around fractional t."""
    a = -0.5
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (t3 - t2)
    return jnp.stack([w0, w1, w2, w3])


def _bspline3_weights(t):
    """Cubic B-spline basis weights for the 4 taps around fractional t."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1 - 3 * t + 3 * t2 - t3) / 6
    w1 = (4 - 6 * t2 + 3 * t3) / 6
    w2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6
    w3 = t3 / 6
    return jnp.stack([w0, w1, w2, w3])


def spline_prefilter(img):
    """Exact cubic-B-spline prefilter with 'reflect' (half-sample symmetric)
    boundaries, computed in the DCT-II domain: convolution by the B3 kernel
    [1,4,1]/6 is diagonal there, so deconvolution is one divide. This is the
    TPU-native (FFT-based, batched) equivalent of scipy/skimage's recursive
    IIR spline_filter — matches scipy.ndimage.spline_filter(order=3,
    mode='reflect') to machine precision."""
    import jax.scipy.fft as jfft

    for axis in (0, 1):
        n = img.shape[axis]
        k = jnp.arange(n, dtype=img.dtype)
        h = (2 + jnp.cos(jnp.pi * k / n)) / 3
        shape = [1, 1, 1]
        shape[axis] = n
        coef = jfft.dct(img, type=2, axis=axis, norm="ortho") / h.reshape(shape)
        img = jfft.idct(coef, type=2, axis=axis, norm="ortho")
    return img


def affine_warp(image, mat, order=3):
    """Warps HWC ``image`` by the affine matrix ``mat`` (output coords =
    mat @ input coords, like skimage warp(image, AffineTransform(mat).inverse)
    at reference augmentation.py:81-83). Orders: 3 = exact cubic B-spline
    with DCT prefilter (matches the reference's skimage order-3 'reflect'
    warp), "catmull-rom" = bicubic without prefilter, 1 = bilinear,
    0 = nearest. 'reflect' boundary throughout."""
    h, w, c = image.shape
    inv = jnp.linalg.inv(mat.astype(jnp.float32))
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xx, yy, jnp.ones_like(xx)])          # (3, h, w)
    src = jnp.tensordot(inv, coords, axes=1)                  # (3, h, w)
    x_in, y_in = src[0], src[1]

    if order == 0:
        ix = _reflect_index(jnp.round(x_in).astype(jnp.int32), w)
        iy = _reflect_index(jnp.round(y_in).astype(jnp.int32), h)
        return image[iy, ix]

    if order == 1:
        x0 = jnp.floor(x_in).astype(jnp.int32)
        y0 = jnp.floor(y_in).astype(jnp.int32)
        fx = (x_in - x0)[..., None]
        fy = (y_in - y0)[..., None]
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                iy = _reflect_index(y0 + dy, h)
                ix = _reflect_index(x0 + dx, w)
                out = out + wgt * image[iy, ix]
        return out

    # cubic: exact B-spline (with prefiltered coefficients) or Catmull-Rom
    if order == 3:
        image = spline_prefilter(image)
        weight_fn = _bspline3_weights
    else:  # "catmull-rom"
        weight_fn = _cubic_weights
    x0 = jnp.floor(x_in).astype(jnp.int32)
    y0 = jnp.floor(y_in).astype(jnp.int32)
    fx = x_in - x0
    fy = y_in - y0
    wx = weight_fn(fx)  # (4, h, w)
    wy = weight_fn(fy)
    out = 0.0
    for dy in range(4):
        iy = _reflect_index(y0 + dy - 1, h)
        row = 0.0
        for dx in range(4):
            ix = _reflect_index(x0 + dx - 1, w)
            row = row + wx[dx][..., None] * image[iy, ix]
        out = out + wy[dy][..., None] * row
    return out


class KarrasAugmentationPipeline:
    """Samples the EDM augmentation matrix + 9-dim cond and warps the image
    (reference augmentation.py:32-89). ``__call__(key, image)`` with image
    HWC float in [0, 1]; returns (augmented, original, cond) with images in
    [-1, 1], all HWC. Pure function of (key, image) — vmap/jit freely."""

    def __init__(self, a_prob=0.12, a_scale=2 ** 0.2, a_aniso=2 ** 0.2,
                 a_trans=1 / 8, disable_all=False, order=3):
        self.a_prob = a_prob
        self.a_scale = a_scale
        self.a_aniso = a_aniso
        self.a_trans = a_trans
        self.disable_all = disable_all
        self.order = order

    def __call__(self, key, image):
        h_img, w_img, _ = image.shape
        # match the reference's PIL (width, height) naming: h := width
        h, w = w_img, h_img
        keys = jax.random.split(key, 12)

        a0 = jax.random.randint(keys[0], [], 0, 2).astype(jnp.float32)
        do1 = (jax.random.uniform(keys[1], []) < self.a_prob).astype(jnp.float32)
        a1 = jax.random.randint(keys[2], [], 0, 2).astype(jnp.float32) * do1
        do2 = (jax.random.uniform(keys[3], []) < self.a_prob).astype(jnp.float32)
        a2 = jax.random.normal(keys[4], []) * do2
        do3 = (jax.random.uniform(keys[5], []) < self.a_prob).astype(jnp.float32)
        a3 = (jax.random.uniform(keys[6], []) * 2 * math.pi - math.pi) * do3
        do4 = (jax.random.uniform(keys[7], []) < self.a_prob).astype(jnp.float32)
        a4 = (jax.random.uniform(keys[8], []) * 2 * math.pi - math.pi) * do4
        a5 = jax.random.normal(keys[9], []) * do4
        do6 = (jax.random.uniform(keys[10], []) < self.a_prob).astype(jnp.float32)
        a67 = jax.random.normal(keys[11], [2]) * do6
        a6, a7 = a67[0], a67[1]

        mats = [
            translate2d(h / 2 - 0.5, w / 2 - 0.5),
            scale2d(1 - 2 * a0, 1.0),
            scale2d(1.0, 1 - 2 * a1),
            scale2d(self.a_scale ** a2, self.a_scale ** a2),
            rotate2d(-a3),
            rotate2d(a4),
            scale2d(self.a_aniso ** a5, self.a_aniso ** -a5),
            rotate2d(-a4),
            translate2d(self.a_trans * w * a6, self.a_trans * h * a7),
            translate2d(-h / 2 + 0.5, -w / 2 + 0.5),
        ]
        mat = reduce(jnp.matmul, mats)
        cond = jnp.stack([a0, a1, a2, jnp.cos(a3) - 1, jnp.sin(a3),
                          a5 * jnp.cos(a4), a5 * jnp.sin(a4), a6, a7])

        image = image.astype(jnp.float32)
        if self.disable_all:
            return image * 2 - 1, image * 2 - 1, jnp.zeros([9], jnp.float32)
        warped = affine_warp(image, mat, order=self.order)
        return warped * 2 - 1, image * 2 - 1, cond


def augment_wrapper_model_fn(inner_model):
    """Adapts a mapping_cond model (image_v1) to take aug_cond by packing it
    into mapping_cond (reference augmentation.py:92-114)."""

    def model_fn(x, sigma, aug_cond=None, mapping_cond=None, **kwargs):
        if aug_cond is None:
            aug_cond = jnp.zeros([x.shape[0], 9], x.dtype)
        if mapping_cond is None:
            mapping_cond = aug_cond
        else:
            mapping_cond = jnp.concatenate([aug_cond, mapping_cond], axis=1)
        return inner_model(x, sigma, mapping_cond=mapping_cond, **kwargs)

    return model_fn

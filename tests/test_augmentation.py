"""Karras augmentation tests: matrix composition, warp invariants, cond
vector semantics (SURVEY.md §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import augmentation as aug


def test_matrix_helpers():
    t = np.asarray(aug.translate2d(2.0, 3.0))
    np.testing.assert_allclose(t, [[1, 0, 2], [0, 1, 3], [0, 0, 1]])
    s = np.asarray(aug.scale2d(2.0, 0.5))
    np.testing.assert_allclose(np.diag(s), [2, 0.5, 1])
    r = np.asarray(aug.rotate2d(jnp.float32(math.pi / 2)))
    np.testing.assert_allclose(r[:2, :2], [[0, -1], [1, 0]], atol=1e-6)


@pytest.mark.parametrize("order", [0, 1, 3])
def test_warp_identity(order):
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (16, 16, 3))
    out = aug.affine_warp(img, jnp.eye(3), order=order)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_integer_translation():
    img = jnp.arange(8 * 8, dtype=jnp.float32).reshape(8, 8, 1)
    # output = translate(input by +2 in x): out(x) = in(x - 2)
    mat = aug.translate2d(2.0, 0.0)
    out = aug.affine_warp(img, mat, order=1)
    np.testing.assert_allclose(np.asarray(out[:, 2:, 0]), np.asarray(img[:, :-2, 0]), atol=1e-4)


def test_warp_x_flip():
    img = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1)
    img = jnp.tile(img, (6, 1, 1))
    h = w = 6
    mat = (aug.translate2d(w / 2 - 0.5, h / 2 - 0.5)
           @ aug.scale2d(-1.0, 1.0)
           @ aug.translate2d(-w / 2 + 0.5, -h / 2 + 0.5))
    out = aug.affine_warp(img, mat, order=1)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(img[:, ::-1, 0]), atol=1e-4)


def test_pipeline_disabled():
    pipe = aug.KarrasAugmentationPipeline(disable_all=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (8, 8, 3))
    a, o, cond = pipe(key, img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(o))
    np.testing.assert_allclose(np.asarray(cond), 0.0)
    # images mapped to [-1, 1]
    np.testing.assert_allclose(np.asarray(o), np.asarray(img) * 2 - 1, atol=1e-6)


def test_pipeline_runs_and_conds():
    pipe = aug.KarrasAugmentationPipeline(a_prob=1.0)
    key = jax.random.PRNGKey(3)
    img = jax.random.uniform(key, (16, 16, 3))
    a, o, cond = jax.jit(pipe)(key, img)
    assert a.shape == img.shape and cond.shape == (9,)
    assert np.isfinite(np.asarray(a)).all()
    # with a_prob=1 essentially all conds are active (a0 may still be 0/1)
    assert np.abs(np.asarray(cond)[2:]).sum() > 0


def test_pipeline_prob_zero_only_xflip():
    pipe = aug.KarrasAugmentationPipeline(a_prob=0.0)
    img = jnp.tile(jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1), (8, 1, 3)) / 8
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        a, o, cond = pipe(key, img)
        c = np.asarray(cond)
        assert (c[1:] == 0).all()  # only x-flip can fire
        if c[0] == 0:
            np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=1e-4)
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(o)[:, ::-1], atol=1e-4)


def test_pipeline_vmap():
    pipe = aug.KarrasAugmentationPipeline()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3))
    a, o, cond = jax.vmap(pipe)(keys, imgs)
    assert a.shape == (4, 8, 8, 3) and cond.shape == (4, 9)


def test_augment_wrapper_packs_mapping_cond():
    seen = {}

    def inner(x, sigma, mapping_cond=None):
        seen["mc"] = mapping_cond
        return x

    fn = aug.augment_wrapper_model_fn(inner)
    x = jnp.ones([2, 4, 4, 1])
    fn(x, jnp.ones([2]), aug_cond=jnp.full([2, 9], 2.0))
    assert seen["mc"].shape == (2, 9)
    fn(x, jnp.ones([2]), aug_cond=jnp.full([2, 9], 2.0), mapping_cond=jnp.ones([2, 3]))
    assert seen["mc"].shape == (2, 12)


def test_order3_warp_matches_scipy_exactly():
    """The order-3 path (DCT prefilter + B-spline sampling) must match
    scipy.ndimage.affine_transform(order=3, mode='reflect') — the exact
    machinery behind the reference's skimage warp (augmentation.py:81-83)."""
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rng = np.random.RandomState(0)
    img = rng.rand(24, 20, 2).astype(np.float64)
    theta = 0.4
    mat_xy = np.array([[np.cos(theta), -np.sin(theta), 2.0],
                       [np.sin(theta), np.cos(theta), -1.0],
                       [0, 0, 1]])
    out = np.asarray(aug.affine_warp(jnp.asarray(img), jnp.asarray(mat_xy), order=3))
    inv = np.linalg.inv(mat_xy)
    m_rc = np.array([[inv[1, 1], inv[1, 0]], [inv[0, 1], inv[0, 0]]])
    off = np.array([inv[1, 2], inv[0, 2]])
    ref = np.stack([scipy_ndimage.affine_transform(
        img[..., c], m_rc, offset=off, order=3, mode="reflect")
        for c in range(2)], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spline_prefilter_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rng = np.random.RandomState(1)
    img = rng.rand(16, 12, 1).astype(np.float64)
    mine = np.asarray(aug.spline_prefilter(jnp.asarray(img)))[..., 0]
    ref = scipy_ndimage.spline_filter(img[..., 0], order=3, mode="reflect")
    np.testing.assert_allclose(mine, ref, atol=1e-6)

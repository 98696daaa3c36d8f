"""Pallas kernel equivalence tests vs the XLA reference paths (SURVEY.md §4
"kernel equivalence"). These need real TPU hardware; on the CPU test harness
they're skipped (the dispatchers themselves always route to XLA on CPU, which
the model tests cover)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU for Mosaic kernels")

na_mod = importlib.import_module("k_diffusion_tpu.ops.pallas.na2d")
fl_mod = importlib.import_module("k_diffusion_tpu.ops.pallas.flash")


def _qkv(key, shape, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, shape, dtype) for k in ks]


@requires_tpu
@pytest.mark.parametrize("hw,kernel", [(64, 7), (32, 7), (64, 3), (48, 5)])
def test_na2d_matches_reference(hw, kernel):
    q, k, v = _qkv(jax.random.PRNGKey(0), (2, hw, hw, 2, 64))
    out_p = na_mod.na2d(q, k, v, kernel)
    out_x = na_mod.na2d_reference(q, k, v, kernel)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-2)


@requires_tpu
def test_na2d_grads_match_reference():
    q, k, v = _qkv(jax.random.PRNGKey(1), (1, 32, 32, 1, 64))

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v, 7)))

    gp = jax.grad(lambda *a: loss(na_mod.na2d, *a), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: loss(na_mod.na2d_reference, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2)


@requires_tpu
def test_flash_matches_xla():
    q, k, v = _qkv(jax.random.PRNGKey(2), (2, 1024, 2, 64))
    q, k, v = [t * 0.3 for t in (q, k, v)]
    out_p = fl_mod.flash_attention(q, k, v, scale=1.0)
    out_x = jax.nn.dot_product_attention(q, k, v, scale=1.0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-3)


@requires_tpu
def test_flash_grads_match_xla():
    q, k, v = _qkv(jax.random.PRNGKey(3), (1, 512, 2, 64))
    q, k, v = [t * 0.3 for t in (q, k, v)]

    def lp(q, k, v):
        return jnp.sum(fl_mod.flash_attention(q, k, v) ** 2)

    def lx(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v, scale=1.0) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-3)


def test_dispatch_falls_back_off_tpu_or_bad_shapes():
    # tiny map: must route to the XLA path everywhere
    q, k, v = _qkv(jax.random.PRNGKey(4), (1, 7, 7, 1, 16))
    out = na_mod.na2d(q, k, v, 3)
    ref = na_mod.na2d_reference(q, k, v, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

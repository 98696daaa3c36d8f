"""Unit tests for core math utilities (SURVEY.md §4 unit-test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import utils


def test_append_dims():
    x = jnp.ones([4])
    assert utils.append_dims(x, 4).shape == (4, 1, 1, 1)
    assert utils.append_dims(x, 1).shape == (4,)
    with pytest.raises(ValueError):
        utils.append_dims(jnp.ones([2, 2]), 1)


def test_freq_weight_1d():
    w = utils.freq_weight_1d(8)
    # lowest frequency gets the largest weight, Nyquist gets -log2(0.5) = 1
    assert w[0] > w[-1]
    assert np.isclose(float(w[-1]), 1.0)
    w_clamped = utils.freq_weight_1d(8, scales=2)
    assert float(jnp.max(w_clamped)) <= 2.0


def test_freq_weight_nd_is_min_of_axes():
    w2 = utils.freq_weight_nd((4, 8))
    w_a = utils.freq_weight_1d(4)
    w_b = utils.freq_weight_1d(8)
    expected = jnp.minimum(w_a[:, None], w_b[None, :])
    np.testing.assert_allclose(np.asarray(w2), np.asarray(expected))


def test_dct_roundtrip_and_orthonormality():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 3))
    y = utils.dct(x, axes=(1, 2))
    x2 = utils.idct(y, axes=(2, 1))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-5)
    # orthonormal: energy preserved
    np.testing.assert_allclose(
        float(jnp.sum(x ** 2)), float(jnp.sum(y ** 2)), rtol=1e-5)


def test_stratified_uniform_covers_strata():
    key = jax.random.PRNGKey(0)
    groups = 4
    n = 16
    samples = []
    for g in range(groups):
        s = utils.stratified_uniform(jax.random.fold_in(key, g), (n,), group=g, groups=groups)
        samples.append(np.asarray(s))
    all_s = np.concatenate(samples)
    # together the groups stratify [0,1] into n*groups bins, one sample per bin
    bins = np.floor(all_s * n * groups).astype(int)
    assert sorted(bins.tolist()) == list(range(n * groups))
    assert all_s.min() >= 0 and all_s.max() <= 1


def test_rand_log_normal_moments():
    key = jax.random.PRNGKey(0)
    s = utils.rand_log_normal(key, (100000,), loc=-1.2, scale=1.2)
    logs = np.log(np.asarray(s))
    assert abs(logs.mean() - (-1.2)) < 0.02
    assert abs(logs.std() - 1.2) < 0.02


def test_rand_log_normal_stratified_lower_variance_of_mean():
    key = jax.random.PRNGKey(0)
    means_plain, means_strat = [], []
    for i in range(50):
        k = jax.random.fold_in(key, i)
        means_plain.append(float(jnp.mean(jnp.log(utils.rand_log_normal(k, (64,))))))
        means_strat.append(float(jnp.mean(jnp.log(
            utils.rand_log_normal(k, (64,), stratified=(0, 1))))))
    assert np.var(means_strat) < np.var(means_plain)


def test_rand_log_uniform_range():
    key = jax.random.PRNGKey(0)
    s = np.asarray(utils.rand_log_uniform(key, (10000,), 1e-2, 10.0))
    assert s.min() >= 1e-2 * 0.999 and s.max() <= 10.0 * 1.001


def test_rand_log_logistic_truncation():
    key = jax.random.PRNGKey(0)
    s = np.asarray(utils.rand_log_logistic(key, (10000,), loc=0.0, scale=0.5,
                                           min_value=0.1, max_value=5.0))
    assert s.min() >= 0.099 and s.max() <= 5.01


def test_rand_v_diffusion_truncation():
    key = jax.random.PRNGKey(0)
    s = np.asarray(utils.rand_v_diffusion(key, (10000,), min_value=0.05, max_value=20.0))
    assert s.min() >= 0.049 and s.max() <= 20.1


def test_rand_cosine_interpolated_bounds():
    key = jax.random.PRNGKey(0)
    s = np.asarray(utils.rand_cosine_interpolated(
        key, (10000,), image_d=64, noise_d_low=32, noise_d_high=64,
        min_value=1e-3, max_value=1e3))
    assert s.min() > 1e-4 and s.max() < 1e4


def test_rand_split_log_normal_loc():
    key = jax.random.PRNGKey(0)
    s = np.asarray(utils.rand_split_log_normal(key, (200000,), loc=0.5, scale_1=1.0, scale_2=1.0))
    # symmetric scales -> median at exp(loc)
    assert abs(np.median(np.log(s)) - 0.5) < 0.02


def test_ema_update():
    params = {"a": jnp.ones([3]), "b": {"c": jnp.full([2], 2.0)}}
    avg = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = utils.ema_update(params, avg, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 0.2, rtol=1e-5)


def test_ema_warmup_values():
    # reference utils.py:107-113 docstring: inv_gamma=1, power=1 -> simple average
    sched = utils.EMAWarmup(inv_gamma=1.0, power=1.0)
    assert sched.get_value() == 0.0
    sched.step()
    assert np.isclose(sched.get_value(), 0.5)
    sched.step()
    assert np.isclose(sched.get_value(), 2 / 3)


def test_lr_schedules():
    inv = utils.inverse_lr(1.0, inv_gamma=100.0, power=1.0, warmup=0.99)
    # warmup dominates early
    assert float(inv(0)) == pytest.approx(0.01, rel=1e-5)
    # decay dominates late
    assert float(inv(10000)) == pytest.approx((1 + 10000 / 100) ** -1, rel=1e-3)

    exp = utils.exponential_lr(2.0, num_steps=100, decay=0.5)
    assert float(exp(0)) == pytest.approx(2.0)
    assert float(exp(100)) == pytest.approx(1.0, rel=1e-5)

    const = utils.constant_lr_with_warmup(3.0, warmup=0.5)
    assert float(const(0)) == pytest.approx(1.5)
    assert float(const(50)) == pytest.approx(3.0, rel=1e-6)


def test_n_params():
    params = {"a": jnp.ones([3, 4]), "b": jnp.ones([5])}
    assert utils.n_params(params) == 17

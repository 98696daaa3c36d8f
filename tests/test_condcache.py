"""Precomputed-cond sampling (condcache.py): the scheduled model fn must be
BIT-identical to the plain per-step path — the table is the same math, same
shapes, same dtypes, just hoisted out of the scan. Reference analog: none
(the reference recomputes cond per step, image_transformer_v2.py:734-760)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k_diffusion_tpu import condcache, sampling
from k_diffusion_tpu.denoiser import Denoiser
from k_diffusion_tpu.models import image_transformer_v2 as itv2


def tiny_model(attn="global", **kwargs):
    if attn == "global":
        spec = itv2.GlobalAttentionSpec(16)
    elif attn == "neighborhood":
        spec = itv2.NeighborhoodAttentionSpec(16, 3)
    elif attn == "window":
        spec = itv2.ShiftedWindowAttentionSpec(16, 4)
    else:
        spec = itv2.NoAttentionSpec()
    return itv2.ImageTransformerDenoiserModelV2(
        levels=(
            itv2.LevelSpec(2, 32, 64, spec, 0.0),
            itv2.LevelSpec(1, 64, 128, itv2.GlobalAttentionSpec(32), 0.0),
        ),
        mapping=itv2.MappingSpec(1, 32, 64, 0.0),
        in_channels=3, out_channels=3, patch_size=(2, 2), **kwargs)


def randomized_params(model, key, x, sigma, **init_kw):
    variables = model.init(key, x, sigma, **init_kw)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.fold_in(key, 99), len(leaves))
    return treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])


def test_cond_scale_layout_order_and_total():
    model = tiny_model("neighborhood")
    layout, total = itv2.cond_scale_layout(model.levels)
    # forward order: down_0 (2 layers), mid (1 layer, named by make_level's
    # "mid" prefix), up_0 (2 layers); attn before ff within a layer
    assert list(layout) == ["down_0_layer_0", "down_0_layer_1",
                            "mid_layer_0", "up_0_layer_0", "up_0_layer_1"]
    assert layout["down_0_layer_0"] == (0, 32)
    assert layout["down_0_layer_1"] == (64, 96)
    assert layout["mid_layer_0"] == (128, 192)
    assert layout["up_0_layer_0"] == (256, 288)
    # 2 layers x 2 scales x 32 per outer level (x2), 1 x 2 x 64 mid
    assert total == 2 * 2 * 32 + 2 * 64 + 2 * 2 * 32 == 384


def test_cond_scale_layout_no_attention():
    levels = (itv2.LevelSpec(1, 32, 64, itv2.NoAttentionSpec(), 0.0),
              itv2.LevelSpec(1, 64, 128, itv2.GlobalAttentionSpec(32), 0.0))
    layout, total = itv2.cond_scale_layout(levels)
    assert layout["down_0_layer_0"] == (None, 0)
    # mid (width 64) aligns its start 32 -> 64
    assert layout["mid_layer_0"] == (64, 128)
    assert layout["up_0_layer_0"] == (None, 192)
    assert total == 224


def test_cond_scale_layout_alignment_padding():
    """Offsets not naturally divisible by the level width get aligned up
    (e.g. the 512px config's width-768 mid level) so every layer keeps the
    zero-copy BlockSpec path; padding lanes are written-but-never-read."""
    levels = (itv2.LevelSpec(2, 128, 256, itv2.GlobalAttentionSpec(64), 0.0),
              itv2.LevelSpec(1, 768, 2048, itv2.GlobalAttentionSpec(64), 0.0))
    layout, total = itv2.cond_scale_layout(levels)
    # down_0 ends at 512; mid aligns 512 -> 768
    assert layout["mid_layer_0"] == (768, 768 + 768)
    # up_0 starts at 2304 (already %128 == 0)
    assert layout["up_0_layer_0"] == (2304, 2432)
    assert total == 2304 + 4 * 128
    for name, (a, f) in layout.items():
        w = 768 if name.startswith("mid") else 128
        assert a % w == 0 and f % w == 0, name


@pytest.mark.parametrize("attn", ["global", "neighborhood", "window", "none"])
def test_scheduled_forward_bit_identical(attn):
    model = tiny_model(attn)
    key = jax.random.PRNGKey(0)
    b = 2
    x = jax.random.normal(key, (b, 16, 16, 3))
    sigma_probe = jnp.asarray([1.0, 1.0])
    params = randomized_params(model, key, x, sigma_probe)
    variables = {"params": params}

    sigmas = sampling.get_sigmas_karras(6, 1e-2, 80.0)
    inner = condcache.scheduled_inner_fn(model, variables, sigmas[:-1], b)

    for s in np.asarray(sigmas[:-1]):
        sig = jnp.full((b,), s, jnp.float32)
        ref = model.apply(variables, x, sig)
        got = inner(x, sig)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                      err_msg=f"sigma={s}")


def test_scheduled_sampler_bit_identical_class_cond_tokens():
    """Full dpmpp_2m trajectory through the token-layout carry with class
    conditioning: the end-to-end configuration bench.py/sample.py use."""
    from k_diffusion_tpu import layout

    model = tiny_model("global", num_classes=4)
    key = jax.random.PRNGKey(1)
    b = 2
    x_img = jax.random.normal(key, (b, 16, 16, 3))
    class_cond = jnp.asarray([1, 3])
    params = randomized_params(model, key, x_img, jnp.ones((b,)),
                               class_cond=class_cond)
    variables = {"params": params}

    steps = 8
    sigmas = sampling.get_sigmas_karras(steps, 1e-2, 80.0)
    x0 = layout.to_tokens(
        jax.random.normal(jax.random.fold_in(key, 7), (b, 16, 16, 3)) * 80.0,
        (2, 2))

    def plain_inner(xi, si, **kw):
        return model.apply(variables, xi, si, class_cond=class_cond,
                           image_layout="tokens", **kw)

    sched_inner = condcache.scheduled_inner_fn(
        model, variables, sigmas[:-1], b, image_layout="tokens",
        class_cond=class_cond)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run(inner_kind):
        den = Denoiser(sched_inner if inner_kind else plain_inner,
                       sigma_data=0.5)
        return sampling.sample_dpmpp_2m(den, x0, sigmas)

    ref = run(False)
    got = run(True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("sampler", ["heun", "dpmpp_2m_sde", "lms"])
def test_scheduled_whitelist_samplers_bit_identical(sampler):
    """Every sampler sample.py whitelists for the precomputed-cond path must
    produce bit-identical trajectories (heun's discarded terminal-sigma eval
    included)."""
    model = tiny_model("global")
    key = jax.random.PRNGKey(4)
    b = 2
    x_img = jax.random.normal(key, (b, 16, 16, 3))
    params = randomized_params(model, key, x_img, jnp.ones((b,)))
    variables = {"params": params}

    sigmas = sampling.get_sigmas_karras(6, 1e-2, 80.0)
    x0 = jax.random.normal(jax.random.fold_in(key, 5), (b, 16, 16, 3)) * 80.0
    k_samp = jax.random.PRNGKey(6)

    def plain_inner(xi, si, **kw):
        return model.apply(variables, xi, si, **kw)

    sched_inner = condcache.scheduled_inner_fn(model, variables, sigmas[:-1], b)

    outs = []
    for inner in (plain_inner, sched_inner):
        den = Denoiser(inner, sigma_data=0.5)
        outs.append(np.asarray(sampling.call_sampler(
            sampler, den, x0, sigmas, key=k_samp)))
    np.testing.assert_array_equal(outs[0], outs[1])


requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU for Mosaic kernels")


@requires_tpu
def test_scheduled_tpu_wide_blockspec_bit_identical():
    """On the chip the scheduled path feeds the fused Pallas kernels the
    step's FULL scales row, read via a static BlockSpec lane offset — this
    asserts that kernel path is bit-identical to the per-step projections
    at flagship-like geometry (d=128/256, d_head=64, 32x32 level-0)."""
    model = itv2.ImageTransformerDenoiserModelV2(
        levels=(
            itv2.LevelSpec(1, 128, 256,
                           itv2.NeighborhoodAttentionSpec(64, 7), 0.0),
            itv2.LevelSpec(1, 256, 512, itv2.GlobalAttentionSpec(64), 0.0),
        ),
        mapping=itv2.MappingSpec(1, 128, 256, 0.0),
        in_channels=3, out_channels=3, patch_size=(4, 4),
        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(3)
    b = 2
    x = jax.random.normal(key, (b, 128, 128, 3))
    params = randomized_params(model, key, x, jnp.ones((b,)))
    variables = {"params": params}

    sigmas = sampling.get_sigmas_karras(5, 1e-2, 80.0)
    inner = condcache.scheduled_inner_fn(model, variables, sigmas[:-1], b)
    plain = jax.jit(lambda xi, si: model.apply(variables, xi, si))
    sched = jax.jit(inner)
    for s in np.asarray(sigmas[:-1])[:2]:
        sig = jnp.full((b,), s, jnp.float32)
        ref = np.asarray(plain(x, sig))
        got = np.asarray(sched(x, sig))
        np.testing.assert_array_equal(ref, got, err_msg=f"sigma={s}")


def test_scheduled_bf16_bit_identical():
    """The bench/flagship dtype: bf16 compute — the dtype chain of the
    hoisted projections must match the in-layer sites exactly."""
    model = tiny_model("global", dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(2)
    b = 2
    x = jax.random.normal(key, (b, 16, 16, 3))
    params = randomized_params(model, key, x, jnp.ones((b,)))
    variables = {"params": params}

    sigmas = sampling.get_sigmas_karras(5, 1e-2, 80.0)
    inner = condcache.scheduled_inner_fn(model, variables, sigmas[:-1], b)
    for s in np.asarray(sigmas[:-1]):
        sig = jnp.full((b,), s, jnp.float32)
        ref = model.apply(variables, x, sig)
        got = inner(x, sig)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                      err_msg=f"sigma={s}")

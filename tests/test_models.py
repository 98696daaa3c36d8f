"""HDiT model tests: shapes, zero-init, param taxonomy, checkpointing
equivalence, gradient flow, attention-type variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

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
            itv2.LevelSpec(1, 32, 64, spec, 0.0),
            itv2.LevelSpec(1, 64, 128, itv2.GlobalAttentionSpec(32), 0.0),
        ),
        mapping=itv2.MappingSpec(1, 32, 64, 0.0),
        in_channels=3, out_channels=3, patch_size=(2, 2), **kwargs)


@pytest.mark.parametrize("attn", ["global", "neighborhood", "window", "none"])
def test_model_forward_shapes(attn):
    model = tiny_model(attn)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    variables = model.init(key, x, sigma)
    out = model.apply(variables, x, sigma)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output head
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_model_grad_flows_everywhere():
    model = tiny_model("global")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    variables = model.init(key, x, sigma)
    # randomize all params (incl. the zero-init heads, which block gradient
    # flow to everything upstream at init by construction)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.fold_in(key, 99), len(leaves))
    params = treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])

    def loss_fn(params):
        out = model.apply({"params": params}, x, sigma)
        return jnp.mean((out - x) ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = traverse_util.flatten_dict(grads)
    # FourierFeatures bases are frozen buffers (stop_gradient) by design —
    # the reference keeps them as untrained state_dict buffers too.
    zero_paths = ["/".join(p) for p, g in flat.items()
                  if float(jnp.abs(g).max()) == 0 and p[-1] != "basis"]
    assert not zero_paths, zero_paths
    frozen = [p for p in flat if p[-1] == "basis"]
    assert frozen, "expected FourierFeatures basis params in the tree"
    assert all(float(jnp.abs(flat[p]).max()) == 0 for p in frozen)


def test_checkpointing_equivalence():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    m1 = tiny_model("global", checkpointing=False)
    m2 = tiny_model("global", checkpointing=True)
    v = m1.init(key, x, sigma)
    out1 = m1.apply(v, x, sigma)
    out2 = m2.apply(v, x, sigma)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def loss1(p):
        return jnp.mean(m1.apply({"params": p}, x + 0.1, sigma) ** 2)

    def loss2(p):
        return jnp.mean(m2.apply({"params": p}, x + 0.1, sigma) ** 2)

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        g1, g2)


@pytest.mark.parametrize("policy", ["save_attn_out", "save_attn",
                                    "save_attn_qkv_raw", "dots_saveable"])
def test_remat_policy_equivalence(policy):
    """Named-residual remat policies (ops/pallas/remat_names.py) must not
    change gradients — only what is saved vs recomputed."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    m1 = tiny_model("neighborhood", checkpointing=False)
    m2 = tiny_model("neighborhood", checkpointing=True, remat_policy=policy)
    v = m1.init(key, x, sigma)

    def loss1(p):
        return jnp.mean(m1.apply({"params": p}, x + 0.1, sigma) ** 2)

    def loss2(p):
        return jnp.mean(m2.apply({"params": p}, x + 0.1, sigma) ** 2)

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        g1, g2)


@pytest.mark.parametrize("levels", [(0,), ("down_0",), ("down_0", "mid")])
def test_remat_levels_equivalence(levels):
    """Per-level and per-stack remat selections (remat_levels) must not
    change gradients — only which activations are saved vs recomputed."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    m1 = tiny_model("neighborhood", checkpointing=False)
    m2 = tiny_model("neighborhood", checkpointing=True, remat_levels=levels)
    v = m1.init(key, x, sigma)

    def loss1(p):
        return jnp.mean(m1.apply({"params": p}, x + 0.1, sigma) ** 2)

    def loss2(p):
        return jnp.mean(m2.apply({"params": p}, x + 0.1, sigma) ** 2)

    g1 = jax.grad(loss1)(v["params"])
    g2 = jax.grad(loss2)(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        g1, g2)


def test_train_eval_patch_path_parity():
    """Training patches via strided conv while eval uses the folded-einsum
    formulation (cheaper forward, lane-starved backward); with dropout 0
    both must produce the same function of the same params."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    model = tiny_model("neighborhood")
    v = model.init(key, x, sigma)
    # randomize so the zero-init output head doesn't mask patch_out behavior
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    keys = jax.random.split(jax.random.fold_in(key, 7), len(leaves))
    params = treedef.unflatten([
        jax.random.normal(k, p.shape, p.dtype) * 0.05
        for k, p in zip(keys, leaves)])
    out_eval = model.apply({"params": params}, x, sigma)
    out_train = model.apply({"params": params}, x, sigma, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(out_eval),
                               atol=1e-5)


def test_class_cond_required():
    model = tiny_model("global", num_classes=10)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 1.0])
    with pytest.raises(ValueError):
        model.init(key, x, sigma)
    v = model.init(key, x, sigma, class_cond=jnp.asarray([0, 1]))
    out = model.apply(v, x, sigma, class_cond=jnp.asarray([0, 1]))
    assert out.shape == x.shape


def test_param_group_labels_match_reference_taxonomy():
    model = tiny_model("global", num_classes=4, mapping_cond_dim=6)
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.ones((1, 16, 16, 3)), jnp.ones([1]),
                   class_cond=jnp.zeros([1], jnp.int32),
                   mapping_cond=jnp.ones([1, 6]))
    labels = traverse_util.flatten_dict(itv2.param_group_labels(v["params"]))

    def label_of(path_suffix):
        exact = [l for p, l in labels.items() if "/".join(p) == path_suffix]
        if exact:
            return exact[0]
        hits = [l for p, l in labels.items() if "/".join(p).endswith(path_suffix)]
        assert hits, path_suffix
        return hits[0]

    # reference image_transformer_v2.py:708-719 taxonomy
    assert label_of("patch_in/proj/kernel") == "wd"
    assert label_of("qkv_proj/kernel") == "wd"
    assert label_of("time_in_proj/kernel") == "no_wd"       # not apply_wd'd
    assert label_of("aug_in_proj/kernel") == "no_wd"
    assert label_of("mapping_cond_in_proj/kernel") == "no_wd"
    assert label_of("class_emb/embedding") == "no_wd"
    assert label_of("norm/mapping_linear/kernel") == "mapping_wd"  # AdaRMSNorm
    assert label_of("mapping/block_0/up_proj/kernel") == "mapping_wd"
    assert label_of("mapping/in_norm/scale") == "mapping_no_wd"
    assert label_of("self_attn/scale") == "no_wd"
    assert label_of("split_0/fac") == "no_wd"
    assert label_of("out_norm/scale") == "no_wd"


def test_dropout_train_mode():
    model = tiny_model("global")
    # rebuild with dropout
    model = itv2.ImageTransformerDenoiserModelV2(
        levels=model.levels[:1] + (model.levels[1],),
        mapping=model.mapping, in_channels=3, out_channels=3, patch_size=(2, 2))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    v = model.init(key, x, sigma)
    # deterministic: same output twice
    o1 = model.apply(v, x, sigma)
    o2 = model.apply(v, x, sigma)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_bf16_compute():
    model = tiny_model("global")
    model = itv2.ImageTransformerDenoiserModelV2(
        levels=model.levels, mapping=model.mapping, in_channels=3,
        out_channels=3, patch_size=(2, 2), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([1.0, 3.0])
    v = model.init(key, x, sigma)
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v["params"]))
    out = model.apply(v, x, sigma)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()

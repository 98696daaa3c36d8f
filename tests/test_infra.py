"""Infrastructure tests: data pipeline, checkpointing, metrics, train step,
guidance wrappers (SURVEY.md §4 golden/integration tier)."""

import json

import jax
import jax.numpy as jnp
import optax
import numpy as np
import pytest

from k_diffusion_tpu import (checkpoint, config as config_mod, data,
                             evaluation, guidance, training)

TINY_CONFIG = {
    "model": {
        "type": "image_transformer_v2",
        "input_channels": 3,
        "input_size": [16, 16],
        "patch_size": [4, 4],
        "depths": [1],
        "widths": [32],
        "self_attns": [{"type": "global", "d_head": 16}],
        "loss_weighting": "soft-min-snr",
        "sigma_data": 0.5,
        "sigma_min": 1e-2,
        "sigma_max": 80,
        "sigma_sample_density": {"type": "cosine-interpolated"},
    },
    "dataset": {"type": "synthetic", "num_classes": 4},
}


def test_synthetic_dataset_and_loader():
    ds = data.SyntheticDataset(size=16, channels=3, num_classes=4, length=50)
    assert len(ds) == 50
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert 0 <= item["class"] < 4
    # determinism
    np.testing.assert_array_equal(ds[7]["image"], ds[7]["image"])

    dl = data.DataLoader(ds, batch_size=8, num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 6  # 50 // 8, drop_last
    for b in batches:
        assert b["image"].shape == (8, 16, 16, 3)
        assert b["class"].shape == (8,)
    # next epoch reshuffles
    batches2 = list(dl)
    assert not np.array_equal(batches[0]["image"], batches2[0]["image"])


def test_mnist_idx_parser(tmp_path):
    import struct
    # write a tiny synthetic IDX pair
    imgs = np.random.randint(0, 255, (5, 28, 28), dtype=np.uint8)
    labels = np.arange(5, dtype=np.uint8)
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">3I", 5, 28, 28))
        f.write(imgs.tobytes())
    with open(tmp_path / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1))
        f.write(struct.pack(">I", 5))
        f.write(labels.tobytes())
    ds = data.MNISTDataset(tmp_path)
    assert len(ds) == 5
    item = ds[3]
    assert item["image"].shape == (28, 28, 1)
    assert item["class"] == 3
    np.testing.assert_allclose(item["image"][..., 0], imgs[3] / 255.0, atol=1e-6)


def _tiny_state():
    cfg = config_mod.load_config(TINY_CONFIG)
    model = config_mod.make_model(cfg)
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.zeros([1, 16, 16, 3]), jnp.ones([1]),
                   class_cond=jnp.zeros([1], jnp.int32))
    from k_diffusion_tpu.models import image_transformer_v2 as itv2
    labels = itv2.param_group_labels(v["params"])
    opt = training.make_optimizer(cfg, labels)
    state = training.init_train_state(
        model, opt, key,
        {"reals": jnp.zeros([2, 16, 16, 3]),
         "class_cond": jnp.zeros([2], jnp.int32)})
    return cfg, model, opt, state


def test_checkpoint_roundtrip(tmp_path, monkeypatch):
    cfg, model, opt, state = _tiny_state()
    host = {"step": 7, "config": cfg, "ema_stats": {"loss": 0.5}}
    path = checkpoint.save_checkpoint(tmp_path / "ck.ckpt", state, host)
    state2, host2 = checkpoint.load_checkpoint(path, state)
    assert host2["step"] == 7
    assert host2["ema_stats"]["loss"] == 0.5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, state2.params)
    # state json sidecar (chdir auto-restored — a leaked chdir breaks the
    # relative-config-path CLI tests that run later)
    monkeypatch.chdir(tmp_path)
    checkpoint.write_state_json("run", path)
    assert checkpoint.latest_checkpoint("run") == str(path)


def test_inference_export_roundtrip(tmp_path):
    cfg, model, opt, state = _tiny_state()
    path = checkpoint.save_inference(tmp_path / "slim.safetensors",
                                     state.ema_params, cfg)
    params, cfg2 = checkpoint.load_inference(path)
    assert cfg2["model"]["type"] == "image_transformer_v2"
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.ema_params, params)
    # config loadable directly from safetensors metadata
    cfg3 = config_mod.load_config(path)
    assert cfg3["model"]["widths"] == [32]


def test_train_step_reduces_loss():
    cfg, model, opt, state = _tiny_state()
    density = config_mod.make_sample_density(cfg["model"])
    den_factory = config_mod.make_denoiser_wrapper(cfg)
    step = training.make_train_step(model, den_factory, density, opt,
                                    num_classes=4, cond_dropout_rate=0.1,
                                    compute_gns=True)
    key = jax.random.PRNGKey(0)
    reals = jax.random.uniform(key, (1, 16, 16, 16, 3)) * 2 - 1
    batch = {"reals": reals,
             "class_cond": jax.random.randint(key, (1, 16), 0, 4)}
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(key, i), 0.95)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert metrics["grad_sq_norm_small"] >= metrics["grad_sq_norm_big"] - 1e-6


def test_fid_analytic():
    key = jax.random.PRNGKey(0)
    d = 8
    x = jax.random.normal(key, (20000, d))
    y = jax.random.normal(jax.random.fold_in(key, 1), (20000, d)) + 1.0
    # identical distributions -> ~0
    f_same = float(evaluation.fid(x, x[::-1]))
    assert abs(f_same) < 0.05
    # mean shift of 1 in every dim -> ~d
    f_shift = float(evaluation.fid(x, y))
    assert abs(f_shift - d) < 0.5


def test_kid_analytic():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4000, 16))
    y = jax.random.normal(jax.random.fold_in(key, 1), (4000, 16))
    assert abs(float(evaluation.kid(x, y))) < 0.01
    y2 = y * 2.0
    assert float(evaluation.kid(x, y2)) > 0.1


def test_sqrtm_eig():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (6, 6))
    psd = a @ a.T + jnp.eye(6)
    r = evaluation.sqrtm_eig(psd)
    np.testing.assert_allclose(np.asarray(r @ r), np.asarray(psd), atol=1e-3)


def test_compute_features():
    calls = []

    def sample_fn(n):
        calls.append(n)
        return jnp.ones([8, 4])

    feats = evaluation.compute_features(sample_fn, lambda x: x * 2, 20, 8)
    assert feats.shape == (20, 4)
    np.testing.assert_allclose(np.asarray(feats), 2.0)
    assert calls == [8, 8, 4]


def test_cfg_model_fn():
    def model(x, sigma, class_cond=None):
        # uncond (class==2) returns 0, cond returns 1
        return jnp.where((class_cond == 2)[:, None], 0.0, 1.0) * jnp.ones_like(x)

    fn = guidance.make_cfg_model_fn(model, cfg_scale=3.0, num_classes=2)
    out = fn(jnp.zeros([2, 4]), jnp.ones([2]), class_cond=jnp.zeros([2], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), 3.0)  # 0 + (1-0)*3
    # scale 1 returns the raw model
    assert guidance.make_cfg_model_fn(model, 1.0, 2) is model


def test_static_thresh_and_cond_fn():
    base = lambda x, sigma: x * 10
    thresh = guidance.make_static_thresh_model_fn(base)
    out = thresh(jnp.ones([2, 3]), jnp.ones([2]))
    np.testing.assert_allclose(np.asarray(out), 1.0)

    cond = guidance.make_cond_model_fn(
        lambda x, s: jnp.zeros_like(x),
        lambda x, s, denoised: jnp.ones_like(x))
    out = cond(jnp.zeros([2, 3]), jnp.full([2], 2.0))
    np.testing.assert_allclose(np.asarray(out), 4.0)  # 0 + 1 * sigma^2


def test_native_loader_matches_pil(tmp_path):
    from PIL import Image
    from k_diffusion_tpu import native
    if not native.available():
        pytest.skip("native data library not built")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        p = tmp_path / f"i{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    batch, fails = native.load_batch(paths, 64)
    assert fails == 0
    assert batch.shape == (4, 64, 64, 3)
    assert batch.min() >= 0 and batch.max() <= 1
    from k_diffusion_tpu.data import _load_resized
    pil = _load_resized(paths[0], 64)
    assert np.abs(pil - batch[0]).mean() < 0.01
    # corrupt file -> counted as failure, slot zero-filled
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
    batch2, fails2 = native.load_batch([bad] + paths[:1], 64)
    assert fails2 == 1
    np.testing.assert_allclose(batch2[0], 0.0)


def test_dataloader_uses_native_for_folders(tmp_path):
    from PIL import Image
    from k_diffusion_tpu import native
    if not native.available():
        pytest.skip("native data library not built")
    rng = np.random.RandomState(0)
    for i in range(10):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"i{i}.png")
    ds = data.FolderOfImages(tmp_path, 32)
    dl = data.DataLoader(ds, batch_size=4, num_workers=1)
    batch = next(iter(dl))
    assert dl._use_native()
    assert batch["image"].shape == (4, 32, 32, 3)


def test_adam8bit_tracks_adamw():
    """Blockwise int8 Adam must track fp32 Adam closely on a quadratic."""
    import optax
    from k_diffusion_tpu.optim8bit import adamw8bit

    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params8 = {"w": jnp.zeros([4096]), "b": jnp.zeros([100])}
    params32 = jax.tree_util.tree_map(jnp.copy, params8)
    opt8 = adamw8bit(1e-1)
    opt32 = optax.adamw(1e-1)
    s8, s32 = opt8.init(params8), opt32.init(params32)

    @jax.jit
    def step(params, s, opt_idx):
        g = jax.grad(loss)(params)
        return g

    for i in range(50):
        g8 = jax.grad(loss)(params8)
        u8, s8 = opt8.update(g8, s8, params8)
        params8 = optax.apply_updates(params8, u8)
        g32 = jax.grad(loss)(params32)
        u32, s32 = opt32.update(g32, s32, params32)
        params32 = optax.apply_updates(params32, u32)
    # both converge toward the optimum and agree closely
    assert abs(float(params8["w"][0]) - float(params32["w"][0])) < 0.05
    assert float(loss(params8)) < float(loss({"w": jnp.zeros([4096]), "b": jnp.zeros([100])})) * 0.1
    # int8 state really is int8
    assert s8[0].mu["w"].q.dtype == jnp.int8


def test_adam8bit_in_train_step():
    cfg = config_mod.load_config(TINY_CONFIG)
    cfg["optimizer"]["type"] = "adam8bit"
    model = config_mod.make_model(cfg)
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.zeros([1, 16, 16, 3]), jnp.ones([1]),
                   class_cond=jnp.zeros([1], jnp.int32))
    from k_diffusion_tpu.models import image_transformer_v2 as itv2
    labels = itv2.param_group_labels(v["params"])
    opt = training.make_optimizer(cfg, labels)
    state = training.init_train_state(
        model, opt, key, {"reals": jnp.zeros([2, 16, 16, 3]),
                          "class_cond": jnp.zeros([2], jnp.int32)})
    density = config_mod.make_sample_density(cfg["model"])
    den_factory = config_mod.make_denoiser_wrapper(cfg)
    step = training.make_train_step(model, den_factory, density, opt,
                                    num_classes=4, cond_dropout_rate=0.1)
    batch = {"reals": jax.random.uniform(key, (1, 8, 16, 16, 3)) * 2 - 1,
             "class_cond": jax.random.randint(key, (1, 8), 0, 4)}
    losses = []
    for i in range(10):
        state, m = step(state, batch, jax.random.fold_in(key, i), 0.95)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_flat_adamw_matches_per_leaf_chain():
    """flatopt.flat_adamw must reproduce the per-leaf optax chain
    (clip_by_global_norm -> multi_transform over 4 adamw groups) exactly,
    including a step where clipping activates."""
    cfg = config_mod.load_config(TINY_CONFIG)
    model = config_mod.make_model(cfg)
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.zeros([1, 16, 16, 3]), jnp.ones([1]),
                   class_cond=jnp.zeros([1], jnp.int32))
    from k_diffusion_tpu.models import image_transformer_v2 as itv2
    labels = itv2.param_group_labels(v["params"])
    opt_flat = training.make_optimizer(cfg, labels)  # default: flat
    opt_leaf = training.make_optimizer(cfg, labels, flat=False)
    from k_diffusion_tpu.flatopt import FlatAdamWState
    assert isinstance(opt_flat.init(v["params"]), FlatAdamWState)

    params_f = params_l = v["params"]
    s_f = opt_flat.init(params_f)
    s_l = opt_leaf.init(params_l)
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    for step in range(3):
        gkeys = jax.random.split(jax.random.fold_in(key, step), len(leaves))
        # step 0: large grads (global norm >> 1, clip active); later: small
        scale = 10.0 if step == 0 else 1e-3
        grads = treedef.unflatten([
            jax.random.normal(k, p.shape, jnp.float32) * scale
            for k, p in zip(gkeys, leaves)])
        u_f, s_f = opt_flat.update(grads, s_f, params_f)
        u_l, s_l = opt_leaf.update(grads, s_l, params_l)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-10),
            u_f, u_l)
        params_f = optax.apply_updates(params_f, u_f)
        params_l = optax.apply_updates(params_l, u_l)
    # the two parameter trajectories stay together
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8),
        params_f, params_l)


def test_dataloader_epoch_restore():
    """Each epoch's shuffle derives from DataLoader.epoch; setting it (as
    train.py does on resume) must reproduce that epoch's order instead of
    replaying epoch 0 (VERDICT r2 weak #6)."""
    ds = data.SyntheticDataset(size=8, channels=3, num_classes=4, length=40)
    dl = data.DataLoader(ds, batch_size=8, num_workers=1, seed=3)
    epoch0 = list(dl)
    epoch1 = list(dl)
    assert dl.epoch == 2
    # fresh loader restored to epoch 1 reproduces epoch 1's batches exactly
    dl2 = data.DataLoader(ds, batch_size=8, num_workers=1, seed=3)
    dl2.epoch = 1
    epoch1_restored = list(dl2)
    for a, b in zip(epoch1, epoch1_restored):
        np.testing.assert_array_equal(a["image"], b["image"])
    # ...and differs from epoch 0 (the old buggy behavior)
    assert not all(
        np.array_equal(a["image"], b["image"])
        for a, b in zip(epoch0, epoch1_restored))


def test_train_cli_resume_restores_data_epoch(tmp_path, monkeypatch):
    """On --resume, train.py must restore DataLoader.epoch from the
    checkpointed host state so the data order continues instead of
    replaying epoch 0 (reference train.py:269-293)."""
    import sys
    import train as train_cli

    name = tmp_path / "run"
    argv = ["train.py", "--config", "configs/config_test_tiny.json",
            "--batch-size", "16", "--end-step", "2", "--demo-every", "1000",
            "--save-every", "2", "--evaluate-every", "0", "--sample-n", "4",
            "--num-workers", "1", "--name", str(name)]
    monkeypatch.setattr(sys, "argv", argv)
    train_cli.main()

    # resume, injecting a nonzero checkpointed epoch
    real_load = checkpoint.load_checkpoint

    def load_with_epoch(path, state):
        state, host = real_load(path, state)
        host["epoch"] = 3
        return state, host

    seen = {}
    real_iter = data.DataLoader.__iter__

    def spy_iter(self):
        seen.setdefault("epoch", self.epoch)
        return real_iter(self)

    monkeypatch.setattr(checkpoint, "load_checkpoint", load_with_epoch)
    monkeypatch.setattr(data.DataLoader, "__iter__", spy_iter)
    argv2 = list(argv)
    argv2[argv2.index("--end-step") + 1] = "3"
    monkeypatch.setattr(sys, "argv", argv2)
    train_cli.main()
    assert seen["epoch"] == 3


def test_starvation_monitor():
    """train.py warns when the loader feeds batches slower than the device
    consumes them (>25% of wall time waiting), and stays quiet otherwise."""
    import train as train_cli

    # fast loader: 1% wait -> no warning
    mon = train_cli.StarvationMonitor()
    for _ in range(25):
        mon.record(wait_s=0.001, step_s=0.1)
    assert mon.check() is None

    # starved: 50% wait -> warning names rates; window resets after check
    for _ in range(25):
        mon.record(wait_s=0.1, step_s=0.1)
    warn = mon.check()
    assert warn is not None and "starving" in warn and "batches/s" in warn
    assert mon.check() is None  # window reset, below min_steps

    # below min_steps: never warns
    mon2 = train_cli.StarvationMonitor(min_steps=10)
    for _ in range(5):
        mon2.record(1.0, 0.1)
    assert mon2.check() is None

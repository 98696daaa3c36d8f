"""FID dress rehearsal (VERDICT r3 task #7): export RANDOM Inception weights
to the cache path the extractor loads from, then run the unmodified
``train.py --evaluate-only`` path end-to-end — extractor construction ->
reals features -> sampling -> fid/kid -> CSV row. The day real
``inception-2015-12-05.pt`` weights appear, parity measurement is one file
copy into ``$XDG_CACHE_HOME/k-diffusion/`` (reference train.py:312-329,
371-395; evaluation.py:16-31).
"""

import csv
import math
import sys

import numpy as np
import pytest


def write_random_inception_npz(path, seed=0):
    """Random weights in the exact npz layout scripts/convert_inception_weights.py
    emits: architecture-ordered torch-style (name, OIHW/1-d) pairs that
    ``inception_v3.load_npz_params`` classifies by name."""
    from k_diffusion_tpu.models import inception_v3

    rng = np.random.RandomState(seed)
    arrays = {}
    for i, shape in enumerate(inception_v3.conv_shape_order()):
        kh, kw, cin, cout = shape
        fan_in = kh * kw * cin
        arrays[f"layers.{i}.weight"] = rng.normal(
            0.0, (1.0 / fan_in) ** 0.5, (cout, cin, kh, kw)).astype(np.float32)
        arrays[f"layers.{i}.scale"] = np.ones(cout, np.float32)
        arrays[f"layers.{i}.bias"] = np.zeros(cout, np.float32)
        arrays[f"layers.{i}.running_mean"] = np.zeros(cout, np.float32)
        arrays[f"layers.{i}.running_var"] = np.ones(cout, np.float32)
    np.savez(path, **arrays)
    return path


@pytest.mark.slow
def test_evaluate_only_with_npz_cache_weights(tmp_path, monkeypatch):
    import train as train_cli

    cache_dir = tmp_path / "cache" / "k-diffusion"
    cache_dir.mkdir(parents=True)
    write_random_inception_npz(cache_dir / "inception-2015-12-05.npz")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    from pathlib import Path
    config = Path(train_cli.__file__).parent / "configs" / "config_test_tiny.json"
    name = tmp_path / "run"
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--config", str(config),
        "--batch-size", "8", "--evaluate-only", "--evaluate-n", "8",
        "--num-workers", "1", "--name", str(name)])
    train_cli.main()

    rows = list(csv.DictReader(open(f"{name}_metrics.csv")))
    assert len(rows) == 1
    fid, kid = float(rows[0]["fid"]), float(rows[0]["kid"])
    assert math.isfinite(fid) and fid > 0
    assert math.isfinite(kid)


def test_extractor_loads_npz_from_cache(tmp_path, monkeypatch):
    """The extractor falls back from .pt to the .npz export in the cache dir
    and produces finite 2048-d features (fast version of the rehearsal)."""
    import jax.numpy as jnp

    from k_diffusion_tpu import evaluation

    cache_dir = tmp_path / "cache" / "k-diffusion"
    cache_dir.mkdir(parents=True)
    write_random_inception_npz(cache_dir / "inception-2015-12-05.npz")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))

    extractor = evaluation.make_extractor("inception")
    x = jnp.zeros((2, 32, 32, 3))
    feats = extractor(x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())

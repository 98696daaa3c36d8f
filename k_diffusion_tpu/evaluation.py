"""FID/KID evaluation and feature extractors.

Re-design of reference k_diffusion/evaluation.py: the metric math (unbiased
squared MMD with cubic polynomial kernel, partitioned for memory; Fréchet
distance with eigendecomposition matrix sqrt) is pure JAX computed in f32
without fast-matmul downcasts (the reference runs these under TF32-off,
evaluation.py:114,149 — on TPU we force `highest` matmul precision).

Feature extractors: the reference downloads the StyleGAN-ADA torchscript
InceptionV3 / CLIP / DINOv2 (evaluation.py:16-77). This environment has no
network egress, so extractors load from a local cache when present:
- 'inception': the pure-JAX InceptionV3W (models/inception_v3.py) running
  ON-DEVICE, with weights converted once from the torchscript at
  $XDG_CACHE_HOME/k-diffusion/inception-2015-12-05.pt (or an .npz export);
- 'inception_torch': the torchscript executed with torch on host CPU —
  kept as the reference-parity oracle;
- 'clip' / 'dinov2': via transformers/torch.hub caches when present.
Raises RuntimeError with a clear message when weights are unavailable
(training then runs with evaluation disabled).
"""

import math
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


# --- feature extractors ---


class InceptionV3FlaxExtractor:
    """On-device InceptionV3W (models/inception_v3.py): the same FID network
    the reference runs via torchscript (reference evaluation.py:16-31), as a
    flax module so the 2048-d features are computed on the TPU. Input NHWC
    jax array in [-1, 1]; preprocessing matches the reference wrapper:
    bicubic antialiased resize to 299 in [-1, 1] space, then scale to
    [0, 255] and clamp (the network scales by (x-128)/128 internally)."""

    name = "inception"

    def __init__(self, path=None, params=None):
        from .models import inception_v3
        self.model = inception_v3.InceptionV3W()
        if params is None:
            cache = Path(os.environ.get("XDG_CACHE_HOME",
                                        Path.home() / ".cache"))
            path = Path(path) if path else (
                cache / "k-diffusion" / "inception-2015-12-05.pt")
            if not path.exists() and path.with_suffix(".npz").exists():
                # scripts/convert_inception_weights.py output (torch-free)
                path = path.with_suffix(".npz")
            if not path.exists():
                raise RuntimeError(
                    f"Inception weights not found at {path} (or .npz); no "
                    "network egress to download them — fetch "
                    "nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
                    "pretrained/metrics/inception-2015-12-05.pt elsewhere "
                    "and drop it (or its scripts/convert_inception_weights"
                    ".py .npz export) at that path")
            if str(path).endswith(".npz"):
                params = inception_v3.load_npz_params(path)
            else:
                params = inception_v3.load_torchscript_params(path)
        self.params = params
        self.size = (299, 299)
        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def __call__(self, x):
        b, _, _, ch = x.shape
        x = jax.image.resize(x, (b, *self.size, ch), method="cubic")
        if ch == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        x = jnp.clip(x * 127.5 + 127.5, 0, 255)
        return self._apply(self.params, x)


class TorchscriptInceptionExtractor:
    """StyleGAN-ADA InceptionV3W torchscript, run on host CPU via torch
    (reference evaluation.py:16-31). Input NHWC jax array in [-1, 1]."""

    name = "inception"

    def __init__(self, path=None):
        import torch
        cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
        path = Path(path) if path else cache / "k-diffusion" / "inception-2015-12-05.pt"
        if not path.exists():
            raise RuntimeError(
                f"Inception weights not found at {path}; no network egress to "
                "download them (reference URL: nvlabs-fi-cdn.nvidia.com/"
                "stylegan2-ada-pytorch/pretrained/metrics/inception-2015-12-05.pt)")
        self.torch = torch
        self.model = torch.jit.load(str(path)).eval()
        self.size = (299, 299)

    def __call__(self, x):
        torch = self.torch
        x = np.asarray(jax.device_get(x))
        t = torch.from_numpy(x).permute(0, 3, 1, 2).float()
        t = torch.nn.functional.interpolate(
            t, self.size, mode="bicubic", align_corners=False, antialias=True)
        if t.shape[1] == 1:
            t = torch.cat([t] * 3, dim=1)
        t = (t * 127.5 + 127.5).clamp(0, 255)
        with torch.no_grad():
            # the NVIDIA torchscript net exposes .layers (2048-d pooled
            # features) — same path cleanfid's InceptionV3W uses
            if hasattr(self.model, "layers"):
                feats = self.model.layers.forward(t).view(t.shape[0], -1)
            else:
                feats = self.model(t)
        return jnp.asarray(feats.float().numpy())


class CLIPFeatureExtractor:
    """CLIP image-embedding extractor (reference evaluation.py:34-54), via a
    flax CLIP vision tower from the local transformers cache. Features are
    L2-normalized and scaled by sqrt(d) exactly like the reference."""

    name = "clip"

    def __init__(self, model_name="openai/clip-vit-base-patch16", model=None):
        if model is None:
            from transformers import FlaxCLIPModel
            model = FlaxCLIPModel.from_pretrained(model_name,
                                                  local_files_only=True)
        self.model = model  # injectable for tests (tiny config-built CLIP)
        self.size = self.model.config.vision_config.image_size
        self.mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        self.std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    @classmethod
    def available_models(cls):
        return ["openai/clip-vit-base-patch16", "openai/clip-vit-base-patch32",
                "openai/clip-vit-large-patch14"]

    def __call__(self, x):
        x = (x + 1) / 2
        x = jax.image.resize(x, (x.shape[0], self.size, self.size, x.shape[-1]),
                             method="cubic")
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        x = (x - self.mean) / self.std
        feats = self.model.get_image_features(jnp.moveaxis(x, -1, 1))
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats * feats.shape[-1] ** 0.5


class DINOv2FeatureExtractor:
    """DINOv2 extractor (reference evaluation.py:57-77) via transformers'
    Dinov2Model (torch, CPU) from the local cache."""

    name = "dinov2"

    def __init__(self, model_name="facebook/dinov2-large", model=None):
        import torch
        self.torch = torch
        if model is None:
            from transformers import Dinov2Model
            model = Dinov2Model.from_pretrained(
                model_name, local_files_only=True)
        self.model = model.eval()  # injectable for tests
        self.size = 224
        self.mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        self.std = np.asarray([0.229, 0.224, 0.225], np.float32)

    @classmethod
    def available_models(cls):
        return ["facebook/dinov2-small", "facebook/dinov2-base",
                "facebook/dinov2-large", "facebook/dinov2-giant"]

    def __call__(self, x):
        torch = self.torch
        x = np.asarray(jax.device_get(x))
        x = (x + 1) / 2
        t = torch.from_numpy(x).permute(0, 3, 1, 2).float()
        t = torch.nn.functional.interpolate(
            t, (self.size, self.size), mode="bicubic", align_corners=False,
            antialias=True)
        if t.shape[1] == 1:
            t = torch.cat([t] * 3, dim=1)
        t = (t - torch.from_numpy(self.mean)[None, :, None, None])             / torch.from_numpy(self.std)[None, :, None, None]
        with torch.no_grad():
            feats = self.model(t).pooler_output.float()
        feats = torch.nn.functional.normalize(feats, dim=-1) * feats.shape[-1] ** 0.5
        return jnp.asarray(feats.numpy())


def make_extractor(name, **kwargs):
    try:
        if name == "inception":
            # on-device flax extractor; 'inception_torch' forces the
            # host-torch torchscript execution path (kept as the
            # reference-parity oracle)
            return InceptionV3FlaxExtractor(**kwargs)
        if name == "inception_torch":
            return TorchscriptInceptionExtractor(**kwargs)
        if name == "clip":
            return CLIPFeatureExtractor(**kwargs)
        if name == "dinov2":
            return DINOv2FeatureExtractor(**kwargs)
    except Exception as e:
        raise RuntimeError(
            f"feature extractor '{name}' unavailable (weights must already be "
            f"in the local cache; no network egress): {e}")
    raise ValueError(f"unknown feature extractor '{name}'")


def compute_features(sample_fn, extractor_fn, n, batch_size):
    """Sample-then-extract loop (reference evaluation.py:80-90). ``n`` counts
    GLOBAL samples. Multi-host: each process samples/extracts its own batches
    and every batch's features are all-gathered across processes (the
    accelerator.gather analog, reference evaluation.py:87), so all hosts end
    up with the identical global feature matrix."""
    world = jax.process_count()
    feats_all = []
    got = 0
    while got < n:
        cur = min(-(-(n - got) // world), batch_size)
        samples = sample_fn(cur)[:cur]
        feats = np.asarray(jax.device_get(extractor_fn(samples)))
        if world > 1:
            from jax.experimental import multihost_utils
            feats = np.asarray(multihost_utils.process_allgather(
                jnp.asarray(feats))).reshape(-1, feats.shape[-1])
        feats_all.append(feats)
        got += cur * world
    return jnp.asarray(np.concatenate(feats_all)[:n])


# --- metrics ---


def _hp(fn, *args):
    """Run a matmul-bearing fn at highest (f32-accurate) precision — the TPU
    analog of the reference's tf32_mode(matmul=False)."""
    with jax.default_matmul_precision("highest"):
        return fn(*args)


def polynomial_kernel(x, y):
    d = x.shape[-1]
    dot = x @ y.T
    return (dot / d + 1) ** 3


def squared_mmd(x, y, kernel=polynomial_kernel):
    """Unbiased squared MMD (reference evaluation.py:99-111)."""
    m = x.shape[-2]
    n = y.shape[-2]
    kxx = kernel(x, x)
    kyy = kernel(y, y)
    kxy = kernel(x, y)
    kxx_sum = kxx.sum() - jnp.trace(kxx)
    kyy_sum = kyy.sum() - jnp.trace(kyy)
    kxy_sum = kxy.sum()
    term_1 = kxx_sum / m / (m - 1)
    term_2 = kyy_sum / n / (n - 1)
    term_3 = kxy_sum * 2 / m / n
    return term_1 + term_2 - term_3


def kid(x, y, max_size=5000):
    """Partitioned unbiased KID (reference evaluation.py:114-123)."""
    def compute(x, y):
        x_size, y_size = x.shape[0], y.shape[0]
        n_partitions = math.ceil(max(x_size / max_size, y_size / max_size))
        total_mmd = jnp.zeros([], jnp.float32)
        for i in range(n_partitions):
            cur_x = x[round(i * x_size / n_partitions):
                      round((i + 1) * x_size / n_partitions)]
            cur_y = y[round(i * y_size / n_partitions):
                      round((i + 1) * y_size / n_partitions)]
            total_mmd = total_mmd + squared_mmd(cur_x, cur_y)
        return total_mmd / n_partitions
    return _hp(compute, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))


def sqrtm_eig(a):
    """PSD matrix square root via eigendecomposition (reference
    evaluation.py:126-146; differentiable through jnp.linalg.eigh's vjp)."""
    vals, vecs = jnp.linalg.eigh(a)
    return (vecs * jnp.sqrt(jnp.abs(vals))[None, :]) @ vecs.T


def fid(x, y, eps=1e-8):
    """Fréchet distance (reference evaluation.py:149-161)."""
    def compute(x, y):
        x_mean = x.mean(axis=0)
        y_mean = y.mean(axis=0)
        mean_term = jnp.sum((x_mean - y_mean) ** 2)
        x_cov = jnp.cov(x.T)
        y_cov = jnp.cov(y.T)
        eps_eye = jnp.eye(x_cov.shape[0], dtype=x_cov.dtype) * eps
        x_cov = x_cov + eps_eye
        y_cov = y_cov + eps_eye
        x_cov_sqrt = sqrtm_eig(x_cov)
        cov_term = jnp.trace(
            x_cov + y_cov - 2 * sqrtm_eig(x_cov_sqrt @ y_cov @ x_cov_sqrt))
        return mean_term + cov_term
    return _hp(compute, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))

"""Datasets and the input pipeline.

Replaces the reference's torchvision/torch DataLoader stack
(reference train.py:197-239, utils.py:388-411): plain-Python datasets
yielding HWC float images in [0, 1], and a threaded prefetching loader that
assembles numpy batches for the device. Karras augmentation runs *on the
accelerator* (vmapped pure-JAX warp; see augmentation.py) rather than in CPU
worker processes, so the loader only decodes/resizes.

Dataset types (reference train.py:203-225): imagefolder, imagefolder-class,
mnist, cifar10, huggingface, custom (importlib-loaded module), plus
'synthetic' (gaussian blobs; for tests/benchmarks without any files on disk).
MNIST/CIFAR-10 read the standard raw files (IDX / pickled batches) from
``location`` — this environment has no network egress, so there is no
auto-download.
"""

import gzip
import importlib.util
import pickle
import struct
import threading
from pathlib import Path

import numpy as np
from PIL import Image

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                  ".tiff", ".webp"}


def _load_resized(path, size):
    with open(path, "rb") as f:
        img = Image.open(f).convert("RGB")
    return _resize_center_crop(img, size)


def _resize_center_crop(img, size):
    """Bicubic resize of the short side to ``size`` + center crop
    (reference train.py:197-200)."""
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img, dtype=np.float32) / 255.0
    if x.ndim == 2:
        x = x[..., None]
    return x


class FolderOfImages:
    """Recursively finds all images in a directory; no classes
    (reference utils.py:388-411)."""

    def __init__(self, root, size):
        self.root = Path(root)
        self.size = size
        self.paths = sorted(
            p for p in self.root.rglob("*") if p.suffix.lower() in IMG_EXTENSIONS)

    def __len__(self):
        return len(self.paths)

    def image_path(self, i):
        return self.paths[i]

    def __getitem__(self, i):
        return {"image": _load_resized(self.paths[i], self.size)}


class ImageFolderWithClasses:
    """torchvision.datasets.ImageFolder semantics: class per subdirectory."""

    def __init__(self, root, size):
        self.root = Path(root)
        self.size = size
        classes = sorted(p.name for p in self.root.iterdir() if p.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            for p in sorted((self.root / c).rglob("*")):
                if p.suffix.lower() in IMG_EXTENSIONS:
                    self.samples.append((p, self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def image_path(self, i):
        return self.samples[i][0]

    def __getitem__(self, i):
        path, cls = self.samples[i]
        return {"image": _load_resized(path, self.size), "class": cls}


class MNISTDataset:
    """Reads the raw IDX files (train-images-idx3-ubyte[.gz] etc.)."""

    def __init__(self, location, size=28, train=True):
        base = Path(location)
        prefix = "train" if train else "t10k"
        for sub in ("", "MNIST/raw", "raw"):
            d = base / sub if sub else base
            if (d / f"{prefix}-images-idx3-ubyte").exists() or \
                    (d / f"{prefix}-images-idx3-ubyte.gz").exists():
                base = d
                break
        self.images = self._read_idx(base / f"{prefix}-images-idx3-ubyte")
        self.labels = self._read_idx(base / f"{prefix}-labels-idx1-ubyte")
        self.size = size

    @staticmethod
    def _read_idx(path):
        if not path.exists():
            path = path.with_suffix(path.suffix + ".gz")
        opener = gzip.open if path.suffix == ".gz" else open
        with opener(path, "rb") as f:
            magic = struct.unpack(">HBB", f.read(4))
            _, dtype_code, ndim = magic
            dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
            data = np.frombuffer(f.read(), dtype=np.uint8)
        return data.reshape(dims)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = self.images[i].astype(np.float32) / 255.0
        out = img[..., None]
        if self.size != out.shape[0]:
            pil = Image.fromarray(self.images[i])
            out = _resize_center_crop(pil, self.size)
        return {"image": out, "class": int(self.labels[i])}


class CIFAR10Dataset:
    """Reads the python-pickled batches (cifar-10-batches-py)."""

    def __init__(self, location, size=32, train=True):
        base = Path(location)
        if (base / "cifar-10-batches-py").exists():
            base = base / "cifar-10-batches-py"
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        xs, ys = [], []
        for name in files:
            with open(base / name, "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.extend(d[b"labels"])
        self.images = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = np.asarray(ys)
        self.size = size

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = self.images[i].astype(np.float32) / 255.0
        if self.size != 32:
            img = _resize_center_crop(Image.fromarray(self.images[i]), self.size)
        return {"image": img, "class": int(self.labels[i])}


class SyntheticDataset:
    """Gaussian blob images with classes — for tests and benchmarks with no
    files on disk."""

    def __init__(self, size=32, channels=3, num_classes=0, length=10000, seed=0):
        self.size = size
        self.channels = channels
        self.num_classes = num_classes
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        rng = np.random.RandomState((self.seed * 1_000_003 + i) % (2 ** 31))
        cls = rng.randint(self.num_classes) if self.num_classes else 0
        yy, xx = np.mgrid[0:self.size, 0:self.size] / self.size - 0.5
        cx, cy = rng.uniform(-0.25, 0.25, 2)
        r = 0.1 + 0.2 * (cls + 1) / max(1, self.num_classes or 1)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / r ** 2)
        img = np.repeat(blob[..., None], self.channels, axis=2).astype(np.float32)
        out = {"image": np.clip(img, 0, 1)}
        if self.num_classes:
            out["class"] = cls
        return out


class HFDataset:
    """HuggingFace datasets wrapper (reference train.py:211-215); surfaces a
    class label when ``class_key`` is configured (reference train.py:236)."""

    def __init__(self, location, size, image_key="image", class_key=None):
        from datasets import load_dataset
        self.ds = load_dataset(location)["train"]
        self.size = size
        self.image_key = image_key
        self.class_key = class_key

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        item = self.ds[i]
        img = item[self.image_key].convert("RGB")
        out = {"image": _resize_center_crop(img, self.size)}
        if self.class_key is not None:
            out["class"] = int(item[self.class_key])
        return out


def make_dataset(dataset_config, size, config_dir=None):
    """Dataset factory (reference train.py:203-225)."""
    dtype = dataset_config["type"]
    location = dataset_config.get("location", "data")
    if dtype == "imagefolder":
        return FolderOfImages(location, size)
    if dtype == "imagefolder-class":
        return ImageFolderWithClasses(location, size)
    if dtype == "mnist":
        return MNISTDataset(location, size)
    if dtype == "cifar10":
        return CIFAR10Dataset(location, size)
    if dtype == "huggingface":
        return HFDataset(location, size, dataset_config.get("image_key", "image"),
                         dataset_config.get("class_key"))
    if dtype == "synthetic":
        return SyntheticDataset(
            size=size, channels=dataset_config.get("channels", 3),
            num_classes=dataset_config.get("num_classes", 0),
            length=dataset_config.get("length", 10000))
    if dtype == "custom":
        location = (Path(config_dir or ".") / location).resolve()
        spec = importlib.util.spec_from_file_location("custom_dataset", location)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        get_dataset = getattr(module, dataset_config.get("get_dataset", "get_dataset"))
        return get_dataset(dataset_config.get("config", {}), size=size)
    raise ValueError("Invalid dataset type")


class DataLoader:
    """Shuffling, drop-last, prefetching batch loader yielding dicts of
    stacked numpy arrays ({'image': (B,H,W,C), 'class': (B,)}).

    ``process_index``/``process_count``: multi-host sharding — each process
    sees a disjoint 1/count stride of every epoch's shuffled order (the
    DistributedSampler analog; all processes shuffle with the same seed so
    the strides partition the dataset)."""

    def __init__(self, dataset, batch_size, seed=0, num_workers=4, prefetch=4,
                 drop_last=True, process_index=0, process_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        # mid-epoch resume: the next __iter__ skips this many batches (index
        # math only — nothing is decoded), then resets to 0. train.py sets it
        # from the checkpointed batch_in_epoch so a resumed run consumes
        # exactly the batches the interrupted run would have (the reference's
        # sampler-epoch restore, train.py:269-293, replays the whole epoch)
        self.start_batch = 0
        self._native_ok = None

    def _local_len(self):
        n = len(self.dataset) // self.process_count
        return n

    def __len__(self):
        n = self._local_len() // self.batch_size
        if not self.drop_last and self._local_len() % self.batch_size:
            n += 1
        return n

    def _assemble(self, idxs):
        # native fast path: one C call decodes + resizes the whole batch on a
        # C++ thread pool (file-backed datasets only)
        if self._use_native():
            from . import native
            paths = [self.dataset.image_path(int(i)) for i in idxs]
            images, failures = native.load_batch(paths, self.dataset.size)
            batch = {"image": images}
            if hasattr(self.dataset, "samples"):
                batch["class"] = np.asarray(
                    [self.dataset.samples[int(i)][1] for i in idxs], np.int32)
            return batch
        items = [self.dataset[int(i)] for i in idxs]
        batch = {"image": np.stack([it["image"] for it in items])}
        if "class" in items[0]:
            batch["class"] = np.asarray([it["class"] for it in items], np.int32)
        return batch

    def _use_native(self):
        if self._native_ok is None:
            from . import native
            self._native_ok = (hasattr(self.dataset, "image_path")
                               and native.available())
        return self._native_ok

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self.epoch)
        self.epoch += 1
        order = rng.permutation(len(self.dataset))
        if self.process_count > 1:
            order = order[self.process_index::self.process_count]
            order = order[:self._local_len()]
        n_batches = len(self)
        batch_idxs = [order[i * self.batch_size:(i + 1) * self.batch_size]
                      for i in range(n_batches)]
        start = min(self.start_batch, n_batches)
        self.start_batch = 0
        it = iter(range(start, n_batches))
        lock = threading.Lock()
        results = {}
        cv = threading.Condition()
        # bound how far ahead workers run; released as batches are consumed
        sem = threading.Semaphore(self.prefetch + self.num_workers)

        def worker():
            while True:
                sem.acquire()
                with lock:
                    j = next(it, None)
                if j is None:
                    sem.release()
                    return
                batch = self._assemble(batch_idxs[j])
                with cv:
                    results[j] = batch
                    cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        for j in range(start, n_batches):
            with cv:
                while j not in results:
                    cv.wait()
                batch = results.pop(j)
            sem.release()
            yield batch

#!/usr/bin/env python3
"""Benchmark the input pipeline against the device training rate.

Generates synthetic 512x512 JPEG + PNG corpora, then measures decode+resize
throughput at 256x256 output for (a) the native C++ loader
(native/kdtpu_data.cpp, by thread count) and (b) the PIL fallback, and
reports imgs/sec/core and the host-core budget needed to feed the measured
TPU train rate (BENCH JSON train imgs/sec/chip; reference equivalent: torch
DataLoader workers, reference train.py:238-239).

Usage: python scripts/bench_loader.py [--n 192] [--size 256] [--device-rate 782]
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_corpus(root, n, src_size=512):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        # low-frequency content so JPEG size/decode cost is realistic
        small = rng.integers(0, 256, (src_size // 8, src_size // 8, 3), np.uint8)
        img = Image.fromarray(small).resize((src_size, src_size), Image.BICUBIC)
        path = Path(root) / (f"{i:04}.jpg" if i % 2 == 0 else f"{i:04}.png")
        img.save(path, quality=90) if path.suffix == ".jpg" else img.save(path)
        paths.append(path)
    return paths


def bench_native(paths, size, n_threads, repeats=3):
    from k_diffusion_tpu import native

    if not native.available():
        return None
    native.load_batch([str(paths[0])], size, n_threads=n_threads)  # warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, failures = native.load_batch([str(p) for p in paths], size,
                                        n_threads=n_threads)
        dt = time.perf_counter() - t0
        assert failures == 0, failures
        best = max(best, len(paths) / dt)
    return best


def bench_pil(paths, size, repeats=2):
    from k_diffusion_tpu.data import _load_resized

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for p in paths:
            _load_resized(p, size)
        dt = time.perf_counter() - t0
        best = max(best, len(paths) / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--device-rate", type=float, default=782.0,
                    help="train imgs/sec/chip to compare against (BENCH_r03)")
    args = ap.parse_args()

    ncores = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as root:
        paths = make_corpus(root, args.n)
        results = {"n_images": args.n, "out_size": args.size,
                   "host_cores": ncores, "device_rate": args.device_rate}
        for t in (1, 2, 4, 8):
            rate = bench_native(paths, args.size, n_threads=t)
            if rate is None:
                results["native"] = None
                break
            results[f"native_t{t}"] = round(rate, 1)
        results["pil"] = round(bench_pil(paths[: args.n // 4], args.size), 1)

    per_core = results.get("native_t1") or results["pil"]
    results["imgs_per_sec_per_core"] = round(per_core, 1)
    results["cores_needed_per_chip"] = round(args.device_rate / per_core, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

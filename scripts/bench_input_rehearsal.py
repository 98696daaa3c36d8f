"""Production input-path dress rehearsal on the real TPU (r4 verdict #7).

Every train bench feeds synthetic on-device tensors; this script runs the
UNMODIFIED train.py CLI on the real chip with the full production input
path — disk JPEGs -> native C++ loader (native/kdtpu_data.cpp) -> on-device
Karras augmentation -> train step — and measures end-to-end imgs/sec from
the CLI's own 25-step progress prints, against a second run with a
synthetic (no-decode) dataset through the same DataLoader. On this 1-core
host the loader (~154 imgs/sec/core, PERFORMANCE.md) cannot feed the ~800
imgs/sec flagship step, so the run should be host-bound and the
StarvationMonitor warning MUST fire (reference has no such check,
reference train.py:238-239).

Usage: python scripts/bench_input_rehearsal.py [--n-images 2000] [--steps 100]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def make_jpegs(img_dir, n, size=300, seed=0):
    """Synthetic photo-like JPEGs: smooth random gradients + texture so the
    decoder does real entropy work (flat images decode unrealistically
    fast)."""
    from PIL import Image
    import numpy as np

    img_dir.mkdir(parents=True, exist_ok=True)
    existing = len(list(img_dir.glob("*.jpg")))
    if existing >= n:
        return
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(existing, n):
        f = rng.uniform(1, 6, size=(2, 3)).astype(np.float32)
        ph = rng.uniform(0, 6.28, size=(2, 3)).astype(np.float32)
        base = (np.sin(2 * 3.14159 * (f[0] * yy[..., None] + ph[0]))
                + np.sin(2 * 3.14159 * (f[1] * xx[..., None] + ph[1])))
        tex = rng.normal(0, 0.15, size=(size, size, 3)).astype(np.float32)
        img = np.clip((base / 4 + 0.5 + tex) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:05}.jpg", quality=90)


def write_config(path, dataset):
    cfg = json.loads(
        (REPO / "configs" / "config_oxford_flowers.json").read_text())
    cfg["model"]["augment_prob"] = 0.12  # exercise on-device augmentation
    cfg["dataset"] = dataset
    path.write_text(json.dumps(cfg))


def run_train(config_path, name, steps, extra=()):
    """Runs train.py; returns (imgs_per_sec, starved, log_tail) measured
    between the step-25 and final progress prints (arrival-timestamped here,
    so compile time and warmup are excluded)."""
    cmd = [sys.executable, str(REPO / "train.py"),
           "--config", str(config_path), "--batch-size", "32",
           "--end-step", str(steps + 1), "--demo-every", "0",
           "--save-every", "0", "--evaluate-every", "0",
           "--name", name, *extra]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=REPO)
    times = {}
    starved = False
    lines = []
    for line in proc.stdout:
        lines.append(line.rstrip())
        print("  |", line.rstrip(), flush=True)
        m = re.search(r"step: (\d+), loss", line)
        if m:
            times[int(m.group(1))] = time.time()
        if "starving the device" in line:
            starved = True
    proc.wait()
    if proc.returncode != 0:
        raise RuntimeError(f"train.py failed:\n" + "\n".join(lines[-20:]))
    marks = sorted(times)
    if len(marks) < 2 or marks[-1] < 50:
        raise RuntimeError(f"not enough progress prints: {marks}")
    t0, t1 = times[marks[1]], times[marks[-1]]  # skip the compile-laden 0
    ips = (marks[-1] - marks[1]) * 32 / (t1 - t0)
    return ips, starved, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=2000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/kdt_rehearsal")
    args = ap.parse_args()

    work = Path(args.workdir)
    img_dir = work / "imgs"
    print(f"writing {args.n_images} JPEGs to {img_dir} ...", flush=True)
    make_jpegs(img_dir, args.n_images)

    cfg_real = work / "config_imagefolder.json"
    write_config(cfg_real, {"type": "imagefolder", "location": str(img_dir),
                            "num_classes": 0})
    cfg_synth = work / "config_synthetic.json"
    write_config(cfg_synth, {"type": "synthetic", "num_classes": 0,
                             "length": args.n_images})

    print("=== synthetic dataset (no decode; same DataLoader) ===", flush=True)
    ips_synth, _, _ = run_train(cfg_synth, str(work / "run_synth"), args.steps)

    print("=== imagefolder + native loader + on-device augmentation ===",
          flush=True)
    ips_real, starved, _ = run_train(cfg_real, str(work / "run_real"),
                                     args.steps)

    print(json.dumps({
        "metric": "end-to-end train imgs/sec (disk JPEG -> native decode -> "
                  "on-device augment -> step) vs synthetic input",
        "imgs_per_sec_imagefolder": round(ips_real, 1),
        "imgs_per_sec_synthetic": round(ips_synth, 1),
        "host_bound_fraction": round(1 - ips_real / ips_synth, 3),
        "starvation_warning_fired": starved,
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()

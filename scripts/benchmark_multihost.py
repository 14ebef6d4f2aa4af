#!/usr/bin/env python3
"""Multi-process scaling benchmark for the device placement path
(VERDICT r3 item 3 -> MULTIHOST_r04.json).

Runs the production proxy-screen placement over a FIXED-size global
virtual-CPU mesh (8 devices) split across 1 / 2 / 4 jax.distributed
processes on this host, so the measured differences isolate the
DISTRIBUTION cost of going multi-process — the replicated-tree
engine apply plus the cross-process collectives (sharded-scatter
all-to-alls, score allgathers) — at constant compute.  Single-host CPU
cannot demonstrate compute scaling (the processes share the same
cores); the compute-scaling projection combines these distribution
costs with the measured on-chip rates (SOL_r03.json) in BASELINE.md.

Checks: every process of every group lands the IDENTICAL final
likelihood (the replicated-pipeline determinism contract), and the
multi-process likelihood equals the single-process one.

Usage:
  python scripts/benchmark_multihost.py --samples 10000 \
      [--workdir /tmp/scalebench] [--out MULTIHOST_r04.json]
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_group(nproc, aln, outdir, cores):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(pid), str(nproc), str(port), aln, outdir, str(cores)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(nproc)]
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    wall = time.time() - t0
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"nproc={nproc} worker {pid} failed:\n{out[-3000:]}")
    rows = []
    for pid in range(nproc):
        with open(os.path.join(outdir, f"mh{nproc}_p{pid}.json")) as f:
            rows.append(json.load(f))
    lks = {r["lk"] for r in rows}
    assert len(lks) == 1, f"processes disagree: {lks}"
    r0 = rows[0]
    r0["group_wall_s"] = round(wall, 2)
    return r0


def run_screen_group(nproc, rows, k, iters, outdir):
    """Screen-phase strong scaling (VERDICT r4 item 3a): N processes x
    1 pinned core x 1 virtual device each, pool sharded over `cand` —
    compute genuinely grows with N, unlike the fixed-total-device
    placement groups above."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    procs = [subprocess.Popen(
        ["taskset", "-c", str(pid % os.cpu_count()),
         sys.executable, os.path.join(HERE, "multihost_screen_worker.py"),
         str(pid), str(nproc), str(port), str(rows), str(k),
         str(iters), outdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(nproc)]
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    wall = time.time() - t0
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"screen nproc={nproc} worker {pid} failed:\n"
                f"{out[-3000:]}")
    rows_out = []
    for pid in range(nproc):
        with open(os.path.join(outdir, f"ms{nproc}_p{pid}.json")) as f:
            rows_out.append(json.load(f))
    r0 = dict(rows_out[0])
    r0["screen_step_s"] = max(r["screen_step_s"] for r in rows_out)
    r0["group_wall_s"] = round(wall, 2)
    r0.pop("pid", None)
    return r0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--workdir", default="/tmp/scalebench")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cores", type=int, default=1)
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--screen-rows", type=int, default=524288,
                    help="pool rows for the screen strong-scaling table")
    ap.add_argument("--screen-k", type=int, default=64)
    ap.add_argument("--screen-iters", type=int, default=3)
    ap.add_argument("--screen-procs", default="1,2,4",
                    help="process counts for screen scaling ('' skips)")
    ap.add_argument("--skip-placement", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    res = {"samples": args.samples, "total_devices": 8,
            "cores_per_proc": args.cores, "groups": []}
    if not args.skip_placement:
        from benchmark_scale import ensure_dataset
        aln, _truth = ensure_dataset(args.workdir, args.samples,
                                     args.seed, 1.5, 0.2, 0.05)
        base = None
        for nproc in [int(x) for x in args.procs.split(",")]:
            row = run_group(nproc, aln, args.workdir, args.cores)
            row["seq_per_s"] = round(args.samples / row["wall_s"], 1)
            if base is None:
                base = row["wall_s"]
                row["efficiency_vs_1proc"] = 1.0
            else:
                # fixed total compute: efficiency = how much of the
                # single-process throughput survives the process split
                row["efficiency_vs_1proc"] = round(
                    base / row["wall_s"], 3)
            res["groups"].append(row)
            print(json.dumps(row), flush=True)
        lks = {g["lk"] for g in res["groups"]}
        res["lk_identical_across_groups"] = len(lks) == 1
    if args.screen_procs:
        res["screen_strong_scaling"] = []
        base_step = None
        for nproc in [int(x) for x in args.screen_procs.split(",")]:
            row = run_screen_group(nproc, args.screen_rows,
                                   args.screen_k, args.screen_iters,
                                   args.workdir)
            if base_step is None:
                base_step = row["screen_step_s"]
                row["speedup_vs_1proc"] = 1.0
            else:
                row["speedup_vs_1proc"] = round(
                    base_step / row["screen_step_s"], 2)
            res["screen_strong_scaling"].append(row)
            print(json.dumps(row), flush=True)
    out = args.out or os.path.join(os.path.dirname(HERE),
                                   "MULTIHOST_r05.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

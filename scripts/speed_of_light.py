#!/usr/bin/env python3
"""Placement-kernel speed-of-light analysis on one TPU chip.

BASELINE.md asks for a "placement-kernel speed-of-light analysis per
chip": how close the batched appendProbNode scorer (the hot kernel of
placement — reference MAPLEv0.7.5.4.py:6505-6785, scored per candidate
in the reference's DFS at :8050) runs to the hardware bound on the
TPU actually attached to this host.

Work model.  The Pallas kernel (maple_tpu/ops/pallas_append.py) executes
the full {R,N,O,nuc}^2 case matrix for every (candidate entry, active
query entry) pair as masked f32 VPU work; dead query entries (N runs and
padding) are skipped with lax.cond.  Counted from the kernel body, one
pair costs ~F_PAIR VPU ops (three first-order 4-vector evolutions at 41
ops each, two 4x4 matrix-vector products, six 4-dots, one-hot builds,
case selects) plus one transcendental log:

  executed pairs = K * Npad * B1 * B2_active
  flops          = pairs * F_PAIR

Data model.  Grid = (K, Npad/128) with n fastest (candidate-lane
layout), so the candidate entry planes stream from HBM once per query:

  bytes = K * Npad * NFIELDS * B1 * 4   (P planes, f32)
        + K * B2 * NFIELDS * 4          (query scalars, SMEM)
        + K * Npad * 4                  (scores out)

Rooflines (TPU v5e / "v5 lite", 1 core):
  VPU  f32: 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 op/s
  HBM  BW : ~8.1e11 B/s

The speed-of-light time is max(flops/VPU, bytes/BW); the report gives
achieved fraction-of-light for the Pallas kernel at several candidate
tile sizes, plus the XLA scorer (ops/append_batch.py) on the same
inputs for reference.

Writes one JSON line per configuration and a summary table; artifacts
land in SOL_r<N>.json for the round record.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLE = "/root/reference/example_files/MAPLE_alignment_example.txt"

# per-pair VPU op count, hand-counted from the kernel body of
# pallas_append.py (3x evolve_down=123, mv(h2)+dots=36, 6x dot4=42,
# 2x onehot4=16, base vectors=48, overlap/case/select plumbing~=95).
# Uncertain by ~2x in each direction: Mosaic fuses mul+add into FMAs and
# CSEs repeated subexpressions (fewer issue slots than counted), while
# selects/compares occupy full slots (not FLOPs).  Treat
# fraction_of_light as an order-of-utilization estimate, not a percent.
F_PAIR = 360.0
TRANS_PER_PAIR = 1.0  # one log per pair
NFIELDS = 16

# TPU v5e single-core roofs.  VPU: 8x128 lanes x 4 ALUs x ~0.94 GHz,
# FMA credited as 2 ops -> ~7.7e12 op/s ceiling (non-FMA work halves it).
VPU_F32_OPS = 7.7e12
HBM_BYTES_S = 8.1e11


def build_inputs(n_candidates, n_queries, b1, b2, seed=0):
    """Packed candidate-upper and query tensors with real entry
    statistics: tips of the bundled example alignment, tiled out to the
    requested batch sizes with per-copy branch-length jitter (jitter
    keeps XLA from constant-folding repeated rows; entry structure —
    what drives kernel control flow — stays real)."""
    from maple_tpu.config import DerivedConfig, MapleConfig
    from maple_tpu.core import kernels as K
    from maple_tpu.core.genomelist import shorten, terminal_node_genome_list
    from maple_tpu.io.maple_format import read_maple_alignment
    from maple_tpu.ops import pack as OP
    from maple_tpu.refdata import Model, RefData

    rng = np.random.default_rng(seed)
    ref, data = read_maple_alignment(EXAMPLE)
    refd = RefData.build(ref, model="GTR")
    model = Model.initial(refd, "GTR")
    cfg = MapleConfig()
    dc = DerivedConfig.build(cfg, refd.lRef)
    ctx = K.KernelCtx(refd, model, dc)
    names = list(data)
    tips = []
    for name in names:
        v = terminal_node_genome_list(refd, data[name])
        shorten(v, dc.thresholdProb)
        if len(v) <= min(b1, b2):
            tips.append(v)
    uppers = [K.root_vector_frame(ctx, v, dc.oneMutBLen * (1 + rng.random()),
                                  True) for v in tips]
    uppers = [u for u in uppers if len(u) <= b1]
    cands = [uppers[i % len(uppers)] for i in range(n_candidates)]
    queries = [tips[i % len(tips)] for i in range(n_queries)]
    P = OP.pack_genome_lists(cands, refd.lRef, b1, False, np.float32)
    C = OP.pack_genome_lists(queries, refd.lRef, b2, False, np.float32)
    # jitter branch lengths so repeated rows are not identical tensors
    P.bl1 += (rng.random(P.bl1.shape) * P.has_bl1 * 1e-6).astype(np.float32)
    active = np.sum((C.types != OP.TYPE_N) & (C.types != OP.TYPE_PAD),
                    axis=-1)
    return refd, model, dc, P, C, float(np.mean(active))


def _chained_time(score_fn, blen, iters_hi, reps):
    """Per-execution kernel time, measured robustly on an asynchronously
    tunneled device: on this environment's 'axon' TPU platform,
    block_until_ready returns immediately and even compilation is
    deferred until a host readback demands the value — so dispatch-side
    wall clocks are meaningless.  Instead the kernel is executed
    ``iters`` times inside ONE jitted fori_loop with a data dependency
    between iterations (the carry perturbs the branch length by ~1e-20,
    which is exact-identity at f32 but opaque to the compiler), and only
    a scalar leaves the device.  Slope between iters=1 and iters=hi
    removes the tunnel roundtrip (~50 ms) and the transfer."""
    import jax
    import jax.numpy as jnp

    def runner(b0, iters):
        def body(i, carry):
            s = score_fn(b0 + carry * 1e-20)
            return s[0, 0] * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jrun = jax.jit(runner, static_argnums=1)
    b0 = jnp.float32(blen)
    float(np.asarray(jrun(b0, 1)))          # compile + warm (1-iter path)
    float(np.asarray(jrun(b0, iters_hi)))   # compile + warm (hi path)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jrun(b0, 1)))
        t1 = time.perf_counter()
        float(np.asarray(jrun(b0, iters_hi)))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (iters_hi - 1))
    return best


def run_config(n, k, b1, b2, reps, use_xla=True, iters_hi=5,
               use_pallas=True):
    import jax
    import jax.numpy as jnp

    from maple_tpu.ops.append_batch import (_grid_scores_impl,
                                            device_model_from,
                                            grid_append_scores, to_device)
    from maple_tpu.ops.pallas_append import (_pallas_scores_impl,
                                             pallas_grid_append_scores)

    refd, model, dc, P, C, b2_active = build_inputs(n, k, b1, b2)
    dm = device_model_from(model, dc, dtype=jnp.float32)
    P_dev = to_device(P, jnp.float32)
    C_dev = to_device(C, jnp.float32)
    blen = dc.oneMutBLen
    on_tpu = jax.default_backend() == "tpu"

    rows = []
    pairs = k * n * b1 * b2_active
    flops = pairs * F_PAIR
    bytes_moved = (k * n * NFIELDS * b1 * 4 + k * b2 * NFIELDS * 4
                   + k * n * 4)
    t_vpu = flops / VPU_F32_OPS
    t_hbm = bytes_moved / HBM_BYTES_S
    t_sol = max(t_vpu, t_hbm)
    bound = "vpu" if t_vpu >= t_hbm else "hbm"

    if use_pallas:
        def pallas_score(b):
            return pallas_grid_append_scores(P_dev, C_dev, b, True, dm,
                                             interpret=not on_tpu)
        dt = _chained_time(pallas_score, blen, iters_hi, reps)
        rows.append({
            "kernel": "pallas-lanes", "K": k, "N": n,
            "B1": b1, "B2": b2, "B2_active": round(b2_active, 1),
            "wall_s": round(dt, 5),
            "scores_per_s": round(k * n / dt),
            "pairs_per_s": round(pairs / dt),
            "vpu_ops_per_s": round(flops / dt),
            "sol_s": round(t_sol, 5), "sol_bound": bound,
            "fraction_of_light": round(t_sol / dt, 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    if use_xla:
        def xla_score(b):
            return grid_append_scores(P_dev, C_dev, b, True, dm)
        dt = _chained_time(xla_score, blen, iters_hi, reps)
        rows.append({
            "kernel": "xla", "K": k, "N": n, "B1": b1, "B2": b2,
            "B2_active": round(b2_active, 1), "wall_s": round(dt, 5),
            "scores_per_s": round(k * n / dt),
            "pairs_per_s": round(pairs / dt),
            "sol_s": round(t_sol, 5), "sol_bound": bound,
            "fraction_of_light": round(t_sol / dt, 4),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write JSON rows here")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--configs", default="2048,64,64,64;8192,64,64,64;"
                    "8192,128,128,128",
                    help="semicolon list of N,K,B1,B2")
    ap.add_argument("--no-xla", action="store_true")
    ap.add_argument("--no-pallas", action="store_true",
                    help="measure only the XLA scorer (lets long tunneled"
                         "-backend compiles be chunked across invocations)")
    ap.add_argument("--iters-hi", type=int, default=5)
    args = ap.parse_args()

    import jax
    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    all_rows = []
    for spec in args.configs.split(";"):
        n, k, b1, b2 = (int(x) for x in spec.split(","))
        all_rows += run_config(n, k, b1, b2, args.reps,
                               use_xla=not args.no_xla,
                               use_pallas=not args.no_pallas,
                               iters_hi=args.iters_hi)
    if args.out:
        with open(args.out, "w") as f:
            for r in all_rows:
                f.write(json.dumps(r) + "\n")
    pallas_rows = [r for r in all_rows if r["kernel"].startswith("pallas")]
    if pallas_rows:
        best = max(pallas_rows, key=lambda r: r["fraction_of_light"])
        print(f"# best {best['kernel']}: "
              f"N={best['N']} B1={best['B1']}: "
              f"{best['scores_per_s']:,} scores/s, "
              f"{best['fraction_of_light']:.1%} of light "
              f"({best['sol_bound']}-bound)", file=sys.stderr)


if __name__ == "__main__":
    main()

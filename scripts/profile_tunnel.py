#!/usr/bin/env python3
"""Profile the device-backend dispatch path: is the environment, or the
kernel, the bottleneck for the device placement pipeline?

Measures, on whatever backend JAX resolves (the tunneled TPU chip under
axon, or local CPU with --backend cpu):

  1. null-dispatch latency: round-trip of a jitted trivial op
     (``x + 1`` on a scalar), median over reps — the floor every
     device-path step pays per call;
  2. readback latency/bandwidth: device->host transfer of 4 B / 4 MB;
  3. one batched placement-scoring call at the production shape
     (the same grid_append_scores the device placer dispatches per
     placement batch), wall per call and scores/s — directly comparable
     to the on-chip cadence numbers in SOL_r03.json (which are measured
     with donated inputs inside a lax.scan, i.e. without per-call
     dispatch).

The gap between (3) and SOL_r03.json's sustained on-chip rate is the
dispatch/tunnel overhead; (1) bounds it from below.  This is the
committed artifact behind BASELINE.md's statement that the tunneled
single-chip backend, not the kernels, bounds the device path on this
host (VERDICT r2: "a claim with no committed measurement").

Usage:
  python scripts/profile_tunnel.py [--backend cpu] [--reps 30]
      [--out TUNNEL_r03.json]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_wall(fn, reps):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--K", type=int, default=128, help="entry budget")
    ap.add_argument("--B2", type=int, default=2048,
                    help="candidate-pool rows per call")
    ap.add_argument("--B1", type=int, default=32, help="queries per call")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    res = {"backend": jax.default_backend(), "device": str(dev),
           "reps": args.reps}

    # 1. null dispatch: jitted scalar add, executed once to compile
    f = jax.jit(lambda x: x + 1)
    x = jnp.float32(0.0)
    f(x).block_until_ready()
    res["null_dispatch_ms"] = round(
        median_wall(lambda: f(x).block_until_ready(), args.reps) * 1e3, 3)

    # 2. readback: 4 B and 4 MB device->host
    import numpy as np
    small = jax.device_put(jnp.zeros((), jnp.float32))
    big = jax.device_put(jnp.zeros((1024, 1024), jnp.float32))
    jax.block_until_ready((small, big))
    res["readback_4B_ms"] = round(
        median_wall(lambda: np.asarray(small), args.reps) * 1e3, 3)
    wall_big = median_wall(lambda: np.asarray(big), max(5, args.reps // 3))
    res["readback_4MB_ms"] = round(wall_big * 1e3, 3)
    res["readback_MB_per_s"] = round(4.0 / wall_big, 1)

    # 3. one production-shape placement-scoring dispatch (the per-batch
    # call of the device placer), including argument feed + readback of
    # the (B1, B2) score grid — exactly what the pipeline pays per batch
    from maple_tpu.ops.append_batch import (device_model_from,
                                            grid_append_scores, to_device)
    from __graft_entry__ import _example_state
    refd, model, dc, P, C = _example_state(n_candidates=64, n_queries=32,
                                           budget=args.K)

    def tile(arrs, n):
        return {k: jnp.asarray(np.concatenate(
            [np.asarray(v)] * (n // v.shape[0] + 1), axis=0)[:n])
            for k, v in arrs.items()}

    dm = device_model_from(model, dc, dtype=jnp.float32)
    P_dev = tile(to_device(P, jnp.float32), args.B2)
    C_dev = tile(to_device(C, jnp.float32), args.B1)
    jax.block_until_ready((P_dev, C_dev))

    def one_call():
        out = grid_append_scores(P_dev, C_dev, dc.oneMutBLen, True, dm)
        return np.asarray(out)

    one_call()  # compile
    wall = median_wall(one_call, max(5, args.reps // 3))
    scores = args.B1 * args.B2
    res["score_call_shape"] = {"B1": args.B1, "B2": args.B2, "K": args.K}
    res["score_call_ms"] = round(wall * 1e3, 2)
    res["score_call_scores_per_s"] = round(scores / wall)

    print(json.dumps(res))
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()

"""Device MXU proxy screen + engine seeded placement (the TPU fast path).

Round-3/4 measurement closed the book on exhaustive exact screening for
single-chip placement: the exact Pallas pair kernel runs ~1-5 M
scores/s at 10k-tree shapes, so screening every query against every
anchor costs ~1 ms/sample of VPU time alone — an order of magnitude
over the ≥1,100 seq/s target — and the Python host fine phase added
5-15 ms/sample on top.  This module replaces both ends:

* **Screen on the MXU, not the VPU.**  Each anchor's mid-branch vector
  and each query are embedded as sparse features over a fixed
  D-dimensional space (hashed (position, nucleotide) buckets of
  non-reference entries + genome-interval buckets for missing-data
  coverage + a bias term, extracted engine-side in C++ —
  native/maple_native.cpp feat_extract).  The screen is then ONE
  [K, D] x [D, N] matmul: qf . af = 2*|shared muts| - |anchor muts|
  + N-coverage correction, a monotone proxy (up to hash collisions) for
  the exact relative appendProbNode score.  At K=256 queries against a
  32k-row pool this is ~70 GFLOP — tens of microseconds of MXU time
  where the exact VPU screen needed seconds.
* **Decide on the engine, not in Python.**  The device returns only the
  top-M anchor rows per query; the C++ engine then runs a *seeded*
  best-first crawl from those anchors against the live tree (exact
  appendProbNode scores, minor-sequence absorption, reference stop
  rules — native E_find_best_parent_budget in seeded mode) and applies
  through the same serially-re-validated batch apply as
  engine_place_batch.  Proxy error and pipeline staleness therefore
  cost recall only, never exactness: every decision is made on live
  vectors by the exact kernels.
* **One-batch-deep pipelining.**  Batch i+1's screen is dispatched
  before batch i is applied; the engine's changed-node log
  (engine_screen_drain) tells the host which pool rows to re-export
  between screens.

Reference contract being replaced: the strictly serial stepwise
addition loop, MAPLEv0.7.5.4.py:11692-11752 with the per-sample DFS at
:7912-8293.  Multi-chip: the anchor pool (AF matrix) shards over the
candidate axis — the matmul is column-parallel and top-M reduces over
the shard axis (see parallel/mesh.py for the mesh twin).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# Feature space (must match native feat_extract's layout): bucket 0 =
# bias, [1, D_HASH) = hashed (pos, nuc), [D_HASH, D) = genome-interval
# coverage channel.  Pools of >= 2^20 rows (~500k samples) halve the
# width so the bf16 pool fits a 16 GB chip (1M x 8192 bf16 = 17 GB;
# 1M x 4096 = 8.6 GB) — hash collisions double, a recall-only cost the
# engine's exact re-scoring absorbs.  MAPLE_PROXY_D overrides.
D_HASH = 7936
G_BUCKETS = 256
D = D_HASH + G_BUCKETS


def feature_dims(cap: int, fast: bool = False):
    """(d_hash, g_buckets) for a pool of ``cap`` rows.

    The fast contract narrows the feature space 4x (D=2048): the screen
    matmul and both sparse->dense scatters scale with D, and at the
    100k shapes ([1024, 8192] x [8192, 262144]) they were the dominant
    per-batch cost (measured 615 ms/batch — ~27 ms per scatter + 24 ms
    matmul + dispatch overheads; at D=2048 the whole fused step is
    ~40 ms).  Collision rate quadruples (p99 ~30 features into 1984
    hash buckets stays <2% pairwise), a recall-only cost under the
    budgeted-quality bar — the engine re-scores every seed exactly."""
    override = os.environ.get("MAPLE_PROXY_D")
    if override:
        d = int(override)
        return d - d // 32, d // 32
    if fast:
        return 1984, 64
    if cap >= (1 << 20):
        return 3968, 128
    return D_HASH, G_BUCKETS


FMAX_ANCHOR = 192   # 2 features per mutation + bias
FMAX_QUERY = 448    # 2*muts + up to G_BUCKETS coverage + bias

_R_BUCKETS = (1024, 2048, 4096, 8192)
# Feature-axis buckets: measured counts are tiny (query p99=27, anchor
# p99=31 at 10k) while the budgets are worst-case (448/192); the device
# scatter + upload cost scales with K*F, so rows are sliced to the
# smallest bucket covering the batch max before upload (lossless — the
# export zero-fills beyond each row's count).
_F_BUCKETS = (64, 192, 448)


def _f_bucket(max_nf: int, fmax: int) -> int:
    for b in _F_BUCKETS:
        if b >= max_nf + 1 and b <= fmax:
            return b
    return fmax


@partial(jax.jit, static_argnames=("topm", "approx"),
         donate_argnums=(0, 1))
def _proxy_step(AF, valid, upd_idx, upd_fidx, upd_fw, upd_valid,
                q_fidx, q_fw, *, topm, approx=False):
    """Scatter stale anchor rows + proxy matmul + top-M in one dispatch.

    AF [cap, D] f32 (donated), valid [cap] bool (donated),
    upd_idx [R] i32 (unique rows), upd_fidx/[R, Fa] i32, upd_fw [R, Fa]
    f32, upd_valid [R] bool, q_fidx [K, Fq] i32, q_fw [K, Fq] f32.
    Returns (AF, valid, topm_scores [K, topm], topm_rows [K, topm]).

    The matmul runs over the FULL pool capacity, not an active prefix:
    on the MXU the padded rows are noise-level cost ([256, 8192] x
    [8192, 32768] f32 is ~1 ms), while a prefix ladder would multiply
    the compile variants — and each tunnel-side compile costs minutes
    on this environment.  Unassigned/invalid rows are masked to -inf
    before the top-k."""
    R = upd_idx.shape[0]
    rows = jnp.zeros((R, AF.shape[1]), jnp.float32)
    rows = rows.at[jnp.arange(R)[:, None], upd_fidx].add(upd_fw)
    AF = AF.at[upd_idx].set(rows.astype(AF.dtype))
    valid = valid.at[upd_idx].set(upd_valid)
    K = q_fidx.shape[0]
    QF = jnp.zeros((K, AF.shape[1]), jnp.float32)
    QF = QF.at[jnp.arange(K)[:, None], q_fidx].add(q_fw)
    scores = jax.lax.dot_general(
        QF.astype(AF.dtype), AF, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    if approx:
        # TPU-optimized partial-reduction top-k (recall-only cost: every
        # returned seed is exactly re-scored by the engine crawl) — the
        # exact sort-based top_k measured 24 ms vs ~7 ms at a 262k pool
        ts, ti = jax.lax.approx_max_k(scores, min(topm, AF.shape[0]),
                                      recall_target=0.95)
    else:
        ts, ti = jax.lax.top_k(scores, min(topm, AF.shape[0]))
    return AF, valid, ts, ti


@partial(jax.jit, donate_argnums=(0, 1))
def _scatter_only(AF, valid, upd_idx, upd_fidx, upd_fw, upd_valid):
    """Row scatter without a screen (initial pool build spill-over when
    the changed set exceeds the largest fused-step bucket)."""
    R = upd_idx.shape[0]
    rows = jnp.zeros((R, AF.shape[1]), jnp.float32)
    rows = rows.at[jnp.arange(R)[:, None], upd_fidx].add(upd_fw)
    AF = AF.at[upd_idx].set(rows.astype(AF.dtype))
    valid = valid.at[upd_idx].set(upd_valid)
    return AF, valid


class ProxyPool:
    """Device-resident anchor feature matrix with persistent rows.

    A node keeps its row for the whole run; new nodes append; stale or
    ineligible nodes are re-exported/invalidated via the engine's
    changed-node log.  Capacity is fixed up front from the expected
    sample count (2 nodes per placed sample), so the matmul's prefix is
    the only growing shape (pow2 ladder)."""

    def __init__(self, expected_nodes: int, mesh=None,
                 force_bf16: bool = False, fast: bool = False):
        cap = 1024
        while cap < expected_nodes:
            cap *= 2
        self.capacity = cap
        self.d_hash, self.g_buckets = feature_dims(cap, fast)
        self.D = self.d_hash + self.g_buckets
        self.node_arr = np.full(cap, -1, dtype=np.int64)
        self.row_of = {}
        self.mesh = mesh
        # f32 storage by default: bf16 rounding measurably reorders
        # near-tie candidates (-28.7 logLK at 3k with topm 64).  Pools
        # too large for f32 on a 16 GB chip (>= 512k rows ~ 200k+
        # samples) fall back to bf16 — there the halved footprint is
        # what makes the run possible at all; callers should raise topm
        # to recover recall.  MAPLE_PROXY_BF16=1 forces bf16; the fast
        # screen contract (cfg.fast) forces it too (4x MXU throughput,
        # recall-only cost under the budgeted-quality bar).
        dt = jnp.bfloat16 if (force_bf16 or cap >= 524288
                              or os.environ.get("MAPLE_PROXY_BF16")) \
            else np.float32
        if mesh is not None:
            # anchor rows shard over the candidate axis: the proxy
            # matmul is row-parallel (each device scores every query
            # against its anchor shard), top-M merges across shards —
            # the multi-chip layout of SURVEY.md §2.5
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            self.AF = jax.device_put(
                jnp.zeros((cap, self.D), dt),
                NamedSharding(mesh, P("cand", None))) \
                if jax.process_count() <= 1 else None
            if self.AF is None:
                from .mesh import put_global
                self.AF = put_global(
                    mesh, np.zeros((cap, self.D), np.float32).astype(dt),
                    P("cand", None))
                self.valid = put_global(mesh, np.zeros(cap, bool),
                                        P("cand"))
            else:
                self.valid = jax.device_put(
                    np.zeros(cap, bool), NamedSharding(mesh, P("cand")))
        else:
            self.AF = jnp.zeros((cap, self.D), dt)
            self.valid = jnp.zeros(cap, bool)

    def assign_rows(self, nodes: np.ndarray) -> Optional[np.ndarray]:
        """Rows for ``nodes`` (assigning fresh rows to new ones); None
        when capacity is exhausted."""
        rows = np.empty(len(nodes), np.int32)
        nxt = len(self.row_of)
        for i, node in enumerate(nodes):
            r = self.row_of.get(int(node))
            if r is None:
                if nxt >= self.capacity:
                    return None
                r = nxt
                self.row_of[int(node)] = r
                self.node_arr[r] = node
                nxt += 1
            rows[i] = r
        return rows


class EngineProxyPlacer:
    """Drives device-screened, engine-applied stepwise addition."""

    def __init__(self, run, eng, num_cores: int = 1,
                 batch_size: int = 256, topm: int = 64,
                 seed_budget: int = 48, mesh=None,
                 fast_screen: bool = False):
        from ..ops.append_batch import enable_compilation_cache
        enable_compilation_cache()
        self.run = run
        self.eng = eng
        # Reserve one host core for the JAX client's tunnel stream when
        # >= 3 are available: with every core inside the engine's
        # crawl/apply the device stream starves and the fetch block
        # grows ~100 ms/batch; the crawl is memory-bound, so 3 engine
        # cores measured the same place wall as 4 at 100k.
        # MAPLE_DEVICE_RESERVE_CORE=0 disables.
        self.num_cores = max(1, num_cores)
        if self.num_cores >= 3 and os.environ.get(
                "MAPLE_DEVICE_RESERVE_CORE", "1") != "0":
            self.num_cores -= 1
        self.batch_size = batch_size
        self.topm = topm
        self.seed_budget = seed_budget
        self.mesh = mesh
        # fast contract (cfg.fast): bf16 pool + approximate top-k; the
        # quality bar is the production host preset's (budgeted search),
        # so screen recall loss is acceptable and the deepened-topm
        # exactness guard below is skipped
        self.fast_screen = fast_screen
        # feature budgets grow on saturation (feat_extract truncates at
        # fmax; a truncated row mis-ranks silently, so saturation is
        # detected via the returned max feature count and the budget
        # doubles — one extra export + compile bucket, rare)
        self.fmax_anchor = FMAX_ANCHOR
        self.fmax_query = FMAX_QUERY
        n_expected = len(run.data) * 2 + 64
        self.pool = ProxyPool(n_expected, mesh=mesh,
                              force_bf16=fast_screen, fast=fast_screen)
        if self.pool.AF.dtype == jnp.bfloat16 and self.topm < 192 \
                and not fast_screen:
            # bf16 rounding reorders near-ties; a deeper seed list
            # restores the measured exact-parity margin (config.py note)
            self.topm = 192
        self.time_screen = 0.0
        self.time_place = 0.0
        self.time_export = 0.0
        self.time_wait = 0.0       # main-loop fetch-result wait
        self.time_sync_join = 0.0  # main-loop pool-sync join
        self.time_prep_wait = 0.0  # main-loop next-batch join
        self._prof = bool(os.environ.get("MAPLE_DEBUG_DEVBATCH"))
        # Screen-stall fallback: the tunneled backend intermittently
        # stalls a client stream for 10 s - 10 min (BASELINE.md r4).
        # Screen results are recall-only (every decision re-made by the
        # exact engine), so a batch whose fetch misses the deadline is
        # placed through the engine's unseeded budget crawl instead of
        # waiting — the run degrades to host-path throughput for the
        # stall's duration, never worse.  The first fetch gets a longer
        # deadline (a cold compilation cache legitimately costs ~20 s
        # per shape variant).  MAPLE_SCREEN_TIMEOUT_S=0 disables.
        self.fetch_timeout = float(os.environ.get(
            "MAPLE_SCREEN_TIMEOUT_S", "2.5"))
        # the first screen legitimately carries the pool allocation +
        # initial scatter (and, cold-cache, a ~20 s compile per shape);
        # give it a longer — but still bounded — allowance: falling
        # back just places those batches at host-path speed while the
        # screen warms up on its thread
        self.first_fetch_timeout = max(4 * self.fetch_timeout, 10.0)
        self.screen_stalls = 0
        self._stall_open = False   # circuit breaker state
        self._screen_inflight = 0  # jobs submitted, not yet completed
        # pool updates whose screen was skipped mid-stall: replayed as
        # plain scatters by the next dispatched screen job (dropping
        # them would leave those rows stale forever — the fingerprint
        # dedup records them as exported)
        self._pending_sync = []
        # Fallback/screen handshake: a batch placed unseeded FREES its
        # terminal slots, so a screen job that has not yet exported its
        # query features must skip them (checked and held under this
        # lock for the export's duration — the engine reclaims slots
        # only through _place, which marks the batch consumed first).
        import threading
        self._vids_lock = threading.Lock()
        self._consumed_vids = {}  # id(batch) -> batch (keeps id stable)

    # ------------------------------------------------------------------
    def _sync_pool(self, changed: np.ndarray):
        """Export features for ``changed`` nodes and return the padded
        scatter arrays for the next fused step (spilling oversized sets
        through _scatter_only)."""
        t0 = time.time()
        pool = self.pool
        changed = np.unique(changed)
        rows = pool.assign_rows(changed)
        if rows is None:
            raise RuntimeError("proxy pool capacity exhausted")
        idx, w, valid, max_nf, skip = self.eng.export_feats(
            changed, pool.d_hash, pool.g_buckets,
            self.fmax_anchor, use_fp=True)
        if self._prof:
            self._t_feat = getattr(self, "_t_feat", 0.0) \
                + time.time() - t0
            self._n_changed = getattr(self, "_n_changed", 0) \
                + len(changed)
            self._n_skipped = getattr(self, "_n_skipped", 0) \
                + int(skip.sum())
        while max_nf >= self.fmax_anchor:
            self.fmax_anchor *= 2
            print(f"[proxy] anchor feature budget -> "
                  f"{self.fmax_anchor}", flush=True)
            idx, w, valid, max_nf, skip = self.eng.export_feats(
                changed, pool.d_hash, pool.g_buckets,
                self.fmax_anchor)
        if skip.any():
            keep = ~skip
            rows = rows[keep]
            idx = idx[keep]
            w = w[keep]
            valid = valid[keep]
        fb = _f_bucket(max_nf, self.fmax_anchor)
        if fb < idx.shape[1]:
            idx = np.ascontiguousarray(idx[:, :fb])
            w = np.ascontiguousarray(w[:, :fb])
        self.time_export += time.time() - t0
        # spill everything beyond the largest bucket through plain
        # scatter steps (initial build only)
        spill = len(rows) > _R_BUCKETS[-1]
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from .mesh import put_global
            up = lambda a: put_global(self.mesh, a,
                                      P(*([None] * np.ndim(a))))
        else:
            up = jnp.asarray
        while len(rows) > _R_BUCKETS[-1]:
            r = _R_BUCKETS[-1]
            pool.AF, pool.valid = _scatter_only(
                pool.AF, pool.valid, up(rows[:r]), up(idx[:r]),
                up(w[:r]), up(valid[:r]))
            rows, idx, w, valid = rows[r:], idx[r:], w[r:], valid[r:]
        r = len(rows)
        r_pad = next(b for b in _R_BUCKETS if b >= max(r, 1))
        if r == 0:
            # re-write row 0 with its current content (no-op scatter)
            rows = np.zeros(1, np.int32)
            idx, w, valid2, nf0, _ = self.eng.export_feats(
                pool.node_arr[:1].astype(np.int32), pool.d_hash,
                pool.g_buckets, self.fmax_anchor)
            fb = _f_bucket(nf0, self.fmax_anchor)
            idx = np.ascontiguousarray(idx[:, :fb])
            w = np.ascontiguousarray(w[:, :fb])
            valid = valid2
            r = 1
        if r < r_pad:
            pad = r_pad - r
            rows = np.concatenate([rows, np.repeat(rows[:1], pad)])
            idx = np.concatenate([idx, np.repeat(idx[:1], pad, axis=0)])
            w = np.concatenate([w, np.repeat(w[:1], pad, axis=0)])
            valid = np.concatenate([valid, np.repeat(valid[:1], pad)])
        if spill and self._prof:
            print(f"[proxy] initial pool build spilled "
                  f"({len(changed)} rows)", flush=True)
        return rows, idx, w, valid

    def _export_queries(self, vids: np.ndarray):
        """Query-feature export for one batch (engine-side, read-only
        over the immutable terminal vectors).  MUST be called under
        _vids_lock after a consumed-check: an unseeded-fallback place
        frees the batch's terminal slots (see place_all)."""
        t0 = time.time()
        pool = self.pool
        qidx, qw, max_nf = self.eng.export_query_feats(
            vids, pool.d_hash, pool.g_buckets, self.fmax_query)
        while max_nf >= self.fmax_query:
            self.fmax_query *= 2
            print(f"[proxy] query feature budget -> "
                  f"{self.fmax_query}", flush=True)
            qidx, qw, max_nf = self.eng.export_query_feats(
                vids, pool.d_hash, pool.g_buckets, self.fmax_query)
        fbq = _f_bucket(max_nf, self.fmax_query)
        if fbq < qidx.shape[1]:
            qidx = np.ascontiguousarray(qidx[:, :fbq])
            qw = np.ascontiguousarray(qw[:, :fbq])
        K = self.batch_size
        if len(vids) < K:  # tail batch: pad with null queries
            pad = K - len(vids)
            qidx = np.concatenate(
                [qidx, np.zeros((pad, qidx.shape[1]), np.int32)])
            qw = np.concatenate(
                [qw, np.zeros((pad, qw.shape[1]), np.float32)])
        self.time_export += time.time() - t0
        return qidx, qw

    def _submit(self, vids: np.ndarray, changed=None, sync=None,
                q=None):
        """Upload one batch's queries + pool updates, dispatch the fused
        step; returns (futures, row->node snapshot).  ``sync`` accepts a
        precomputed _sync_pool result (the export overlaps the previous
        batch's device fetch in place_all); ``q`` a precomputed
        _export_queries result."""
        pool = self.pool
        rows, aidx, aw, avalid = sync if sync is not None \
            else self._sync_pool(changed)
        qidx, qw = q if q is not None else self._export_queries(vids)
        if self._prof and not getattr(self, "_nf_printed", False) \
                and len(vids) == self.batch_size:
            self._nf_printed = True
            qn = np.count_nonzero(qw, axis=1)
            an = np.count_nonzero(aw, axis=1)
            print(f"[proxy] nf query p50={np.percentile(qn, 50):.0f} "
                  f"p99={np.percentile(qn, 99):.0f} max={qn.max()}  "
                  f"anchor p50={np.percentile(an, 50):.0f} "
                  f"p99={np.percentile(an, 99):.0f} max={an.max()}",
                  flush=True)
        t0 = time.time()
        if self.mesh is not None:
            # replicated uploads onto the (possibly process-spanning)
            # mesh; the scatter + matmul partition over the sharded AF
            from jax.sharding import PartitionSpec as P

            from .mesh import put_global
            up = lambda a: put_global(self.mesh, a,
                                      P(*([None] * np.ndim(a))))
        else:
            up = jnp.asarray
        dev = (up(rows), up(aidx), up(aw), up(avalid), up(qidx), up(qw))
        t1 = time.time()
        pool.AF, pool.valid, ts, ti = _proxy_step(
            pool.AF, pool.valid, *dev, topm=self.topm,
            approx=self.fast_screen)
        dt = time.time() - t0
        self.time_screen += dt
        if self._prof:
            self._t_upload = getattr(self, "_t_upload", 0.0) + t1 - t0
            self._t_dispatch = getattr(self, "_t_dispatch", 0.0) \
                + time.time() - t1
            if dt > 1.0:
                print(f"[proxy] slow submit {dt:.1f}s (R={len(rows)}, "
                      f"cap={pool.capacity})", flush=True)
        return ts, ti, pool.node_arr.copy()

    # ------------------------------------------------------------------
    def _fetch(self, vids, fut):
        """Block on a screen's results; host copies only."""
        ts, ti, node_arr = fut
        t0 = time.time()
        if self.mesh is not None:
            from .mesh import host_fetch
            ts = host_fetch(ts)[:len(vids)]
            ti = host_fetch(ti)[:len(vids)]
        else:
            ts = np.asarray(ts)[:len(vids)]
            ti = np.asarray(ti)[:len(vids)]
        dt = time.time() - t0
        self.time_screen += dt
        if self._prof:
            self._t_block = getattr(self, "_t_block", 0.0) + dt
            if dt > 0.5:
                print(f"[proxy] slow fetch {dt:.2f}s", flush=True)
        return ts, ti, node_arr

    def _place(self, vids, first_sample: int, res, refresh_every: int,
               checkpoint=None):
        """Map screen rows to seeds and place through the engine in
        model-refresh-aligned chunks.  ``res=None`` (stalled screen)
        places unseeded through the budget crawl — same exact-apply
        contract, host-path search cost."""
        t0 = time.time()
        if res is None:
            seeds = None
        else:
            ts, ti, node_arr = res
            seeds = node_arr[ti].astype(np.int32)
            seeds[~np.isfinite(ts)] = -1
        run = self.run
        cfg = run.cfg
        eng = self.eng
        s = 0
        num = first_sample
        n = len(vids)
        while s < n:
            k = n - s
            if refresh_every:
                if num % refresh_every == 0:
                    eng.flush_pseudo_counts(run.model.pseudo_counts)
                    run.model.update_from_pseudo_counts()
                    eng.sync_model()
                k = min(k, refresh_every - num % refresh_every)
            k = min(k, cfg.saveInitialTreeEvery
                    - num % cfg.saveInitialTreeEvery)
            if seeds is None:
                eng.place_batch_vids(vids[s:s + k], num, self.num_cores)
            else:
                eng.place_batch_seeded(vids[s:s + k], num,
                                       seeds[s:s + k],
                                       self.num_cores, self.seed_budget)
            num += k
            s += k
            if checkpoint and num % cfg.saveInitialTreeEvery == 0:
                checkpoint(num)
        self.time_place += time.time() - t0
        return num

    # ------------------------------------------------------------------
    def place_all(self, distances, num_samples: int, checkpoint=None,
                  progress_every: int = 4096) -> int:
        """Place every remaining sample from ``distances`` (a list used
        as a pop()-stack of (key, name), mirroring the serial loop's
        order).  Returns the final sample count."""
        run = self.run
        eng = self.eng
        cfg = run.cfg
        refresh_every = (cfg.updateSubstMatrixEveryThisSamples
                         if cfg.model != "JC" else 0)
        eng.screen_log(True)
        start = time.time()
        n_start = num_samples
        last_print = num_samples
        # initial pool: every current node
        n_nodes = int(eng.lib.engine_node_count(eng.h))
        eng.screen_drain()  # clear the warmup log; we export all nodes
        changed = np.arange(n_nodes, dtype=np.int32)

        def next_batch():
            names = []
            for _ in range(self.batch_size):
                if not distances:
                    break
                _, sample = distances.pop()
                run.names_in_tree.append(sample)
                names.append(sample)
            if not names:
                return np.empty(0, np.int64)
            diffs = [run.data[s] for s in names]
            for s in names:
                run.data[s] = None
            return eng.terminal_vids_batch(diffs)

        vids = next_batch()
        if not len(vids):
            eng.screen_log(False)
            return num_samples
        # 1-deep terminal prefetch: the NEXT batch's terminal vectors
        # build on a prep thread while the engine places the current
        # batch (the ctypes calls release the GIL; store slot allocation
        # is mutex-guarded — same pattern as the host engine path's
        # _prep_pool).  Only the prep thread touches distances/run.data.
        from concurrent.futures import ThreadPoolExecutor
        prep_pool = ThreadPoolExecutor(max_workers=1)
        sync_pool = ThreadPoolExecutor(max_workers=1)
        screen_pool = ThreadPoolExecutor(max_workers=1)

        # The WHOLE screen round-trip (uploads + fused-step dispatch +
        # result readback) rides one worker thread: during a tunnel
        # stall the blocking call is the upload as often as the fetch,
        # so only a main loop that never touches the device can keep
        # placing through a stall.  The thread serializes pool.AF
        # ownership (single worker); its tree-reading work is limited
        # to query-feature export over immutable terminal vectors, so
        # it is safe concurrent with the engine's apply phase.
        def screen_job(job_vids, sync):
            try:
                with self._vids_lock:
                    if id(job_vids) in self._consumed_vids:
                        self._pending_sync.append(sync)
                        return None  # batch already placed via fallback
                    q = self._export_queries(job_vids)
                    pending, self._pending_sync = self._pending_sync, []
                pool = self.pool
                if pending and self.mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    from .mesh import put_global
                    up = lambda a: put_global(self.mesh, a,
                                              P(*([None] * np.ndim(a))))
                else:
                    up = jnp.asarray
                for rows, aidx, aw, avalid in pending:
                    pool.AF, pool.valid = _scatter_only(
                        pool.AF, pool.valid, up(rows), up(aidx),
                        up(aw), up(avalid))
                fut = self._submit(job_vids, sync=sync, q=q)
                return self._fetch(job_vids, fut)
            finally:
                self._screen_inflight -= 1

        # first batch's pool export runs synchronously here: its tree
        # reads must finish before any (fallback) place can mutate
        sync0 = self._sync_pool(changed)
        self._screen_inflight += 1
        pend = (vids, screen_pool.submit(screen_job, vids, sync0))
        prep_fut = prep_pool.submit(next_batch) if distances else None
        from concurrent.futures import TimeoutError as FutTimeout
        first_fetch = True
        while pend is not None:
            cur_vids, fetch_fut = pend
            # The next batch's pool sync (changed-node drain + feature
            # export) runs on its own thread while the screen is in
            # flight: the engine is idle in that window, and the export
            # is read-only over the tree.  It is joined below BEFORE
            # the place phase so it never races the engine's mutation.
            sync_fut = sync_pool.submit(
                lambda: self._sync_pool(eng.screen_drain()))
            # Wait for the CURRENT batch's screen results.  A deadline
            # miss means the stream is stalled: place this batch
            # unseeded instead (the stalled screen keeps draining on
            # its thread; screen results are recall-only, so skipping
            # them never changes exactness).
            res = None
            t_wait = time.time()
            if fetch_fut is None:
                # no screen was dispatched for this batch (breaker was
                # open): place unseeded without waiting
                pass
            elif self.fetch_timeout <= 0:
                res = fetch_fut.result()
            else:
                # circuit breaker: mid-stall, don't pay the full
                # deadline for every queued batch — probe with a short
                # timeout until a screen completes again
                if first_fetch:
                    deadline = self.first_fetch_timeout
                elif self._stall_open:
                    deadline = min(self.fetch_timeout, 0.3)
                else:
                    deadline = self.fetch_timeout
                try:
                    res = fetch_fut.result(timeout=deadline)
                    self._stall_open = False
                except FutTimeout:
                    self.screen_stalls += 1
                    self._stall_open = True
                    # mark BEFORE placing: the queued screen job must
                    # not export query features of freed terminals
                    with self._vids_lock:
                        self._consumed_vids[id(cur_vids)] = cur_vids
                    if self.screen_stalls == 1 or self._prof:
                        print(f"[proxy] screen stalled "
                              f">{deadline:.1f}s; placing "
                              f"batch via the unseeded budget crawl",
                              flush=True)
            first_fetch = False
            self.time_wait += time.time() - t_wait
            t_wait = time.time()
            nxt = prep_fut.result() if prep_fut is not None \
                else np.empty(0, np.int64)
            self.time_prep_wait += time.time() - t_wait
            t_wait = time.time()
            sync_res = sync_fut.result()  # join: tree reads done
            self.time_sync_join += time.time() - t_wait
            fetch_next = None
            if len(nxt):
                # while the breaker is open with a job already stuck in
                # flight, submitting more screens only grows the
                # stalled stream's server-side backlog (which is what
                # keeps the NEXT runs stalled too) — place unseeded
                # until the in-flight job drains
                if not (self._stall_open and self._screen_inflight >= 1):
                    self._screen_inflight += 1
                    fetch_next = screen_pool.submit(screen_job, nxt,
                                                    sync=sync_res)
                else:
                    with self._vids_lock:
                        self._consumed_vids[id(nxt)] = nxt
                        self._pending_sync.append(sync_res)
            prep_fut = prep_pool.submit(next_batch) if distances else None
            num_samples = self._place(cur_vids, num_samples, res,
                                      refresh_every, checkpoint)
            pend = (nxt, fetch_next) if len(nxt) else None
            if progress_every and num_samples - last_print \
                    >= progress_every:
                last_print = num_samples
                el = time.time() - start
                rate = (num_samples - n_start) / max(el, 1e-9)
                msg = (f"placed {num_samples} samples, {rate:.1f} seq/s "
                       f"(screen {self.time_screen:.1f}s place "
                       f"{self.time_place:.1f}s export "
                       f"{self.time_export:.1f}s)")
                if self._prof:
                    msg += (f" [upload {getattr(self, '_t_upload', 0):.1f}"
                            f" dispatch "
                            f"{getattr(self, '_t_dispatch', 0):.1f}"
                            f" block {getattr(self, '_t_block', 0):.1f}"
                            f" feat {getattr(self, '_t_feat', 0):.1f}"
                            f" rows {getattr(self, '_n_changed', 0)}"
                            f" skip {getattr(self, '_n_skipped', 0)}]")
                print(msg, flush=True)
        prep_pool.shutdown(wait=True)
        sync_pool.shutdown(wait=True)
        # a timed-out screen may still be draining a stalled stream;
        # don't hold placement completion hostage to it (the thread is
        # read-only over tree state and is joined at interpreter exit)
        screen_pool.shutdown(wait=self.screen_stalls == 0)
        if self.screen_stalls:
            print(f"[proxy] {self.screen_stalls} batch(es) fell back "
                  f"to the unseeded crawl during screen stalls",
                  flush=True)
        eng.screen_log(False)
        return num_samples

"""Python driver for the native C++ placement engine.

The engine (native/maple_native.cpp, `Engine`) runs the stepwise-addition
DFS, placement and dirty propagation entirely in C++ over store-owned
vectors — a port of maple_tpu/search/placement.py and
maple_tpu/runtime/partials.py:update_partials (reference
findBestParentForNewSample :7912-8293, placeSampleOnTree :8370-8710,
updatePartials :5479-5817).  The driver feeds it global-frame terminal
vectors, refreshes the substitution model from pseudo-counts on the same
cadence as the Python loop, and finally exports the C++ tree into the
session's PhyloTree with zero-copy vector handles.

Covers the default de-novo path only: no HnZ, no rate variation, no
error rates, no deeper-long-branch search (callers gate on
`native_engine_supported`).
"""
from __future__ import annotations

import ctypes as C

import numpy as np

from ..core import genomelist as gl
from ..core.backend import NV, NativeBackend


def native_engine_supported(run) -> bool:
    """The engine covers exactly the reference's default de-novo placement
    configuration; everything else falls back to the Python loop."""
    cfg = run.cfg
    model = run.model
    return (not cfg.HnZ
            and run.time_ctx is None
            and not model.use_rate_variation
            and not model.using_error_rate
            and not cfg.deeperSearchForLongBranches
            and not cfg.doNotPlaceNewSamples
            and len(run.data) < cfg.saveInitialTreeEvery)


class NativePlacementEngine:
    """Owns a C++ Engine for one stepwise-addition run."""

    def __init__(self, rt, root_diffs):
        assert isinstance(rt.kern, NativeBackend)
        self.rt = rt
        self.store = rt.kern.store
        self.lib = self.store.lib
        cfg = rt.cfg
        dc = rt.dc
        only_identical = (bool(cfg.errorRateSiteSpecificFile)
                          or bool(cfg.errorRateFixed)
                          or cfg.estimateErrorRate
                          or cfg.estimateSiteSpecificErrorRate
                          or cfg.supportFor0Branches or bool(cfg.HnZ))
        self.store.sync_model(rt.model)
        root_vec = self.store.from_tuples(self._terminal_tuples(root_diffs))
        self.h = C.c_void_p(self.lib.engine_create(
            self.store.h, root_vec, 0,
            0 if cfg.nonStrictStopRules else 1, cfg.allowedFails,
            dc.thresholdLogLK, dc.thresholdLogLKoptimization,
            dc.thresholdLogLKconsecutivePlacement, dc.oneMutBLen,
            dc.effectivelyNon0BLen,
            1 if only_identical else 0,
            1 if rt.use_local_reference else 0,
            cfg.maxNumDescendantsForMATClade, cfg.minNumNon4))

    def _terminal_tuples(self, diffs):
        model = self.rt.model
        return gl.terminal_node_genome_list(
            self.rt.refd, diffs,
            only_n_ambiguities=self.rt.cfg.onlyNambiguities,
            using_error_rate=model.using_error_rate,
            error_rate=model.error_rate,
            error_rates=model.error_rates)

    def place(self, diffs, sample: int) -> bool:
        """Place one sample; returns True when absorbed as a minor
        sequence."""
        vid = self.store.from_tuples(self._terminal_tuples(diffs))
        status = self.lib.engine_place(self.h, vid, sample)
        if status < 0:
            msg = self.lib.engine_error(self.h).decode()
            raise RuntimeError(f"native placement engine: {msg}")
        return status == 1

    def flush_pseudo_counts(self, pseudo_counts):
        """Move the engine's accumulated substitution counts into the
        model's pseudo-count matrix (same totals as the Python loop's
        incremental update_pseudo_counts calls)."""
        buf = np.zeros(16, np.float64)
        self.lib.engine_counts(self.h, buf.ctypes.data_as(
            C.POINTER(C.c_double)), 1)
        out = buf.reshape(4, 4).tolist()
        for i in range(4):
            for j in range(4):
                pseudo_counts[i][j] += out[i][j]

    def sync_model(self):
        self.store.sync_model(self.rt.model)

    def export_to_tree(self, stats) -> int:
        """Materialize the engine's tree into self.rt.tree (in place) and
        return the root id.  Vector handles transfer zero-copy."""
        lib, h, store = self.lib, self.h, self.store
        n = lib.engine_node_count(h)
        i32, i64, f64, u8 = np.int32, np.int64, np.float64, np.uint8
        up = np.empty(n, i32)
        c0 = np.empty(n, i32)
        c1 = np.empty(n, i32)
        dist = np.empty(n, f64)
        name = np.empty(n, i32)
        ndesc = np.empty(n, i32)
        dirty = np.empty(n, u8)
        pv = np.empty(n, i64)
        upr = np.empty(n, i64)
        upl = np.empty(n, i64)
        totup = np.empty(n, i64)
        n_minor = np.empty(n, i32)
        n_muts = np.empty(n, i32)

        def P(a, t):
            return a.ctypes.data_as(C.POINTER(t))

        lib.engine_export_nodes(
            h, P(up, C.c_int32), P(c0, C.c_int32), P(c1, C.c_int32),
            P(dist, C.c_double), P(name, C.c_int32), P(ndesc, C.c_int32),
            P(dirty, C.c_uint8), P(pv, C.c_int64), P(upr, C.c_int64),
            P(upl, C.c_int64), P(totup, C.c_int64), P(n_minor, C.c_int32),
            P(n_muts, C.c_int32))

        tree = self.rt.tree
        up_l = up.tolist()
        c0_l = c0.tolist()
        c1_l = c1.tolist()
        name_l = name.tolist()
        tree.up = [u if u >= 0 else None for u in up_l]
        tree.children = [[] if a < 0 else [a, b]
                         for a, b in zip(c0_l, c1_l)]
        tree.dist = dist.tolist()
        tree.name = [m if m >= 0 else "" for m in name_l]
        tree.nDesc = ndesc.tolist()
        tree.dirty = [bool(x) for x in dirty.tolist()]
        tree.replacements = [0] * n
        tree.minorSequences = [[] for _ in range(n)]
        tree.mutations = [[] for _ in range(n)]
        for node in np.nonzero(n_minor)[0].tolist():
            buf = np.empty(int(n_minor[node]), i32)
            lib.engine_export_minor(h, node, P(buf, C.c_int32))
            tree.minorSequences[node] = buf.tolist()
        for node in np.nonzero(n_muts)[0].tolist():
            buf = np.empty(int(n_muts[node]) * 3, i32)
            lib.engine_export_muts(h, node, P(buf, C.c_int32))
            flat = buf.tolist()
            tree.mutations[node] = [tuple(flat[k:k + 3])
                                    for k in range(0, len(flat), 3)]

        def wrap(arr):
            return [NV(store, int(v)) if v >= 0 else None for v in arr]

        tree.probVect = wrap(pv)
        tree.probVectUpRight = wrap(upr)
        tree.probVectUpLeft = wrap(upl)
        tree.probVectTotUp = wrap(totup)

        sbuf = np.zeros(7, f64)
        lib.engine_stats(h, P(sbuf, C.c_double))
        stats.num_minors_found += int(sbuf[0])
        stats.total_missed_minors += int(sbuf[1])
        stats.sum_child_lks += float(sbuf[2])
        stats.num_child_lks += int(sbuf[3])
        if sbuf[4] and not stats.warned_blen:
            stats.warned_blen = True
            print("\n WARNING: found branch of length " + str(sbuf[5])
                  + " ; at high divergence MAPLE-style inference struggles "
                  "in accuracy and speed; a traditional phylogenetic "
                  "approach may fit better.\n")
        self.rt.num_refs += int(sbuf[6])
        root = int(lib.engine_root(h))
        lib.engine_free(h)
        self.h = None
        return root

"""Tests for the MXU proxy screen + engine seeded placement path
(maple_tpu/parallel/proxy_placer.py + native engine_place_batch_seeded).

The proxy screen is recall-only machinery — every decision is made by
the engine's exact kernels against live vectors — so the contract
tested here is stronger than the generic device-placement tolerance:
on the example alignment the proxy path reproduces the serial engine's
final likelihood EXACTLY (measured property; it also holds at 3k and
10k scale, DEVICE_r04.json).
"""
import os

import numpy as np
import pytest

from maple_tpu.config import MapleConfig
from maple_tpu.pipeline import Run

EXAMPLE = "/root/reference/example_files/MAPLE_alignment_example.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(EXAMPLE), reason="example data not available")


def _lk(run):
    run.rt.recalculate_all(run.root)
    return run.rt.calculate_tree_likelihood(run.root)


@pytest.mark.parametrize("model", ["GTR", "UNREST"])
def test_proxy_path_exact_lk(tmp_path, model):
    cfg_s = MapleConfig(input=EXAMPLE, output=str(tmp_path / "ser"),
                        model=model, overwrite=True)
    rs = Run(cfg_s)
    rs.load()
    rs.build_initial_tree()
    cfg_d = MapleConfig(input=EXAMPLE, output=str(tmp_path / "dev"),
                        model=model, overwrite=True,
                        device_placement=True, device_warmup=16,
                        device_proxy_batch=32)
    rd = Run(cfg_d)
    rd.load()
    rd.build_initial_tree_device(warmup=16)
    assert _lk(rd) == pytest.approx(_lk(rs), abs=1e-6)
    assert rd.stats.num_minors_found == rs.stats.num_minors_found


def test_query_features_cover_mutations(tmp_path):
    """Every concrete mutation in a query must emit a hash feature (the
    round-4 e.type/e.val confusion emitted none and silently degraded
    the screen to noise — this pins the extraction)."""
    from maple_tpu.native.engine import NativePlacementEngine
    from maple_tpu.parallel.proxy_placer import (D_HASH, G_BUCKETS,
                                                 FMAX_QUERY)
    from maple_tpu.runtime.partials import TreeRuntime
    from maple_tpu.runtime.tree import PhyloTree

    cfg = MapleConfig(input=EXAMPLE, output=str(tmp_path / "ft"),
                      model="GTR", overwrite=True)
    run = Run(cfg)
    run.load()
    distances = run.sorted_distances()
    _, first = distances.pop()
    tree = PhyloTree(use_hnz=False)
    tree.add_node()
    tree.name[-1] = 0
    run.tree = tree
    run.rt = TreeRuntime(tree, run.refd, run.model, run.dc, cfg)
    eng = NativePlacementEngine(run.rt, run.data[first])

    # a query with two concrete non-reference mutations and one N run
    letters = "acgt"
    m1 = letters[(run.refd.ref_indices[99] + 1) % 4]
    m2 = letters[(run.refd.ref_indices[28999] + 1) % 4]
    diffs = [(m1, 100), ("n", 2000, 500), (m2, 29000)]
    vid = eng.terminal_vid(diffs)
    idx, w, max_nf = eng.export_query_feats(
        np.asarray([vid], np.int64), D_HASH, G_BUCKETS, FMAX_QUERY)
    live = w[0] != 0
    li, lw = idx[0][live], w[0][live]
    # bias
    assert li[0] == 0 and lw[0] == 1.0
    # two mutation hash features at weight 2 in [1, D_HASH)
    muts = [(i, x) for i, x in zip(li, lw) if 1 <= i < D_HASH]
    assert len(muts) == 2 and all(x == 2.0 for _, x in muts)
    # N-coverage features in the interval channel summing to ~500/width
    cov = [(i, x) for i, x in zip(li, lw) if i >= D_HASH]
    width = 29903 / G_BUCKETS
    assert sum(x for _, x in cov) == pytest.approx(500 / width, rel=0.1)


def test_anchor_features_match_query(tmp_path):
    """A placed clade's anchor rows share hash buckets with a query
    carrying the same mutations (shared-mutation dot product > 0)."""
    from maple_tpu.native.engine import NativePlacementEngine
    from maple_tpu.parallel.proxy_placer import (D, D_HASH, G_BUCKETS,
                                                 FMAX_ANCHOR, FMAX_QUERY)
    from maple_tpu.runtime.partials import TreeRuntime
    from maple_tpu.runtime.tree import PhyloTree

    cfg = MapleConfig(input=EXAMPLE, output=str(tmp_path / "am"),
                      model="GTR", overwrite=True)
    run = Run(cfg)
    run.load()
    distances = run.sorted_distances()
    _, first = distances.pop()
    tree = PhyloTree(use_hnz=False)
    tree.add_node()
    tree.name[-1] = 0
    run.tree = tree
    run.rt = TreeRuntime(tree, run.refd, run.model, run.dc, cfg)
    eng = NativePlacementEngine(run.rt, run.data[first])
    num = 1
    while distances and num < 60:
        _, s = distances.pop()
        eng.place(run.data[s], num)
        run.data[s] = None
        num += 1
    n_nodes = int(eng.lib.engine_node_count(eng.h))
    nodes = np.arange(n_nodes, dtype=np.int32)
    aidx, aw, avalid, _, _ = eng.export_feats(nodes, D_HASH, G_BUCKETS,
                                              FMAX_ANCHOR)
    assert avalid.sum() > 10
    AF = np.zeros((n_nodes, D), np.float32)
    np.add.at(AF, (np.arange(n_nodes)[:, None], aidx), aw)
    # query = one of the remaining samples (same lineage: shares muts)
    _, s = distances.pop()
    vid = eng.terminal_vid(run.data[s])
    qidx, qw, _ = eng.export_query_feats(
        np.asarray([vid], np.int64), D_HASH, G_BUCKETS, FMAX_QUERY)
    QF = np.zeros((1, D), np.float32)
    np.add.at(QF, (np.zeros((1, qidx.shape[1]), int), qidx), qw)
    proxy = (QF @ AF.T)[0]
    proxy[~avalid] = -np.inf
    # shared-lineage anchors must clear the no-information score (bias
    # only): the best anchor shares mutations with the query
    assert proxy.max() > 0.5


def test_proxy_path_bf16_pool_exact_lk(tmp_path, monkeypatch):
    """bf16 pool fallback (MAPLE_PROXY_BF16=1, the >=512k-row large-pool
    path) must hold exact serial-LK parity on the example via the
    deepened top-M guard (ProxyPool docstring: bf16 rounding reorders
    near-tie candidates; topm is raised to 192 to recover the margin).
    Exactness contract: reference findBestParentForNewSample
    MAPLEv0.7.5.4.py:7912-8293."""
    monkeypatch.setenv("MAPLE_PROXY_BF16", "1")
    import jax.numpy as jnp

    from maple_tpu.parallel import proxy_placer as PP
    cfg_s = MapleConfig(input=EXAMPLE, output=str(tmp_path / "ser"),
                        model="UNREST", overwrite=True)
    rs = Run(cfg_s)
    rs.load()
    rs.build_initial_tree()
    cfg_d = MapleConfig(input=EXAMPLE, output=str(tmp_path / "dev"),
                        model="UNREST", overwrite=True,
                        device_placement=True)
    rd = Run(cfg_d)
    rd.load()
    pools = []
    orig = PP.ProxyPool.__init__

    def spy(self, *a, **k):
        orig(self, *a, **k)
        pools.append(self)
    monkeypatch.setattr(PP.ProxyPool, "__init__", spy)
    rd.build_initial_tree_device()
    assert pools and pools[0].AF.dtype == jnp.bfloat16
    assert _lk(rd) == pytest.approx(_lk(rs), abs=1e-6)
    assert rd.stats.num_minors_found == rs.stats.num_minors_found


def test_proxy_path_bf16_pool_exact_lk_b3000(tmp_path, monkeypatch):
    """The bf16 + deepened-top-M combination on the REAL b1429
    3,000-sample data — the exact configuration where plain bf16 with
    topm 64 measured -28.7 logLK (proxy_placer.ProxyPool note) before
    the top-M deepening restored parity."""
    aln = os.path.join(os.path.dirname(__file__),
                       "data_b1429_3000.maple.gz")
    if not os.path.isfile(aln):
        pytest.skip("b3000 data not available")
    monkeypatch.setenv("MAPLE_PROXY_BF16", "1")
    import jax.numpy as jnp

    from maple_tpu.parallel.proxy_placer import ProxyPool
    cfg_s = MapleConfig(input=aln, output=str(tmp_path / "ser"),
                        model="UNREST", overwrite=True)
    rs = Run(cfg_s)
    rs.load()
    rs.build_initial_tree()
    cfg_d = MapleConfig(input=aln, output=str(tmp_path / "dev"),
                        model="UNREST", overwrite=True,
                        device_placement=True)
    rd = Run(cfg_d)
    rd.load()
    rd.build_initial_tree_device()
    assert ProxyPool(64).AF.dtype == jnp.bfloat16  # env knob active
    assert _lk(rd) == pytest.approx(_lk(rs), abs=1e-6)
    assert rd.stats.num_minors_found == rs.stats.num_minors_found


def test_proxy_path_exact_lk_b3000(tmp_path):
    """Default knobs must hold exact serial-LK parity on the REAL
    b1429 3,000-sample data, not just the synthetic sets (the
    round-4 topm=64 default was exact on synthetic 10k but lost
    28.7 logLK here — ties structure differs across datasets)."""
    aln = os.path.join(os.path.dirname(__file__),
                       "data_b1429_3000.maple.gz")
    if not os.path.isfile(aln):
        pytest.skip("b3000 data not available")
    cfg_s = MapleConfig(input=aln, output=str(tmp_path / "ser"),
                        model="UNREST", overwrite=True)
    rs = Run(cfg_s)
    rs.load()
    rs.build_initial_tree()
    cfg_d = MapleConfig(input=aln, output=str(tmp_path / "dev"),
                        model="UNREST", overwrite=True,
                        device_placement=True)
    rd = Run(cfg_d)
    rd.load()
    rd.build_initial_tree_device()
    assert _lk(rd) == pytest.approx(_lk(rs), abs=1e-6)
    assert rd.stats.num_minors_found == rs.stats.num_minors_found

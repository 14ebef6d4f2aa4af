"""Device-screened SPR proposals (maple_tpu/parallel/batch_spr.py).

The screen's contract: proposals may be imprecise (f32, fixed-blen
appends) because the serial apply re-validates every move through the
exact per-node driver — so the tests pin (a) the scoring kernel's
numeric equivalence, (b) the subtree mask's correctness, and (c) the
end-to-end quality (final LK against the serial golden).
"""
import math
import os
import random

import numpy as np
import pytest

import jax

from maple_tpu.config import DerivedConfig, MapleConfig
from maple_tpu.core import kernels as K
from maple_tpu.ops import pack as OP
from maple_tpu.refdata import Model, RefData

from test_kernels_vs_reference import build_ctx, random_genome_list

EXAMPLE = "/root/reference/example_files/MAPLE_alignment_example.txt"


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_grid_var_scores_match_host(refmod, x64):
    """grid_append_scores_var (per-query blen + tip flag) against the
    exact host kernel in f64."""
    import jax.numpy as jnp
    from maple_tpu.ops import append_batch as AB

    ctx, rm = build_ctx(refmod, "GTR", False, "none", seed=23)
    refd = RefData.build(refmod.ref, model="GTR")
    model = Model.initial(refd, "GTR")
    model.mut_matrix = [list(r) for r in ctx.mut_matrix]
    cfg = MapleConfig(model="GTR")
    dc = DerivedConfig.build(cfg, refd.lRef)
    dm = AB.device_model_from(model, dc, dtype=jnp.float64)

    rng = random.Random(3)
    n_cand, n_q = 6, 5
    cands = [random_genome_list(rng, ctx.lRef, False, upper=True)
             for _ in range(n_cand)]
    queries = [random_genome_list(rng, ctx.lRef, False)
               for _ in range(n_q)]
    blens = [rng.choice([0.0, 3.3e-5, 1e-4]) for _ in range(n_q)]
    tips = [rng.random() < 0.5 for _ in range(n_q)]
    B = OP.budget_for(cands + queries)
    P = AB.to_device(OP.pack_genome_lists(cands, ctx.lRef, B, False),
                     dtype=jnp.float64)
    C = AB.to_device(OP.pack_genome_lists(queries, ctx.lRef, B, False),
                     dtype=jnp.float64)
    dev = np.asarray(AB.grid_append_scores_var(P, C, blens, tips, dm))
    assert dev.shape == (n_q, n_cand)
    n_checked = 0
    for k in range(n_q):
        for j in range(n_cand):
            h = K.append_prob_node(ctx, cands[j], queries[k], tips[k],
                                   blens[k])
            d = dev[k, j]
            n_checked += 1
            if math.isinf(h):
                assert math.isinf(d) or d < -1e250, (h, d)
            else:
                assert abs(h - d) < 1e-6 * max(1.0, abs(h)), (k, j, h, d)
    assert n_checked == n_q * n_cand


def test_euler_interval_subtree_mask():
    """tin/tout intervals classify subtree membership exactly (an SPR
    move must not re-attach a subtree below itself)."""
    from maple_tpu.parallel.batch_spr import _euler_intervals
    from maple_tpu.runtime.tree import PhyloTree

    rng = random.Random(5)
    tree = PhyloTree()
    root = tree.add_node()
    leaves = [root]
    for _ in range(25):  # random binary expansion
        leaf = rng.choice(leaves)
        leaves.remove(leaf)
        for _ in range(2):
            c = tree.add_node()
            tree.up[c] = leaf
            tree.children[leaf].append(c)
            leaves.append(c)
    tin, tout = _euler_intervals(tree, root)

    def in_subtree(a, q):
        n = a
        while n is not None:
            if n == q:
                return True
            n = tree.up[n]
        return False

    for q in range(len(tree.up)):
        for a in range(len(tree.up)):
            assert (tin[q] <= tin[a] < tout[q]) == in_subtree(a, q), (q, a)


def test_device_topology_full_pipeline_lk(tmp_path):
    """Full --deviceTopology pipeline on the example: the screen's
    proposals + serial re-validated applies must land the final LK
    within 1.0 of the serial golden (measured delta: 0.0)."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    from maple_tpu.pipeline import run_inference
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "example_gtr_LK.txt")
    if not os.path.isfile(golden):
        pytest.skip("golden not generated")
    out = str(tmp_path / "devtopo")
    cfg = MapleConfig(input=EXAMPLE, output=out, model="GTR",
                      overwrite=True, device_topology=True)
    run_inference(cfg)
    with open(out + "_LK.txt") as f:
        lk = float(f.read().strip())
    with open(golden) as f:
        lk_gold = float(f.read().strip())
    assert abs(lk - lk_gold) <= 1.0, (lk, lk_gold)


def test_device_topology_pallas_screen_lk(tmp_path):
    """--deviceTopology --devicePallas: the screen scored by the Pallas
    var-params kernel (interpret mode off-TPU) must land the same final
    LK as the XLA screen — the screen only proposes; the serial apply
    re-validates."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    from maple_tpu.pipeline import run_inference
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "example_gtr_LK.txt")
    if not os.path.isfile(golden):
        pytest.skip("golden not generated")
    out = str(tmp_path / "devtopo_pal")
    cfg = MapleConfig(input=EXAMPLE, output=out, model="GTR",
                      overwrite=True, device_topology=True,
                      device_pallas=True)
    run_inference(cfg)
    with open(out + "_LK.txt") as f:
        lk = float(f.read().strip())
    with open(golden) as f:
        lk_gold = float(f.read().strip())
    assert abs(lk - lk_gold) <= 1.0, (lk, lk_gold)


def test_device_topology_exact_screen_fallback(tmp_path):
    """MAPLE_SPR_EXACT=1 forces the exhaustive exact Pallas screen (the
    python-kernel fallback / proxy-recall validator); it must land the
    same golden LK as the proxy screen."""
    if not os.path.isfile(EXAMPLE):
        pytest.skip("example data not available")
    from maple_tpu.pipeline import run_inference
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "example_gtr_LK.txt")
    if not os.path.isfile(golden):
        pytest.skip("golden not generated")
    out = str(tmp_path / "devtopo_exact")
    os.environ["MAPLE_SPR_EXACT"] = "1"
    try:
        cfg = MapleConfig(input=EXAMPLE, output=out, model="GTR",
                          overwrite=True, device_topology=True)
        run_inference(cfg)
    finally:
        os.environ.pop("MAPLE_SPR_EXACT", None)
    with open(out + "_LK.txt") as f:
        lk = float(f.read().strip())
    with open(golden) as f:
        lk_gold = float(f.read().strip())
    assert abs(lk - lk_gold) <= 1.0, (lk, lk_gold)

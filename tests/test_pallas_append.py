"""Pallas placement-scoring kernel vs the XLA kernel and the host kernel.

Runs the Pallas kernel in interpreter mode on CPU in float64 (the entry-pair
formulation is exact; only summation order differs from the host path), so
tolerances are tight.  On real TPU hardware the same kernel compiles via
Mosaic in float32.
"""
import math
import random

import numpy as np
import pytest

import jax

from maple_tpu.config import DerivedConfig, MapleConfig
from maple_tpu.core import kernels as K
from maple_tpu.ops import pack as OP
from maple_tpu.refdata import Model, RefData

from test_kernels_vs_reference import build_ctx, random_genome_list
from test_ops_batched import MODES, x64  # noqa: F401  (fixture reuse)


@pytest.mark.parametrize("model_name,rate_var,error_mode", MODES)
def test_pallas_append_matches_host_and_xla(refmod, x64, model_name,  # noqa: F811
                                            rate_var, error_mode):
    import jax.numpy as jnp
    from maple_tpu.ops import append_batch as AB
    from maple_tpu.ops import pallas_append as PA

    ctx, rm = build_ctx(refmod, model_name, rate_var, error_mode, seed=23)
    refd = RefData.build(refmod.ref, model=model_name)
    model = Model.initial(refd, model_name)
    model.mut_matrix = [list(r) for r in ctx.mut_matrix]
    model.use_rate_variation = ctx.use_rate_variation
    if ctx.use_rate_variation:
        model.site_rates = [ctx.mut_matrices[i][0][1] / ctx.mut_matrix[0][1]
                            for i in range(refd.lRef)]
    model.using_error_rate = ctx.using_error_rate
    model.error_rate_site_specific = ctx.error_rate_site_specific
    model.error_rate = ctx.error_rate
    model.error_rates = ctx.error_rates
    model.tot_error = ctx.tot_error
    cfg = MapleConfig(model=model_name)
    dc = DerivedConfig.build(cfg, refd.lRef)
    dm = AB.device_model_from(model, dc, dtype=jnp.float64)

    rng = random.Random(41)
    n_checked = 0
    for trial in range(4):
        n_cand = 8
        cands = [random_genome_list(rng, ctx.lRef, ctx.using_error_rate,
                                    upper=True) for _ in range(n_cand)]
        queries = [random_genome_list(rng, ctx.lRef, ctx.using_error_rate)
                   for _ in range(2)]
        blen = rng.choice([0.0, 3.3e-5, 1e-4])
        tip = rng.random() < 0.5
        B = OP.budget_for(cands + queries)
        P = AB.to_device(OP.pack_genome_lists(
            cands, ctx.lRef, B, ctx.using_error_rate), dtype=jnp.float64)
        Q = AB.to_device(OP.pack_genome_lists(
            queries, ctx.lRef, B, ctx.using_error_rate), dtype=jnp.float64)
        pal = np.asarray(PA.pallas_grid_append_scores(
            P, Q, blen, tip, dm, interpret=True))  # [K, N]
        xla = np.asarray(AB.grid_append_scores(P, Q, blen, tip, dm))
        for qi, query in enumerate(queries):
            host = [K.append_prob_node(ctx, c, query, tip, blen)
                    for c in cands]
            for ci, h in enumerate(host):
                n_checked += 1
                d = pal[qi, ci]
                if math.isinf(h):
                    assert math.isinf(d) or d < -1e250, (h, d)
                else:
                    assert abs(h - d) < 1e-6 * max(1.0, abs(h)), \
                        f"trial {trial} q{qi} c{ci}: host {h} pallas {d}"
                x = xla[qi, ci]
                if math.isinf(x):
                    assert math.isinf(d) or d < -1e250, (x, d)
                else:
                    assert abs(x - d) < 1e-9 * max(1.0, abs(x)), \
                        f"trial {trial} q{qi} c{ci}: xla {x} pallas {d}"
    assert n_checked > 30


@pytest.mark.parametrize("model_name,rate_var,error_mode",
                         [MODES[0], MODES[-1]])
def test_pallas_grid_var_params(refmod, x64, model_name, rate_var,  # noqa: F811
                                error_mode):
    """Per-query (blen, tip) SMEM params — the device SPR screen's call
    shape — against the XLA grid_append_scores_var twin."""
    import jax.numpy as jnp
    from maple_tpu.ops import append_batch as AB
    from maple_tpu.ops import pallas_append as PA

    ctx, rm = build_ctx(refmod, model_name, rate_var, error_mode, seed=31)
    refd = RefData.build(refmod.ref, model=model_name)
    model = Model.initial(refd, model_name)
    model.mut_matrix = [list(r) for r in ctx.mut_matrix]
    model.use_rate_variation = ctx.use_rate_variation
    if ctx.use_rate_variation:
        model.site_rates = [ctx.mut_matrices[i][0][1] / ctx.mut_matrix[0][1]
                            for i in range(refd.lRef)]
    model.using_error_rate = ctx.using_error_rate
    model.error_rate_site_specific = ctx.error_rate_site_specific
    model.error_rate = ctx.error_rate
    model.error_rates = ctx.error_rates
    model.tot_error = ctx.tot_error
    cfg = MapleConfig(model=model_name)
    dc = DerivedConfig.build(cfg, refd.lRef)
    dm = AB.device_model_from(model, dc, dtype=jnp.float64)

    rng = random.Random(77)
    cands = [random_genome_list(rng, ctx.lRef, ctx.using_error_rate,
                                upper=True) for _ in range(9)]
    queries = [random_genome_list(rng, ctx.lRef, ctx.using_error_rate)
               for _ in range(4)]
    blens = np.array([0.0, 3.3e-5, 1e-4, 7.7e-4])
    tips = np.array([True, False, True, False])
    B = OP.budget_for(cands + queries)
    P = AB.to_device(OP.pack_genome_lists(
        cands, ctx.lRef, B, ctx.using_error_rate), dtype=jnp.float64)
    Q = AB.to_device(OP.pack_genome_lists(
        queries, ctx.lRef, B, ctx.using_error_rate), dtype=jnp.float64)
    pal = np.asarray(PA.pallas_grid_append_scores_var(
        P, Q, blens, tips, dm, interpret=True))
    xla = np.asarray(AB.grid_append_scores_var(P, Q, blens, tips, dm))
    for qi, query in enumerate(queries):
        for ci, cand in enumerate(cands):
            h = K.append_prob_node(ctx, cand, query, bool(tips[qi]),
                                   float(blens[qi]))
            d = pal[qi, ci]
            x = xla[qi, ci]
            if math.isinf(h):
                assert math.isinf(d) or d < -1e250, (h, d)
            else:
                assert abs(h - d) < 1e-6 * max(1.0, abs(h)), \
                    f"q{qi} c{ci}: host {h} pallas {d}"
            if math.isinf(x):
                assert math.isinf(d) or d < -1e250, (x, d)
            else:
                assert abs(x - d) < 1e-9 * max(1.0, abs(x)), \
                    f"q{qi} c{ci}: xla {x} pallas {d}"


def test_pallas_single_query_variant(refmod, x64):  # noqa: F811
    import jax.numpy as jnp
    from maple_tpu.ops import append_batch as AB
    from maple_tpu.ops import pallas_append as PA

    ctx, rm = build_ctx(refmod, "GTR", False, "none", seed=5)
    refd = RefData.build(refmod.ref, model="GTR")
    model = Model.initial(refd, "GTR")
    model.mut_matrix = [list(r) for r in ctx.mut_matrix]
    cfg = MapleConfig(model="GTR")
    dc = DerivedConfig.build(cfg, refd.lRef)
    dm = AB.device_model_from(model, dc, dtype=jnp.float64)

    rng = random.Random(9)
    cands = [random_genome_list(rng, ctx.lRef, False, upper=True)
             for _ in range(5)]
    query = random_genome_list(rng, ctx.lRef, False)
    B = OP.budget_for(cands + [query])
    P = AB.to_device(OP.pack_genome_lists(cands, ctx.lRef, B, False),
                     dtype=jnp.float64)
    C = AB.to_device(OP.pack_genome_list(query, ctx.lRef, B, False),
                     dtype=jnp.float64)
    pal = np.asarray(PA.pallas_batched_append_scores(
        P, C, 3.3e-5, True, dm, interpret=True))
    xla = np.asarray(AB.batched_append_scores(P, C, 3.3e-5, True, dm))
    np.testing.assert_allclose(pal, xla, rtol=1e-9, atol=1e-9)

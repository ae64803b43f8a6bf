"""Constraint (row) sharding over the device mesh (parallel/rowshard.py)
— the SURVEY §2.9 v2-stretch capability: P/pi shard on the row axis,
x/S replicate, one psum per sweep."""

import jax
import jax.numpy as jnp
import numpy as np

import baryonyx_tpu as bx
from baryonyx_tpu.parallel.mesh import make_mesh
from baryonyx_tpu.parallel.rowshard import (
    compile_row_shards,
    solve_row_sharded,
)
from baryonyx_tpu.preprocess import unpreprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.validate import is_valid_solution_values


def _problem(m=48, n=160, density=0.08, seed=5):
    pb = bx.parse_lp(random_set_cover_lp(m, n, density, seed=seed))
    ctx = bx.make_context(0)
    csts = make_merged_constraints(ctx, unpreprocess(ctx, pb))
    nn = len(pb.vars.names)
    c = common.build_cost_vector(pb, nn)
    return pb, csts, nn, c


def test_shard_compile_shapes():
    _, csts, n, _ = _problem()
    cp = compile_row_shards(csts, n, 8)
    D = 8
    assert cp.row_vars.shape[0] == D
    # every real row present exactly once across shards
    per = cp.row_vars.shape[1]
    total_real = sum(
        int(np.sum(np.asarray(cp.r_size[d]) > 0)) for d in range(D)
    )
    assert total_real >= len(csts)


def test_row_sharded_solve_reaches_feasibility():
    pb, csts, n, c = _problem()
    mesh = make_mesh(jax.devices())
    cn = common.normalize_costs(c, bx.CostNormType.loo,
                                np.random.default_rng(0))
    x, rem = solve_row_sharded(
        csts, n, cn, True, mesh, R=16, sweeps=300, seed=3
    )
    assert rem == 0, f"remaining {rem}"
    assert is_valid_solution_values(pb, [int(v) for v in x])


def test_optimize_routes_oversized_to_rowshard(monkeypatch):
    """VERDICT r4 item 6: an instance whose replicated P exceeds the HBM
    budget solves end-to-end via optimize() on the 8-device mesh — the
    driver routes to the row-sharded path automatically (budget forced
    tiny via BARYONYX_HBM_BUDGET), and the result is a valid cover."""
    from baryonyx_tpu.validate import is_valid_solution

    monkeypatch.setenv("BARYONYX_HBM_BUDGET", "5000")  # ~5 KB: force it
    pb = bx.parse_lp(random_set_cover_lp(48, 160, 0.08, seed=5))
    ctx = bx.make_context(0)
    ctx.parameters.seed = 7
    ctx.parameters.time_limit = 20.0
    ctx.parameters.thread = 16
    r = bx.optimize(ctx, pb)
    assert "rowshard" in r.method
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)


def test_optimize_replicated_when_budget_ample(monkeypatch):
    monkeypatch.setenv("BARYONYX_HBM_BUDGET", str(64 << 30))
    pb = bx.parse_lp(random_set_cover_lp(20, 60, 0.15, seed=13))
    ctx = bx.make_context(0)
    ctx.parameters.seed = 7
    ctx.parameters.time_limit = 4.0
    ctx.parameters.thread = 16
    r = bx.optimize(ctx, pb)
    assert "rowshard" not in r.method
    assert r.status == bx.ResultStatus.success

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

"""Optimize-mode tests, modeled on the reference's strategy
(reference: lib/test/optimize.cpp:40-166): real multi-replica runs with
small time limits, validity as the oracle, and an exact-optimum assertion
on a small deterministic instance."""

import numpy as np
import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.generators import (
    n_queens_lp,
    random_assignment_lp,
    random_set_cover_lp,
)
from baryonyx_tpu.validate import compute_solution, is_valid_solution


def make_ctx(time_limit=8.0, seed=42, **kw):
    ctx = bx.make_context(0)
    ctx.parameters.seed = seed
    ctx.parameters.time_limit = time_limit
    ctx.parameters.limit = 100
    ctx.parameters.thread = 8  # keep the CPU test batch small
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    return ctx


def test_optimize_small_assignment_exact():
    # 3x3 assignment with known optimum computable by brute force
    pb = bx.parse_lp(random_assignment_lp(3, seed=7))
    r = bx.optimize(make_ctx(), pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)

    # brute force optimum over 3! permutations
    import itertools

    costs = np.zeros((3, 3))
    for el in pb.objective.elements:
        name = pb.vars.names[el.variable_index]
        i, j = name[1:].split("_")
        costs[int(i), int(j)] = el.factor
    best = min(
        sum(costs[i, p[i]] for i in range(3))
        for p in itertools.permutations(range(3))
    )
    assert compute_solution(pb, r) == best


def test_optimize_improves_on_initial_population():
    pb = bx.parse_lp(random_set_cover_lp(40, 120, density=0.1, seed=11))
    ctx = make_ctx()
    r_opt = bx.optimize(ctx, pb)
    assert r_opt.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r_opt)
    # x = all-ones is the trivial cover; any evolved solution must beat it
    trivial = sum(el.factor for el in pb.objective.elements)
    assert compute_solution(pb, r_opt) < trivial


def test_optimize_set_partition_feasible():
    # pure-equality instance (set partitioning, the reference's spp.csv
    # suite class). Regression test for the replica-init fix: population
    # draws alone never reached feasibility here — the zero-start quarter
    # of the replica axis (reference: optimize threads start from a zero
    # bit_array, itm-optimizer-common.hpp:627) is what cracks it.
    from baryonyx_tpu.generators import random_set_partition_lp

    pb = bx.parse_lp(
        random_set_partition_lp(30, 10, block_size=3, extra_columns=60, seed=5)
    )
    r = bx.optimize(make_ctx(limit=1000), pb)
    assert r.status == bx.ResultStatus.success
    assert r.remaining_constraints == 0
    assert is_valid_solution(pb, r)


def test_optimize_six_queens():
    pb = bx.parse_lp(n_queens_lp(6))
    r = bx.optimize(make_ctx(), pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    assert compute_solution(pb, r) == 6.0


def test_optimize_storage_five():
    pb = bx.parse_lp(random_set_cover_lp(20, 60, density=0.15, seed=13))
    r = bx.optimize(make_ctx(time_limit=5.0, storage=bx.StorageType.five), pb)
    assert len(r.solutions) == 5
    # best solution is last (Result.best)
    assert is_valid_solution(pb, r)


def test_optimize_storage_bound():
    pb = bx.parse_lp(random_set_cover_lp(20, 60, density=0.15, seed=13))
    r = bx.optimize(make_ctx(time_limit=5.0, storage=bx.StorageType.bound), pb)
    assert len(r.solutions) == 2


def test_optimize_update_callback():
    pb = bx.parse_lp(random_set_cover_lp(15, 40, density=0.2, seed=17))
    seen = []
    ctx = make_ctx(time_limit=5.0)
    ctx.register(update=lambda rem, val, loop, dur, restarts: seen.append(rem))
    bx.optimize(ctx, pb)
    assert seen  # progress callback fired at least once


def test_greedy_cover_seeds_population():
    """Cover instances get ratio-greedy population seeds: feasible and
    far below the bastert/random members (solver/population.py)."""
    import numpy as np

    import baryonyx_tpu as bx
    from baryonyx_tpu.preprocess import unpreprocess
    from baryonyx_tpu.preprocess.merge import make_merged_constraints
    from baryonyx_tpu.solver import common
    from baryonyx_tpu.solver.population import greedy_cover
    from baryonyx_tpu.generators import random_set_cover_lp
    from baryonyx_tpu.validate import is_valid_solution_values

    pb = bx.parse_lp(random_set_cover_lp(60, 200, 0.05, seed=2))
    ctx = bx.make_context(0)
    csts = make_merged_constraints(ctx, unpreprocess(ctx, pb))
    n = len(pb.vars.names)
    c = common.build_cost_vector(pb, n)
    rng = np.random.default_rng(0)
    g = greedy_cover(c, csts, rng, noise=0.1)
    assert g is not None
    assert is_valid_solution_values(pb, [int(v) for v in g])

    # two-sided rows (equalities) respect the upper bound
    pb2 = bx.parse_lp(
        "minimize\nx + y\nsubject to\nx + y = 1\nbinary\nx y\nend\n"
    )
    csts2 = make_merged_constraints(ctx, unpreprocess(ctx, pb2))
    g2 = greedy_cover(common.build_cost_vector(pb2, 2), csts2, rng, 0.1)
    assert g2 is not None and g2.sum() == 1

    # non-unit coefficients are refused
    pb3 = bx.parse_lp(
        "minimize\nx + y\nsubject to\n2 x + y >= 2\nbinary\nx y\nend\n"
    )
    csts3 = make_merged_constraints(ctx, unpreprocess(ctx, pb3))
    assert greedy_cover(
        common.build_cost_vector(pb3, 2), csts3, rng, 0.1
    ) is None


def test_debug_contracts_probe():
    """--debug runs the bx_assert device-state validator per chunk
    (core/contracts.py; reference: debug.hpp:75-117)."""
    import baryonyx_tpu as bx
    from baryonyx_tpu.core.contracts import (
        ContractError, bx_ensures, bx_expects, validate_replica_state,
    )
    from baryonyx_tpu.generators import random_set_cover_lp
    import pytest as _pytest

    pb = bx.parse_lp(random_set_cover_lp(20, 60, 0.15, seed=1))
    ctx = bx.make_context(0)
    p = ctx.parameters
    p.seed = 3
    p.time_limit = 0.0
    p.limit = 60
    p.thread = 8
    p.debug = True
    r = bx.optimize(ctx, pb)  # must not raise
    assert r.status == bx.ResultStatus.success

    with _pytest.raises(ContractError):
        bx_expects(False, "nope")
    bx_ensures(True)
    with _pytest.raises(ContractError):
        validate_replica_state(
            dict(pi_absmax=float("nan"), P_absmax=1.0, x_min=0, x_max=1,
                 kappa_max=0.1, remaining_min=0, m=5)
        )

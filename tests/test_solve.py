"""End-to-end solve() tests, modeled on the reference's strategy
(reference: lib/test/solve.cpp:77-642): `is_valid_solution` as the oracle,
golden values only where deterministic, serialization round-trips."""

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.generators import (
    n_queens_lp,
    random_assignment_lp,
    random_knapsack_101_lp,
    random_set_cover_lp,
    random_set_partition_lp,
)
from baryonyx_tpu.io.sol_io import read_result, write_result
from baryonyx_tpu.validate import compute_solution, is_valid_solution


def make_ctx(limit=500, seed=42, **kw):
    ctx = bx.make_context(0)
    ctx.parameters.seed = seed
    ctx.parameters.limit = limit
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    return ctx


def solve_ok(pb, **kw):
    r = bx.solve(make_ctx(**kw), pb)
    assert r.status == bx.ResultStatus.success, r.status
    assert is_valid_solution(pb, r)
    return r


def test_assignment_problem():
    pb = bx.parse_lp(random_assignment_lp(4, seed=1))
    r = solve_ok(pb)
    assert len(r.solutions[-1].variables) + len(r.affected_vars.names) == 16


def test_eight_queens():
    pb = bx.parse_lp(n_queens_lp(8))
    r = solve_ok(pb)
    assert compute_solution(pb, r) == 8.0


def test_eight_queens_random_costs():
    import random

    rng = random.Random(123)
    costs = [rng.uniform(0, 1) for _ in range(64)]
    pb = bx.parse_lp(n_queens_lp(8, costs=costs))
    solve_ok(pb)


def test_set_cover():
    pb = bx.parse_lp(random_set_cover_lp(30, 100, density=0.1, seed=3))
    solve_ok(pb)


def test_set_partition():
    pb = bx.parse_lp(random_set_partition_lp(40, 10, extra_columns=60, seed=5))
    solve_ok(pb)


def test_101_coefficients_maximize():
    pb = bx.parse_lp(random_knapsack_101_lp(20, seed=7))
    solve_ok(pb)


def test_negative_coefficient_inequality():
    # x - y <= 0, x + y >= 1, minimize x + 2y → y=1 x∈{0,1}
    pb = bx.parse_lp(
        "minimize\nobj: x + 2 y\nst\nc1: x - y <= 0\nc2: x + y >= 1\nend\n"
    )
    r = solve_ok(pb)
    vals = r.solution_map()
    assert vals["y"] == 1 or (vals["x"] == 0 and vals["y"] == 1) or vals["x"] <= vals["y"]


def test_equalities_with_negative_coeff():
    # x - y = 0 forces x == y; x + y = 2 forces both 1
    pb = bx.parse_lp(
        "minimize\nobj: x + y\nst\nc1: x - y = 0\nc2: x + y = 2\nend\n"
    )
    r = solve_ok(pb)
    vals = r.solution_map()
    assert vals["x"] == 1 and vals["y"] == 1


def test_all_variables_fixed_by_preprocessor():
    pb = bx.parse_lp("minimize\nobj: x + y\nst\nc1: x + y = 2\nend\n")
    r = solve_ok(pb)
    # preprocessor fixes everything; solve returns the constant objective
    assert r.solution_map() == {"x": 1, "y": 1}
    assert compute_solution(pb, r) == 2.0


def test_maximize_mode():
    pb = bx.parse_lp(
        "maximize\nobj: 2 x + 3 y + z\nst\nc1: x + y + z <= 2\nend\n"
    )
    r = solve_ok(pb)
    # push phase should find the maximum-value feasible subset: x + y = 5
    assert compute_solution(pb, r) >= 4.0


def test_solution_roundtrip_revalidates():
    pb = bx.parse_lp(random_assignment_lp(3, seed=9))
    r = solve_ok(pb)
    import io

    text = write_result(r)
    r2 = read_result(io.StringIO(text))
    r2.affected_vars = r.affected_vars
    assert is_valid_solution(pb, r2)


def test_float64_path():
    pb = bx.parse_lp(random_assignment_lp(3, seed=2))
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        solve_ok(pb, float_type=bx.FloatType.float64)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize(
    "order",
    [
        bx.ConstraintOrder.none,
        bx.ConstraintOrder.reversing,
        bx.ConstraintOrder.random_sorting,
        bx.ConstraintOrder.infeasibility_decr,
        bx.ConstraintOrder.infeasibility_incr,
        bx.ConstraintOrder.lagrangian_decr,
        bx.ConstraintOrder.lagrangian_incr,
        bx.ConstraintOrder.pi_sign_change,
        bx.ConstraintOrder.cycle,
    ],
)
def test_order_policies(order):
    pb = bx.parse_lp(n_queens_lp(6))
    solve_ok(pb, order=order, limit=3000)


def test_block_size_one_matches_sequential_semantics():
    pb = bx.parse_lp(random_set_cover_lp(20, 60, density=0.15, seed=11))
    solve_ok(pb, block_size=1)


@pytest.mark.parametrize(
    "norm",
    [
        bx.CostNormType.none,
        bx.CostNormType.l1,
        bx.CostNormType.l2,
        bx.CostNormType.loo,
        bx.CostNormType.random,
    ],
)
def test_cost_norms(norm):
    pb = bx.parse_lp(random_set_cover_lp(15, 40, density=0.2, seed=13))
    solve_ok(pb, cost_norm=norm)


@pytest.mark.parametrize(
    "policy",
    [
        bx.InitPolicyType.bastert,
        bx.InitPolicyType.pessimistic_solve,
        bx.InitPolicyType.optimistic_solve,
    ],
)
def test_init_policies(policy):
    pb = bx.parse_lp(random_assignment_lp(4, seed=17))
    solve_ok(pb, init_policy=policy)


def test_debug_row_trace(tmp_path, monkeypatch):
    """--debug writes a per-row update trace (reference: debug_logger,
    itm-common.hpp:1496-1550): every traced line names a row whose
    multiplier moved or that stayed violated, keyed by sweep."""
    import glob
    import os

    monkeypatch.chdir(tmp_path)
    pb = bx.parse_lp(random_set_cover_lp(12, 40, 0.15, seed=4))
    ctx = bx.make_context(0)
    ctx.parameters.seed = 3
    ctx.parameters.limit = 30
    ctx.parameters.debug = True
    # pure bastert start (all zeros on positive costs): every cover row
    # begins violated, so the annealed loop actually sweeps
    ctx.parameters.init_policy_random = 0.0
    r = bx.solve(ctx, pb)
    logs = glob.glob(str(tmp_path / "baryonyx-debug-*.log"))
    assert logs, "debug trace file missing"
    lines = open(logs[0]).read().splitlines()
    assert lines, "trace is empty"
    import re

    pat = re.compile(
        r"^sweep=\d+ k=\d+ pi=-?[\d.e+-]+ dpi=-?[\d.e+-]+ violated=[01]$"
    )
    assert all(pat.match(l) for l in lines[:50])
    # rows mentioned must exist
    ks = {int(l.split()[1].split("=")[1]) for l in lines}
    assert max(ks) < 16  # m padded row count upper bound for 12 rows


def test_exact_enumeration_tiny():
    """n <= 20 problems are solved by exact enumeration (solver/exact.py),
    deterministically optimal regardless of seed."""
    import baryonyx_tpu as bx
    from baryonyx_tpu.validate import compute_solution, is_valid_solution

    text = (
        "minimize\n3 a + 2 b + 4 c + d\nsubject to\n"
        "a + b >= 1\nb + c >= 1\nc + d >= 1\n"
        "binary\na b c d\nend\n"
    )
    pb = bx.parse_lp(text)
    for seed in (1, 99):
        ctx = bx.make_context(0)
        ctx.parameters.seed = seed
        r = bx.solve(ctx, pb)
        assert r.status == bx.ResultStatus.success
        assert is_valid_solution(pb, r)
        # optimum: b=1, c=1 -> 6... check: rows (a+b), (b+c), (c+d):
        # b=1,c=1 covers all three -> cost 2+4=6; b=1,d=1 -> 2+1=3 covers
        # rows 1,3 but row 2 needs b or c -> b=1 yes! so b=1,d=1 = 3
        assert compute_solution(pb, r) == 3.0
        r2 = bx.optimize(ctx, pb)
        assert compute_solution(pb, r2) == 3.0

"""ℤ-coefficient solver tests, modeled on the reference's Z cases
(reference: lib/test/solve.cpp:596-641 — Z coefficients incl.
objective-less feasibility)."""

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.model import ProblemSolverType
from baryonyx_tpu.preprocess import unpreprocess
from baryonyx_tpu.validate import compute_solution, is_valid_solution


def solve_ok(text, limit=1000, seed=42):
    pb = bx.parse_lp(text)
    ctx = bx.make_context(0)
    ctx.parameters.seed = seed
    ctx.parameters.limit = limit
    r = bx.solve(ctx, pb)
    assert r.status == bx.ResultStatus.success, r.status
    assert is_valid_solution(pb, r)
    return pb, r


def test_z_classification():
    pb = bx.parse_lp("minimize\nobj: x\nst\nc: 2x + y <= 2\nend\n")
    assert (
        unpreprocess(bx.make_context(0), pb).problem_type
        == ProblemSolverType.inequalities_Z
    )


def test_z_knapsack_inequality():
    pb, r = solve_ok("minimize\nobj: x + 2y + 3z\nst\nc1: 2x + 3y + z >= 4\nend\n")
    # optimal: x=1, y=1 → cost 3
    assert compute_solution(pb, r) == 3.0


def test_z_equality():
    pb, r = solve_ok(
        "minimize\nobj: x + y + z + w\nst\nc1: 2x + 2y + z + w = 4\nc2: x + y >= 1\nend\n"
    )
    assert compute_solution(pb, r) == 2.0


def test_z_feasibility_no_objective():
    # reference: solve.cpp Z-coefficient feasibility with empty objective
    pb, r = solve_ok(
        "minimize\nobj: 0 zero\nst\nc1: 2a + 3b - c = 5\nc2: a + b + c <= 3\nend\n"
    )
    vals = r.solution_map()
    assert 2 * vals["a"] + 3 * vals["b"] - vals["c"] == 5


def test_z_negative_coefficients_maximize():
    pb, r = solve_ok(
        "maximize\nobj: 3 x + 2 y + z\nst\nc1: 2x - 3y + 2z <= 2\nc2: x + y + z >= 1\nend\n"
    )
    assert compute_solution(pb, r) == 6.0


def test_z_mixed_with_binary_rows():
    # a Z problem where some rows are plain 0/1 (the reference's `linear`
    # subsolver tag) and others need enumeration
    pb, r = solve_ok(
        "minimize\nobj: a + b + c + d\n"
        "st\nc1: 3a + 2b - c = 2\nc2: a + b + c + d >= 2\nc3: b + d <= 1\nend\n"
    )
    assert compute_solution(pb, r) >= 2.0


def test_z_large_row_unsupported():
    terms = " + ".join(f"2 x{i}" for i in range(20))
    pb = bx.parse_lp(f"minimize\nobj: x0\nst\nc1: {terms} >= 4\nend\n")
    ctx = bx.make_context(0)
    with pytest.raises(NotImplementedError):
        bx.solve(ctx, pb)

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


def test_z_long_row_dp():
    # 20-variable ℤ row — beyond the enumeration cap, solved by the exact
    # DP over factor sums (reference: branch_and_bound_solver,
    # branch-and-bound-solver.hpp:450-533)
    terms = " + ".join(f"2 x{i}" for i in range(20))
    obj = " + ".join(f"{i + 1} x{i}" for i in range(20))
    pb, r = solve_ok(f"minimize\nobj: {obj}\nst\nc1: {terms} >= 4\nend\n")
    # needs two variables set; cheapest pair is x0 + x1 → 1 + 2 = 3
    assert compute_solution(pb, r) == 3.0


def test_z_long_row_dp_negative_factors():
    # mixed-sign factors with 16 variables (reference B&B folds negative
    # factors by shifting the bounds; the DP handles them natively)
    pos = " + ".join(f"3 a{i}" for i in range(8))
    neg = " - ".join(f"2 b{i}" for i in range(8))
    obj = " + ".join(f"a{i} + b{i}" for i in range(8))
    pb, r = solve_ok(
        f"minimize\nobj: {obj}\nst\nc1: {pos} - {neg} = 5\nend\n", limit=2000
    )
    vals = r.solution_map()
    act = 3 * sum(vals[f"a{i}"] for i in range(8)) - 2 * sum(
        vals[f"b{i}"] for i in range(8)
    )
    assert act == 5
    # cheapest: one a (3) and ... 3*a - 2*b = 5 needs 3 a's and 2 b's or
    # 1 a + (-1)?  3k - 2l = 5 → (k=3,l=2) cost 5 or (k=1,l=-1) invalid →
    # min cost = 5
    assert compute_solution(pb, r) == 5.0


def test_z_long_row_dp_optimize():
    # long ℤ row through the batched optimize path
    terms = " + ".join(f"2 x{i}" for i in range(20))
    obj = " + ".join(f"{i + 1} x{i}" for i in range(20))
    pb = bx.parse_lp(f"minimize\nobj: {obj}\nst\nc1: {terms} >= 4\nend\n")
    ctx = bx.make_context(0)
    ctx.parameters.seed = 7
    ctx.parameters.time_limit = 5
    ctx.parameters.thread = 8
    r = bx.optimize(ctx, pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    assert compute_solution(pb, r) == 3.0


def test_dp_select_matches_brute_force():
    """Property check: the DP row subsolver returns the brute-force optimum
    over all feasible assignments (the contract of the reference's
    exhaustive/branch-and-bound row solvers)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.ops.zsweep import _dp_select
    from baryonyx_tpu.preprocess.merge import make_merged_constraints

    rng = np.random.default_rng(3)
    for trial in range(4):
        L = int(rng.integers(14, 18))
        factors = rng.integers(-3, 4, size=L)
        factors[factors == 0] = 1
        lo = int(factors[factors < 0].sum()) if (factors < 0).any() else 0
        hi = int(factors[factors > 0].sum()) if (factors > 0).any() else 0
        b = int(rng.integers(lo, hi + 1))
        terms = " ".join(
            f"{'+' if f > 0 else '-'} {abs(f)} x{i}"
            for i, f in enumerate(factors)
        )
        op, bmin, bmax = [("<=", lo, b), (">=", b, hi), ("=", b, b)][trial % 3]
        pb = bx.parse_lp(
            f"minimize\nobj: x0\nst\nc1: {terms} {op} {b}\nend\n"
        )
        ctx = bx.make_context(0)
        csts = make_merged_constraints(ctx, unpreprocess(ctx, pb))
        cp = compile_problem(csts, L)
        assert cp.Wdp > 0 and bool(cp.dp_row[0])

        R = 3
        r = jnp.asarray(rng.normal(size=(1, cp.Kr, R)), jnp.float32)
        mask = cp.row_mask[:1]
        chosen = np.asarray(
            _dp_select(cp, jnp.zeros(1, jnp.int32), r, mask, True)
        )[0]  # [Kr, R]

        # brute force over all 2^L assignments
        bits = ((np.arange(2**L)[:, None] >> np.arange(L)[None, :]) & 1)
        act = bits @ factors
        feas = (act >= bmin) & (act <= bmax)
        if not feas.any():  # equality RHS may be unreachable — skip
            continue
        rnp = np.asarray(r)[0, :L]  # [L, R]
        scores = bits @ rnp  # [2^L, R]
        best = scores[feas].min(axis=0)

        got_act = factors @ chosen[:L]
        got_score = (rnp * chosen[:L]).sum(axis=0)
        assert ((got_act >= bmin) & (got_act <= bmax)).all()
        np.testing.assert_allclose(got_score, best, rtol=1e-5, atol=1e-5)


def test_z_quadratic_objective():
    # quadratic costs on a ℤ problem (reference: the template fan-out
    # itm.hpp:32-84 instantiates quadratic_cost_type for every solver)
    pb, r = solve_ok(
        "minimize\nobj: x + y + z + [ 4 x * y ] / 2\n"
        "st\nc1: 2x + 2y + z >= 2\nend\n"
    )
    # z alone satisfies nothing (z gives activity 1 < 2); best is one of
    # x or y (activity 2, cost 1) — the pair costs 2 + 2 = 4
    assert compute_solution(pb, r) == 1.0


def test_z_big_coefficients_gcd_dp():
    """Coefficients >= 1e4 with a common factor: the gcd rescale keeps the
    exact DP in play at any magnitude (VERDICT r3 item 4; reference:
    branch-and-bound-solver.hpp:450-533 handles any int coefficients)."""
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.preprocess.merge import make_merged_constraints

    terms = " + ".join(f"20000 x{i}" for i in range(16))
    obj = " + ".join(f"{i + 1} x{i}" for i in range(16))
    text = f"minimize\nobj: {obj}\nst\nc1: {terms} >= 40000\nend\n"
    pb = bx.parse_lp(text)
    ctx = bx.make_context(0)
    cp = compile_problem(
        make_merged_constraints(ctx, unpreprocess(ctx, pb)), 16
    )
    assert cp.Wdp > 0 and bool(cp.dp_row[0])  # scaled span 17 fits

    pb, r = solve_ok(text)
    # two variables needed; cheapest pair x0 + x1 -> 3
    assert compute_solution(pb, r) == 3.0


def test_z_big_coefficients_walk_fallback():
    """Coprime-ish huge coefficients whose scaled span exceeds the DP
    table: no crash — the row routes to the greedy walk and still solves
    to a valid solution (the pre-r4 code raised NotImplementedError)."""
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.preprocess.merge import make_merged_constraints

    import numpy as np

    rng = np.random.default_rng(11)
    w = [int(v) | 1 for v in rng.integers(90001, 110000, size=16)]
    terms = " + ".join(f"{w[i]} x{i}" for i in range(16))
    obj = " + ".join(f"{i + 1} x{i}" for i in range(16))
    text = f"minimize\nobj: {obj}\nst\nc1: {terms} <= 300000\nend\n"
    pb = bx.parse_lp(text)
    ctx = bx.make_context(0)
    cp = compile_problem(
        make_merged_constraints(ctx, unpreprocess(ctx, pb)), 16
    )
    assert not (cp.Wdp and bool(cp.dp_row[0]))  # walk fallback

    pb, r = solve_ok(text)
    vals = r.solution_map()
    assert sum(w[i] * vals[f"x{i}"] for i in range(16)) <= 300000


def test_dp_pallas_matches_jnp_dp():
    """The VMEM-resident Pallas DP (interpret mode on CPU) selects
    exactly what the jnp DP selects (VERDICT r4 item 4 kernel port)."""
    import numpy as np
    import jax.numpy as jnp

    import baryonyx_tpu as bx
    from baryonyx_tpu.generators import random_z_multiknapsack_lp
    from baryonyx_tpu.ops import zsweep as zs
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.preprocess import unpreprocess
    from baryonyx_tpu.preprocess.merge import make_merged_constraints

    ctx = bx.make_context(0)
    pb = unpreprocess(
        ctx,
        bx.parse_lp(
            random_z_multiknapsack_lp(20, 80, row_len=(14, 22), seed=5)
        ),
    )
    cp = compile_problem(
        make_merged_constraints(ctx, pb), len(pb.vars.values)
    )
    assert cp.Wdp > 0
    B, R = 8, 128
    rng = np.random.default_rng(0)
    rows_c = jnp.asarray(np.where(np.asarray(cp.dp_row))[0][:B], jnp.int32)
    r = jnp.asarray(rng.normal(0, 1, (B, cp.Kr, R)), jnp.float32)
    mask = jnp.asarray(np.asarray(cp.row_mask)[np.asarray(rows_c)])
    import os

    os.environ["BARYONYX_PALLAS"] = "interpret"
    try:
        for minimize in (True, False):
            ref = np.asarray(zs._dp_select(cp, rows_c, r, mask, minimize))
            pal = np.asarray(
                zs._dp_select_pallas(cp, rows_c, r, mask, minimize)
            )
            assert (ref == pal).all()
    finally:
        os.environ.pop("BARYONYX_PALLAS", None)

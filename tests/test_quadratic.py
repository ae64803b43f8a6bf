"""Quadratic (BQP) objective tests (reference: lib/test/solve.cpp
quadratic objective cases; quadratic_cost_type, itm-common.hpp:1150-1440)."""

import baryonyx_tpu as bx
from baryonyx_tpu.validate import compute_solution, is_valid_solution


def solve_ok(text, **kw):
    pb = bx.parse_lp(text)
    ctx = bx.make_context(0)
    ctx.parameters.seed = 42
    ctx.parameters.limit = 500
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    r = bx.solve(ctx, pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    return pb, r


def test_cross_term_penalty():
    # picking both x and y costs an extra 2; optimum picks one → 1.0
    pb, r = solve_ok(
        "minimize\nobj: x + y + [ 4 x * y ] / 2\nst\nc1: x + y >= 1\nend\n"
    )
    assert compute_solution(pb, r) == 1.0


def test_square_term():
    # x^2 == x for binaries: obj = 3x + y, constraint forces one of them
    pb, r = solve_ok(
        "minimize\nobj: y + [ 6 x ^ 2 ] / 2\nst\nc1: x + y >= 1\nend\n"
    )
    assert compute_solution(pb, r) == 1.0  # picks y


def test_negative_cross_term_reward():
    # maximizing with a bonus for picking the pair
    pb, r = solve_ok(
        "maximize\nobj: x + y + [ 2 x * y ] / 2\nst\nc1: x + y <= 2\nend\n"
    )
    assert compute_solution(pb, r) == 3.0  # both + bonus 1


def test_quadratic_with_optimize():
    pb = bx.parse_lp(
        "minimize\nobj: a + b + c + [ 4 a * b + 4 b * c ] / 2\n"
        "st\nc1: a + b + c >= 2\nend\n"
    )
    ctx = bx.make_context(0)
    ctx.parameters.seed = 42
    ctx.parameters.time_limit = 5
    ctx.parameters.thread = 8
    ctx.parameters.limit = 100
    r = bx.optimize(ctx, pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    # best: a + c (no adjacent pair) → 2.0
    assert compute_solution(pb, r) == 2.0


def test_qsap_kernel_path_quality():
    """At-scale-class quadratic evidence (VERDICT r4 item 3): an
    UNFOLDABLE quadratic instance (random QSAP — couplings between choice
    variables, no marginal-grid product pattern) with n > EXACT_N_MAX
    must be solved by the KERNEL (method == "optimize", no exact-enum /
    product-fold route) to near the brute-force optimum."""
    import itertools

    import numpy as np

    from baryonyx_tpu.generators import random_qsap_lp

    lp = random_qsap_lp(7, 3, seed=1)  # n = 21 > EXACT_N_MAX
    pb = bx.parse_lp(lp)
    n = len(pb.vars.values)
    assert n == 21
    name_idx = {nm: i for i, nm in enumerate(pb.vars.names)}
    lin = np.zeros(n)
    for el in pb.objective.elements:
        lin[el.variable_index] += el.factor
    Q = np.zeros((n, n))
    for q in pb.objective.qelements:
        Q[q.variable_index_a, q.variable_index_b] += q.factor
    best = min(
        lin @ x + x @ Q @ x
        for combo in itertools.product(range(3), repeat=7)
        for x in [
            np.bincount(
                [name_idx[f"x{g}_{c}"] for g, c in enumerate(combo)],
                minlength=n,
            )
        ]
    )

    ctx = bx.make_context(0)
    ctx.parameters.seed = 42
    ctx.parameters.time_limit = 8.0
    ctx.parameters.thread = 16
    r = bx.optimize(ctx, pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    assert r.method == "optimize"  # kernel route, not exact/product-fold
    val = r.solutions[-1].value
    # stochastic solver, small budget: within 5% of the true optimum
    assert val <= best + 0.05 * abs(best), (val, best)

"""Round-5 defect-fix regression tests (VERDICT r4 items 7 and 9,
ADVICE r4 lows): push-budget remap warning, quad-fallback warning
plumbing, Result.method route stamping, compile-time-infeasible rows
surfacing as results instead of crashes, independent mutation draws, and
branch-mode budget slicing."""

import re
import time

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.errors import InfeasibleConstraintError
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.validate import is_valid_solution


def make_ctx(time_limit=5.0, seed=42, verbose=4, **kw):
    ctx = bx.make_context(verbose)  # warning level: remap notices visible
    ctx.parameters.seed = seed
    ctx.parameters.time_limit = time_limit
    ctx.parameters.limit = 50
    ctx.parameters.thread = 8
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    return ctx


TINY_LP = """minimize
obj: x1 + 2 x2 + 3 x3
subject to
c1: x1 + x2 >= 1
c2: x2 + x3 >= 1
binary
x1 x2 x3
end
"""


def test_optimize_method_stamps_exact_enum():
    pb = bx.parse_lp(TINY_LP)
    r = bx.optimize(make_ctx(verbose=0), pb)
    assert r.status == bx.ResultStatus.success
    assert "exact-enum" in r.method
    assert r.method.startswith("optimize")


def test_solve_method_stamps_exact_enum():
    pb = bx.parse_lp(TINY_LP)
    r = bx.solve(make_ctx(verbose=0), pb)
    assert r.status == bx.ResultStatus.success
    assert "exact-enum" in r.method
    assert r.method.startswith("solve")


def test_optimize_debug_skips_exact_enum(capsys):
    # ADVICE r4: --debug / observer runs want the real loop's trace, so
    # exact enumeration must not short-circuit them (mirrors solve mode)
    pb = bx.parse_lp(TINY_LP)
    r = bx.optimize(make_ctx(verbose=0, debug=True, time_limit=3.0), pb)
    assert "exact-enum" not in r.method
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)


def test_push_budget_remap_warns(capsys):
    # >20 vars so exact enumeration does not return before the remap
    pb = bx.parse_lp(random_set_cover_lp(12, 30, seed=3))
    ctx = make_ctx(time_limit=1.0, pushes_limit=5, pushing_iteration_limit=7)
    r = bx.optimize(ctx, pb)
    out = capsys.readouterr().out
    assert "active-push equivalent" in out
    assert "pushes_limit=5" in out


def test_push_budget_defaults_do_not_warn(capsys):
    pb = bx.parse_lp(random_set_cover_lp(12, 30, seed=3))
    r = bx.optimize(make_ctx(time_limit=1.0), pb)
    out = capsys.readouterr().out
    assert "active-push equivalent" not in out


def _infeasible_z_lp():
    # 15 elements (> Z_ENUM_MAX) with gcd 4 and an equality RHS of 2:
    # no multiple of 4 lies in [2, 2] -> provably infeasible at compile
    names = [f"x{i}" for i in range(15)]
    terms = " + ".join(f"4 {v}" for v in names)
    return (
        "minimize\nobj: "
        + " + ".join(names)
        + f"\nsubject to\nc1: {terms} = 2\nbinary\n"
        + " ".join(names)
        + "\nend\n"
    )


def test_infeasible_z_row_yields_result_not_crash():
    pb = bx.parse_lp(_infeasible_z_lp())
    r = bx.solve(make_ctx(verbose=0, time_limit=1.0), pb)
    assert r.status == bx.ResultStatus.limit_reached
    assert r.remaining_constraints == 1

    r2 = bx.optimize(make_ctx(verbose=0, time_limit=1.0), pb)
    assert r2.status == bx.ResultStatus.limit_reached
    assert r2.remaining_constraints == 1


def test_mutation_rate_draws_are_independent():
    # regression for VERDICT r4 weak 3: var_p and val_p consumed the SAME
    # key, perfectly correlating per-replica mutation-variable and
    # mutation-value rates. Source-level guard: the two normal draws in
    # the reinit block must use distinct subkeys of k7.
    import inspect

    import baryonyx_tpu.solver.optimize as opt

    src = inspect.getsource(opt)
    block = src[src.index("mut_var_stddev\"] * jax.random.normal") :]
    keys = re.findall(r"jax\.random\.normal\((k7\w*)", src)
    var_val_keys = [k for k in keys if k.startswith("k7")]
    assert len(set(var_val_keys)) >= 2, (
        "mutation variable/value rates must draw from distinct subkeys"
    )


def test_branch_budget_is_sliced():
    # VERDICT r4 item 9: the user's time_limit is the TOTAL branch budget
    pb = bx.parse_lp(TINY_LP)
    ctx = make_ctx(verbose=0, time_limit=2.0)
    ctx.parameters.mode = bx.ModeType.branch
    t0 = time.monotonic()
    r = bx.optimize(ctx, pb)
    wall = time.monotonic() - t0
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    # wall <= time_limit + one node's slice (plus dispatch slack)
    assert wall < 2.0 + max(2.0 / 8.0, 0.5) + 3.0

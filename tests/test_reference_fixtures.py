"""Integration tests against the reference's real LP fixtures.

The upstream test suite (reference: lib/test/solve.cpp:77-642,
lib/test/optimize.cpp:40-166) is built on ~22 LP files in lib/test/ plus
a 30-instance n-queens set with a CPLEX golden file. Those files are
mounted read-only at /root/reference and are consumed here at runtime —
parsed by our parser, preprocessed, solved, and validated with the
`is_valid_solution` oracle, exactly the reference's acceptance strategy
(SURVEY.md section 4). Skipped when the mount is absent.
"""

import glob
import math
import os

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.validate import compute_solution, is_valid_solution

REF = "/root/reference/lib/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not mounted"
)


def load(name: str):
    with open(os.path.join(REF, name + ".lp")) as fh:
        return bx.parse_lp(fh.read())


def make_ctx(limit=2000, seed=123, **kw):
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


# ---- parser coverage: every fixture must parse with the right shape
# (golden counts verified against the reference parser's output).

FIXTURE_SHAPES = {
    # name: (n_vars, n_constraints)
    "8_queens_puzzle": (64, 42),
    "aim-50-1_6-yes1-2": (50, 78),
    "assignment_problem_1": (16, 8),
    "assignment_problem_2": (16, 8),
    "assignment_problem_3": (16, 8),
    "bibd1n": (833, 7028),
    "bound": (6, 2),
    "capmo1_direct": (10101, 10100),
    "flat30-7": (90, 300),
    "general": (3, 2),
    "geom-30a-3-ext_1000_support": (819, 516),
    "negative-coeff": (4, 2),
    "negative-coeff2": (4, 6),
    "negative-coeff3": (8, 5),
    "negative-coeff4": (5, 4),
    "prepro": (23, 13),
    "prevl1": (7876, 7714),
    "small4": (272, 136),
    "sudoku": (81, 27),
    "uf50-0448": (50, 218),
    "verger_5_5": (20375, 19369),
    "vm": (2276, 4725),
}


def test_parse_every_fixture():
    files = sorted(glob.glob(os.path.join(REF, "*.lp")))
    assert len(files) == len(FIXTURE_SHAPES)
    for f in files:
        name = os.path.basename(f)[:-3]
        pb = load(name)
        ncons = (
            len(pb.equal_constraints)
            + len(pb.greater_constraints)
            + len(pb.less_constraints)
        )
        assert (len(pb.vars.names), ncons) == FIXTURE_SHAPES[name], name


# ---- solve-mode fixtures (reference: lib/test/solve.cpp)


@pytest.mark.parametrize(
    "name", ["assignment_problem_1", "assignment_problem_2", "assignment_problem_3"]
)
def test_assignment_problems(name):
    # reference: solve.cpp "assignment_problem"_test — equalities-01
    solve_ok(load(name))


def test_eight_queens_puzzle():
    # reference: solve.cpp "8_queens_puzzle"_test; objective Σx over the
    # 8 row-equalities ⇒ any feasible placement scores exactly 8
    r = solve_ok(load("8_queens_puzzle"))
    assert compute_solution(load("8_queens_puzzle"), r) == 8.0


@pytest.mark.parametrize(
    "name",
    ["negative-coeff", "negative-coeff2", "negative-coeff3", "negative-coeff4"],
)
def test_negative_coefficients(name):
    # reference: solve.cpp "negative_coeff*"_test — ±1 solvers
    solve_ok(load(name))


def test_bound_fixture():
    # bounds section fixes/clamps variables (reference: solve.cpp + bound.lp)
    solve_ok(load("bound"))


def test_general_fixture_parses_typed():
    # reference: io.cpp:678-692 — general.lp is a parse-only fixture (the
    # model itself is infeasible): 3 vars all typed `general`
    from baryonyx_tpu.core.model import VariableType

    pb = load("general")
    assert len(pb.vars.names) == 3
    assert all(vv.type == VariableType.general for vv in pb.vars.values)


def test_sudoku_fixture_parses_bounds():
    # reference: io.cpp:694-706 — 81 general vars bounded [1, 9]
    from baryonyx_tpu.core.model import VariableType

    pb = load("sudoku")
    assert len(pb.vars.names) == 81
    assert all(
        vv.min == 1 and vv.max == 9 and vv.type == VariableType.general
        for vv in pb.vars.values
    )


def test_z_coefficients_knapsack():
    # reference: solve.cpp "test_Z_coefficient_1" first instance —
    # general-int constraint coefficients over binaries
    pb = bx.parse_lp(
        "minimize\n"
        "15 x1 + 19 x2 + 13 x3 + 12 x4\n"
        "subject to\n"
        "2 x1 + 1 x2 + 3 x3 + 2 x4 <= 3\n"
        "binary\n"
        "x1 x2 x3 x4\n"
        "end\n"
    )
    solve_ok(pb)


def test_z_coefficients_no_objective():
    # reference: solve.cpp "test_Z_coefficient_1" second instance —
    # feasibility-only with mixed-sign Z coefficients
    pb = bx.parse_lp(
        "minimize\n"
        "subject to\n"
        "2 a + 3 b - 5 c + 7 d <= 0\n"
        "-2 b + 2 c >= 1\n"
        "7 a + 7 d <= 7\n"
        "binary\n"
        "a b c d\n"
        "end\n"
    )
    solve_ok(pb)


def test_prepro_golden_fixings():
    # reference: solve.cpp:77-193 — the preprocessor must fix exactly 21
    # variables with these values, leaving 2 free
    pb = load("prepro")
    r = solve_ok(pb, cost_norm=bx.CostNormType.loo)
    assert len(r.affected_vars.names) == 21
    fixed = dict(zip(r.affected_vars.names, r.affected_vars.values))
    for name in ["w", "a", "t", "c1", "c2", "c3", "c4", "c5", "c6", "d4", "d5", "d6"]:
        assert fixed[name] == 0, name
    for name in ["ZZ", "d1", "d2", "d3", "b"]:
        assert fixed[name] == 1, name
    assert len(r.variable_name) == 2
    assert r.solutions[-1].value > 6.0


def test_prepro_roundtrip_revalidates():
    # reference: solve.cpp:177-192 — serialize the result, re-read, re-validate
    import io

    from baryonyx_tpu.io.sol_io import read_result, write_result

    pb = load("prepro")
    r = solve_ok(pb, cost_norm=bx.CostNormType.loo)
    r2 = read_result(io.StringIO(write_result(r)))
    r2.affected_vars = r.affected_vars
    assert is_valid_solution(pb, r2)


SLOW = os.environ.get("BARYONYX_SLOW_TESTS") != "1"


@pytest.mark.skipif(SLOW, reason="set BARYONYX_SLOW_TESTS=1 (reference runs unbounded)")
def test_sat_flat30():
    # reference: solve.cpp "test_flat30_7" — SAT encoding, feasibility;
    # the reference runs with limit=-1 (unbounded) and no time limit
    solve_ok(
        load("flat30-7"),
        limit=200000,
        time_limit=600.0,
        delta=0.001,
        kappa_min=0.3,
        kappa_step=1e-10,
        kappa_max=1.0,
        order=bx.ConstraintOrder.reversing,
    )


def test_sat_uf50():
    # reference: solve.cpp "test_uf50_0448" with its parameter set
    solve_ok(
        load("uf50-0448"),
        limit=20000,
        time_limit=60.0,
        theta=0.5,
        delta=1.0,
        kappa_min=0.1,
        kappa_step=1e-17,
        kappa_max=1.0,
        alpha=2.0,
        w=60,
        order=bx.ConstraintOrder.random_sorting,
    )


def test_sat_aim50():
    # reference: solve.cpp "test_aim_50_1_6_yes1_2" with its parameter set
    solve_ok(
        load("aim-50-1_6-yes1-2"),
        limit=20000,
        time_limit=60.0,
        theta=0.6,
        delta=0.01,
        kappa_step=2e-3,
        kappa_max=100.0,
        alpha=1.0,
        w=20,
    )


@pytest.mark.skipif(SLOW, reason="set BARYONYX_SLOW_TESTS=1 (10k-var instance)")
def test_capmo1_solve_bound_and_roundtrip():
    # reference: solve.cpp:195-238 "test_preprocessor_2" — capmo1_direct
    # must solve feasibly with objective below 1156908, and the serialized
    # result must re-validate to the identical objective
    import io

    from baryonyx_tpu.io.sol_io import read_result, write_result

    pb = load("capmo1_direct")
    r = solve_ok(pb, time_limit=30.0)
    value = r.solutions[-1].value
    assert compute_solution(pb, r) == pytest.approx(value, rel=1e-9)
    assert value < 1156908

    r2 = read_result(io.StringIO(write_result(r)))
    r2.status = bx.ResultStatus.success
    r2.affected_vars = r.affected_vars
    assert is_valid_solution(pb, r2)
    assert compute_solution(pb, r2) == pytest.approx(value, rel=1e-9)


# ---- optimize-mode fixtures (reference: lib/test/optimize.cpp)


def _opt_ctx(time_limit, **kw):
    ctx = make_ctx(**kw)
    ctx.parameters.time_limit = time_limit
    ctx.parameters.thread = 8
    return ctx


@pytest.mark.skipif(SLOW, reason="set BARYONYX_SLOW_TESTS=1")
def test_optimize_qap_small4():
    # reference: optimize.cpp:55-87 — QAP small4 must reach the exact
    # optimum 790 (reference budget: 40 s / 2 threads)
    pb = load("small4")
    ctx = _opt_ctx(
        time_limit=120.0,
        limit=100000,
        theta=0.5,
        delta=0.2,
        kappa_step=1e-3,
        kappa_max=10.0,
        alpha=0.0,
        w=20,
        pushing_k_factor=0.9,
        pushes_limit=50,
        pushing_objective_amplifier=10,
        pushing_iteration_limit=50,
    )
    r = bx.optimize(ctx, pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)
    assert compute_solution(pb, r) == pytest.approx(790.0)


def _nqueens_ctx():
    # reference: optimize.cpp:114-130 — the published n-queens parameter set
    return _opt_ctx(
        time_limit=20.0,
        limit=100000,
        theta=0.5,
        delta=1.0,
        kappa_min=0.30,
        kappa_step=1e-2,
        kappa_max=100.0,
        alpha=1.0,
        w=60,
        pushing_k_factor=0.9,
        pushes_limit=50,
        pushing_objective_amplifier=10,
        pushing_iteration_limit=10,
        order=bx.ConstraintOrder.random_sorting,
    )


def test_nqueens_golden_instances():
    # reference: optimize.cpp:89-166 — n-queens instances must be solved;
    # objectives compared against the CPLEX 12.7 golden file. The full set
    # is 30 instances / 20 s each; the default run takes the three
    # smallest (BARYONYX_SLOW_TESTS=1 runs all 30).
    with open(os.path.join(REF, "n-queens", "solutions.txt")) as fh:
        golden = [float(line) for line in fh if line.strip()]
    sizes = []
    for i in range(len(golden)):
        path = os.path.join(REF, "n-queens", f"n-queens-problem-{i}.lp")
        sizes.append((os.path.getsize(path), i))
    run = [i for _, i in sorted(sizes)] if not SLOW else [i for _, i in sorted(sizes)[:3]]
    gaps = []
    for i in run:
        path = os.path.join(REF, "n-queens", f"n-queens-problem-{i}.lp")
        with open(path) as fh:
            pb = bx.parse_lp(fh.read())
        r = bx.optimize(_nqueens_ctx(), pb)
        assert r.status == bx.ResultStatus.success, f"instance {i} unsolved"
        assert is_valid_solution(pb, r)
        gaps.append((compute_solution(pb, r) - golden[i]) / max(abs(golden[i]), 1.0))
    # the reference asserts all instances feasible and only *prints* the
    # mean CPLEX distance (optimize.cpp:153-166); additionally bound the
    # mean gap loosely so a quality regression actually fails the test
    mean_gap = sum(gaps) / len(gaps)
    print("n-queens mean gap vs CPLEX:", mean_gap)
    assert math.isfinite(mean_gap) and mean_gap < 1.0

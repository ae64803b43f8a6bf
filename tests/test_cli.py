"""CLI tests (reference: app/src/main.cpp behaviors)."""

import os

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.cli import assign_parameter, main
from baryonyx_tpu.core.params import ConstraintOrder, SolverParameters
from baryonyx_tpu.generators import random_assignment_lp


def test_assign_parameter_scalars():
    p = SolverParameters()
    assert assign_parameter(p, "theta", "0.3")
    assert p.theta == 0.3
    assert assign_parameter(p, "kappa-step", "0.01")
    assert p.kappa_step == 0.01
    assert assign_parameter(p, "limit", "123")
    assert p.limit == 123
    assert not assign_parameter(p, "theta", "zzz")
    assert not assign_parameter(p, "unknown-param", "1")


def test_assign_parameter_enums():
    p = SolverParameters()
    assert assign_parameter(p, "constraint-order", "random-sorting")
    assert p.order == ConstraintOrder.random_sorting
    assert not assign_parameter(p, "constraint-order", "bogus")


def test_cli_solve_writes_sol(tmp_path, monkeypatch):
    lp = tmp_path / "model.lp"
    lp.write_text(random_assignment_lp(3, seed=5))
    monkeypatch.chdir(tmp_path)
    rc = main(["--quiet", "-p", "limit:200", "-p", "seed:42", str(lp)])
    assert rc == 0
    sols = list(tmp_path.glob("model.lp-*.sol"))
    assert len(sols) == 1
    # the .sol round-trips through the result reader and validates
    res = bx.make_result(bx.make_context(0), str(sols[0]))
    pb = bx.parse_lp(lp.read_text())
    from baryonyx_tpu.validate import is_valid_solution

    assert is_valid_solution(pb, res)


def test_cli_check(tmp_path, monkeypatch, capsys):
    lp = tmp_path / "model.lp"
    lp.write_text(random_assignment_lp(3, seed=5))
    monkeypatch.chdir(tmp_path)
    assert main(["--quiet", "-p", "limit:200", "-p", "seed:42", str(lp)]) == 0
    sol = next(tmp_path.glob("model.lp-*.sol"))
    rc = main(["--quiet", "--check", str(sol), str(lp)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "valid" in out


def test_cli_unknown_option():
    assert main(["--frobnicate"]) == 1


def test_cli_no_files():
    assert main(["--quiet"]) == 1


def test_parameter_echo_matches_reference_layout():
    """core-out / solver_started_cb parity (VERDICT r3 missing 6)."""
    from baryonyx_tpu.core.out import format_parameters, format_result_line
    from baryonyx_tpu.core.params import ModeType, SolverParameters
    from baryonyx_tpu.core.result import Result, ResultStatus, Solution

    out = format_parameters(SolverParameters())
    for line in (
        "Solver starts", " * Global parameters:", "  - limit: 1000",
        "  - floating-point-type: float", "  - auto-tune: disabled",
        " * In The Middle parameters:", "  - kappa: 0 0.001 0.6",
        "  - norm: loo", " * Pushes system parameters:",
        " * Solver initialization parameters:",
        "  - init-policy: bastert",
        " * Optimizer initialization parameters:",
    ):
        assert line in out, line

    p = SolverParameters()
    p.mode = ModeType.nlopt | ModeType.branch
    assert "auto-tune: nlopt-and-branch" in format_parameters(p)

    r = Result(status=ResultStatus.success, loop=42, duration=1.5)
    r.solutions.append(Solution([1, 0], 7.0))
    assert format_result_line(r) == "Best solution found: 7 in 42 loop and 1.5s\n"
    r2 = Result(
        status=ResultStatus.time_limit_reached, remaining_constraints=3,
        duration=2.0,
    )
    assert "Constraint remaining: 3. Time limit reached" in format_result_line(r2)


def test_cli_warmup_no_sol(tmp_path, monkeypatch):
    """--warmup pre-compiles the shape class without solving: no .sol."""
    lp = tmp_path / "model.lp"
    lp.write_text(random_assignment_lp(3, seed=5))
    monkeypatch.chdir(tmp_path)
    rc = main(["--quiet", "--warmup", "-p", "seed:42", str(lp)])
    assert rc == 0
    assert list(tmp_path.glob("model.lp-*.sol")) == []

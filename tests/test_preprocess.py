"""Preprocessor and constraint-merge tests, modeled on the reference's
strategy (reference: lib/test/preprocess.cpp:48-300): golden asserts on
which variables get fixed and re-validation of solutions on the original
problem."""

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.core.model import ProblemSolverType
from baryonyx_tpu.preprocess import (
    affect,
    make_merged_constraints,
    preprocess,
    split,
    unpreprocess,
)


def ctx():
    return make_context(0)


def test_bound_forced_fixing():
    # z forced to 1 by bounds; like the reference, propagation only reduces
    # constraints down to a single unfixed variable, so x + y = 0 survives
    # as a residual constraint (reference: preprocessor.cpp:360-431)
    pb = bx.parse_lp(
        "minimize\nobj: x + y + z\n"
        "st\nc1: x + y + z = 1\n"
        "bounds\n1 <= z <= 1\nend\n"
    )
    out = preprocess(ctx(), pb)
    fixed = dict(zip(out.affected_vars.names, out.affected_vars.values))
    assert fixed == {"z": 1}
    assert out.vars.names == ["x", "y"]
    assert len(out.equal_constraints) == 1
    assert out.equal_constraints[0].value == 0  # RHS folded the fixed z
    # objective constant picked up the fixed z term
    assert out.objective.value == 1.0


def test_singleton_chain_propagates():
    # w = 1 (singleton) → x + w = 1 reduces to x = 0 → x + y = 0 ... chain
    pb = bx.parse_lp(
        "minimize\nobj: x + y + w\n"
        "st\nc0: w = 1\nc1: x + w = 1\nc2: x + y = 0\nend\n"
    )
    out = preprocess(ctx(), pb)
    fixed = dict(zip(out.affected_vars.names, out.affected_vars.values))
    assert fixed == {"w": 1, "x": 0, "y": 0}
    assert out.n_constraints == 0


def test_all_positive_equality_zero_fixes_all_false():
    pb = bx.parse_lp(
        "minimize\nobj: x + y + w\nst\nc1: x + y = 0\nc2: x + w >= 1\nend\n"
    )
    out = preprocess(ctx(), pb)
    fixed = dict(zip(out.affected_vars.names, out.affected_vars.values))
    # x=y=0 from c1; then c2 reduces to w >= 1 → w=1
    assert fixed == {"x": 0, "y": 0, "w": 1}


def test_saturated_greater_fixes_all_true():
    pb = bx.parse_lp(
        "minimize\nobj: x + y + z\nst\nc1: x + y >= 2\nc2: x + y + z <= 2\nend\n"
    )
    out = preprocess(ctx(), pb)
    fixed = dict(zip(out.affected_vars.names, out.affected_vars.values))
    # c1 saturated → x=y=1; c2 reduces to z <= 0 → z=0
    assert fixed == {"x": 1, "y": 1, "z": 0}


def test_unused_variable_fixed_by_objective_sign():
    pb = bx.parse_lp(
        "maximize\nobj: 3 u - 2 v + x + y\nst\nc1: x + y = 1\nend\n"
    )
    out = preprocess(ctx(), pb)
    fixed = dict(zip(out.affected_vars.names, out.affected_vars.values))
    # u has positive factor under maximize → 1; v negative → 0
    assert fixed == {"u": 1, "v": 0}
    assert out.vars.names == ["x", "y"]
    assert out.objective.value == 3.0


def test_infeasible_propagation_raises():
    pb = bx.parse_lp(
        "minimize\nobj: x + y\nst\nc1: x + y = 0\nc2: x + y >= 2\nend\n"
    )
    with pytest.raises(bx.ProblemDefinitionError):
        preprocess(ctx(), pb)


def test_unpreprocess_keeps_everything():
    pb = bx.parse_lp("minimize\nobj: x + y\nst\nc1: x + y >= 1\nend\n")
    out = unpreprocess(ctx(), pb)
    assert out.vars.names == ["x", "y"]
    assert len(out.affected_vars.names) == 0
    assert out.problem_type == ProblemSolverType.inequalities_01


def test_affect_and_split():
    pb = bx.parse_lp(
        "minimize\nobj: x + y + z\nst\nc1: x + y = 1\nc2: y + z <= 1\nend\n"
    )
    base = unpreprocess(ctx(), pb)
    pinned = affect(ctx(), base, 0, True)  # x := 1
    fixed = dict(zip(pinned.affected_vars.names, pinned.affected_vars.values))
    # x=1 reduces c1 to y = 0; c2 then reduces to z <= 1 (undecidable) and
    # is dropped, leaving z unused → fixed to its objective-optimal 0
    assert fixed == {"x": 1, "y": 0, "z": 0}
    assert pinned.vars.names == []

    hi, lo = split(ctx(), base, 0)
    assert dict(zip(hi.affected_vars.names, hi.affected_vars.values))["x"] == 1
    assert dict(zip(lo.affected_vars.names, lo.affected_vars.values))["x"] == 0


def test_classification():
    pb01 = bx.parse_lp("minimize\nobj: x + y\nst\nc: x + y = 1\nend\n")
    assert unpreprocess(ctx(), pb01).problem_type == ProblemSolverType.equalities_01
    pb101 = bx.parse_lp("minimize\nobj: x + y\nst\nc: x - y = 0\nend\n")
    assert unpreprocess(ctx(), pb101).problem_type == ProblemSolverType.equalities_101
    pbZ = bx.parse_lp("minimize\nobj: x + y\nst\nc: 2x + y <= 2\nend\n")
    assert unpreprocess(ctx(), pbZ).problem_type == ProblemSolverType.inequalities_Z


def test_merge_duplicate_constraints():
    pb = bx.parse_lp(
        "minimize\nobj: x + y\n"
        "st\nc1: x + y <= 5\nc2: x + y <= 3\nc3: x + y >= 1\nc4: x + z >= 1\nend\n"
    )
    merged = make_merged_constraints(ctx(), unpreprocess(ctx(), pb))
    assert len(merged) == 2
    xy = next(m for m in merged if len(m.elements) == 2 and m.elements[1].variable_index == 1)
    assert (xy.min, xy.max) == (1, 3)


def test_merge_conflicting_equalities_raise():
    pb = bx.parse_lp(
        "minimize\nobj: x + y\nst\nc1: x + y = 1\nc2: x + y = 2\nend\n"
    )
    with pytest.raises(bx.ProblemDefinitionError):
        make_merged_constraints(ctx(), unpreprocess(ctx(), pb))


def test_merge_equality_within_inequality_interval():
    pb = bx.parse_lp(
        "minimize\nobj: x + y\nst\nc1: x + y <= 2\nc2: x + y = 1\nend\n"
    )
    merged = make_merged_constraints(ctx(), unpreprocess(ctx(), pb))
    assert len(merged) == 1
    assert (merged[0].min, merged[0].max) == (1, 1)

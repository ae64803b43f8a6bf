"""LP parser tests, modeled on the reference's io test strategy
(reference: lib/test/io.cpp:42-736): golden asserts on factors/indices for
small hand-written models, quadratic-objective variants, and write→reparse
round trips."""

import io

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.model import INT_INF, ObjectiveType, VariableType


def test_named_objective():
    pb = bx.parse_lp("maximize\nx0: +x1 + 2x2 + 3x3 - 100\nend\n")
    assert pb.type == ObjectiveType.maximize
    assert [(e.factor, e.variable_index) for e in pb.objective.elements] == [
        (1.0, 0),
        (2.0, 1),
        (3.0, 2),
    ]
    assert pb.objective.value == -100.0


def test_unnamed_objective_st_colon():
    pb = bx.parse_lp("maximize\nst: x1 + x2 + x3 = 1\nend\n")
    assert len(pb.objective.elements) == 0
    assert len(pb.vars.names) == 3
    assert len(pb.equal_constraints) == 1
    assert len(pb.less_constraints) == 0
    assert len(pb.greater_constraints) == 0


def test_small_lp():
    pb = bx.parse_lp(
        "maximize\n"
        "obj: x1 + 2x2 + 3x3 - 100\n"
        "st\n"
        "time:  -x1 + x2 + x3 <= 20\n"
        "labor:  x1 - 3x2 + x3 <= 30\n"
        "test: x1 - 3x2 + x3 <= -5\n"
        "bounds\n"
        "x1 <= 40\n"
        "end\n"
    )
    assert pb.type == ObjectiveType.maximize
    assert pb.objective.value == -100.0
    assert len(pb.less_constraints) == 3
    c0 = pb.less_constraints[0]
    assert [(e.factor, e.variable_index) for e in c0.elements] == [
        (-1, 0),
        (1, 1),
        (1, 2),
    ]
    assert c0.value == 20
    assert pb.less_constraints[2].value == -5
    assert pb.vars.names == ["x1", "x2", "x3"]
    assert pb.vars.values[0].max == 40
    assert pb.vars.values[1].max == INT_INF
    assert pb.less_constraints[0].label == "time"


def test_operators_and_synonyms():
    pb = bx.parse_lp(
        "minimize\nobj: x + y\n"
        "subject to\n"
        "a: x + y >= 1\n"
        "b: x + y =< 2\n"
        "c: x - y => -1\n"
        "d: x + y = 1\n"
        "end\n"
    )
    assert len(pb.greater_constraints) == 2
    assert len(pb.less_constraints) == 1
    assert len(pb.equal_constraints) == 1
    # constraint ids follow file order across lists
    assert pb.greater_constraints[0].id == 0
    assert pb.less_constraints[0].id == 1
    assert pb.greater_constraints[1].id == 2
    assert pb.equal_constraints[0].id == 3


def test_duplicate_variable_merge():
    pb = bx.parse_lp("minimize\nobj: x + 2x + y\nst\nc: x + x + y >= 1\nend\n")
    assert [(e.factor, e.variable_index) for e in pb.objective.elements] == [
        (3.0, 0),
        (1.0, 1),
    ]
    assert [(e.factor, e.variable_index) for e in pb.greater_constraints[0].elements] == [
        (2, 0),
        (1, 1),
    ]


def test_binary_and_general_sections():
    pb = bx.parse_lp(
        "minimize\nobj: x + y + z\nst\nc: x + y + z >= 1\n"
        "binary\nx\ny\ngeneral\nz\nend\n"
    )
    assert pb.vars.values[0].type == VariableType.binary
    assert pb.vars.values[0].min == 0 and pb.vars.values[0].max == 1
    assert pb.vars.values[2].type == VariableType.general


def test_double_sided_bounds():
    pb = bx.parse_lp(
        "minimize\nobj: x + y\nst\nc: x + y >= 1\nbounds\n0 <= x <= 1\n-3 <= y <= 5\nend\n"
    )
    assert (pb.vars.values[0].min, pb.vars.values[0].max) == (0, 1)
    assert (pb.vars.values[1].min, pb.vars.values[1].max) == (-3, 5)


def test_quadratic_objective():
    pb = bx.parse_lp(
        "minimize\nobj: x + [ 2 x * y + 4 y ^ 2 ] / 2\nst\nc: x + y >= 1\nend\n"
    )
    assert len(pb.objective.qelements) == 2
    q0 = pb.objective.qelements[0]
    assert q0.factor == 1.0  # 2/2
    assert (q0.variable_index_a, q0.variable_index_b) == (0, 1)
    q1 = pb.objective.qelements[1]
    assert q1.factor == 2.0  # 4/2
    assert (q1.variable_index_a, q1.variable_index_b) == (1, 1)


def test_negative_quadratic_block():
    pb = bx.parse_lp(
        "maximize\nobj: x - [ 2 x * y ] / 2\nst\nc: x + y >= 1\nend\n"
    )
    assert pb.objective.qelements[0].factor == -1.0


def test_empty_quadratic_block():
    pb = bx.parse_lp(
        "maximize\nobj: x1 + 2x2 + 3x3 - [] /2 - 100\nst\nc: x1 + x2 + x3 <= 2\nend\n"
    )
    assert len(pb.objective.qelements) == 0
    assert pb.objective.value == -100.0


def test_comments_ignored():
    pb = bx.parse_lp(
        "\\ header comment\nminimize\nobj: x + y \\ trailing\n"
        "st\nc: x + y >= 1\nend\n"
    )
    assert len(pb.objective.elements) == 2


def test_missing_end_raises():
    with pytest.raises(bx.FileFormatError):
        bx.parse_lp("minimize\nobj: x\nst\nc: x >= 1\n")


def test_bad_objective_type_raises():
    with pytest.raises(bx.FileFormatError):
        bx.parse_lp("frobnicate\nobj: x\nend\n")


def test_bound_on_unknown_variable_raises():
    with pytest.raises(bx.FileFormatError):
        bx.parse_lp("minimize\nobj: x\nst\nc: x >= 1\nbounds\ny <= 3\nend\n")


def test_make_problem_from_stream():
    ctx = bx.make_context(0)
    pb = bx.make_problem(ctx, io.StringIO("minimize\nobj: x\nst\nc: x >= 1\nend\n"))
    assert pb.vars.names == ["x"]


def test_roundtrip_write_parse():
    pb = bx.parse_lp(
        "minimize\nobj: 2 x1 - 3 x2 + x3 + 7\n"
        "st\nc1: x1 + x2 - x3 <= 2\nc2: x1 - x2 >= -1\nc3: x1 + x3 = 1\n"
        "binary\nx1 x2 x3\nend\n"
    )
    text = bx.write_problem(pb)
    pb2 = bx.parse_lp(text)
    assert pb2.type == pb.type
    assert pb2.objective.value == pb.objective.value
    assert [(e.factor, e.variable_index) for e in pb2.objective.elements] == [
        (e.factor, e.variable_index) for e in pb.objective.elements
    ]
    assert len(pb2.equal_constraints) == 1
    assert len(pb2.less_constraints) == 1
    assert len(pb2.greater_constraints) == 1
    assert [e.factor for e in pb2.less_constraints[0].elements] == [1, 1, -1]


def test_min_max_objective():
    pb = bx.parse_lp("minimize\nobj: 2 x - 3 y + 5\nst\nc: x + y >= 1\nend\n")
    lo, hi = bx.compute_min_max_objective_function(pb.objective)
    assert lo == 2.0  # 5 - 3
    assert hi == 7.0  # 5 + 2

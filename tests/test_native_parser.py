"""Native C++ LP parser: availability and parity with the Python parser."""

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.generators import (
    n_queens_lp,
    random_knapsack_101_lp,
    random_set_cover_lp,
)
from baryonyx_tpu.native.build import native_available
from baryonyx_tpu.native.lp import parse_lp_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def same_problem(a, b):
    assert a.type == b.type
    assert a.vars.names == b.vars.names
    assert [(v.min, v.max, v.type) for v in a.vars.values] == [
        (v.min, v.max, v.type) for v in b.vars.values
    ]
    assert a.objective.value == b.objective.value
    assert [(e.factor, e.variable_index) for e in a.objective.elements] == [
        (e.factor, e.variable_index) for e in b.objective.elements
    ]
    assert [
        (q.factor, q.variable_index_a, q.variable_index_b)
        for q in a.objective.qelements
    ] == [
        (q.factor, q.variable_index_a, q.variable_index_b)
        for q in b.objective.qelements
    ]
    for la, lb in (
        (a.equal_constraints, b.equal_constraints),
        (a.greater_constraints, b.greater_constraints),
        (a.less_constraints, b.less_constraints),
    ):
        assert len(la) == len(lb)
        for ca, cb in zip(la, lb):
            assert ca.label == cb.label
            assert ca.value == cb.value
            assert [(e.factor, e.variable_index) for e in ca.elements] == [
                (e.factor, e.variable_index) for e in cb.elements
            ]


@pytest.mark.parametrize(
    "text",
    [
        n_queens_lp(6),
        random_set_cover_lp(20, 50, 0.15, seed=3),
        random_knapsack_101_lp(15, seed=4),
        "maximize\nobj: x1 + 2x2 + 3x3 - 100\nst\n"
        "time: -x1 + x2 + x3 <= 20\nbounds\nx1 <= 40\n-2 <= x2 <= 5\nend\n",
        "minimize\nobj: x + [ 2 x * y + 4 y ^ 2 ] / 2\nst\nc: x + y >= 1\nend\n",
        # digit-led double bounds + '#' in names (reference fixtures
        # prevl1/verger_5_5/vm.lp use both; a digit-only token must read
        # as the left bound, not a variable name)
        "minimize\nobj: Tr#1#0 + Ts#2#0\nst\nc: Tr#1#0 + Ts#2#0 >= 1\n"
        "bounds\n0 <= Tr#1#0 <= 1\n0 <= Ts#2#0 <= 1\nend\n",
    ],
)
def test_native_matches_python(tmp_path, text):
    path = tmp_path / "model.lp"
    path.write_text(text)
    native = parse_lp_native(str(path))
    assert native is not None
    python = bx.parse_lp(text)
    same_problem(native, python)


def test_native_error(tmp_path):
    path = tmp_path / "bad.lp"
    path.write_text("frobnicate\nobj: x\nend\n")
    with pytest.raises(bx.FileFormatError):
        parse_lp_native(str(path))


def test_string_parse_routes_native(monkeypatch):
    """parse_lp(text) routes large inputs through lp_parse_buffer and
    must agree with the pure-Python tokenizer."""
    text = random_set_cover_lp(300, 1500, 0.03, seed=8)
    assert len(text) > 65536, "fixture must exceed the native threshold"
    native = bx.parse_lp(text)
    monkeypatch.setenv("BARYONYX_TPU_NO_NATIVE", "1")
    python = bx.parse_lp(text)
    same_problem(native, python)

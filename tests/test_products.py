"""Product-fold preprocessor (preprocess/products.py).

The fold must be exact: a bijection between feasible sets with matching
objectives. Tested by brute-force enumeration on a synthetic grid and by
the QAP small4 acceptance fixture (reference: lib/test/optimize.cpp:55-87)."""

import itertools

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.model import Problem
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.products import fold_linearized_products
from baryonyx_tpu.validate import (
    compute_solution,
    compute_solution_values,
    is_valid_solution,
    is_valid_solution_values,
)

SMALL4 = "/root/reference/lib/test/small4.lp"


def _grid_lp(onehot_u=True, onehot_v=True, cost=None):
    """K=3 x L=2 grid: y_kl = u_k * v_l with one-hot marginals."""
    K, L = 3, 2
    cost = cost or {}
    lines = ["minimize"]
    terms = []
    for k in range(K):
        for l in range(L):
            terms.append(f"{cost.get((k, l), (k + 1) * (l + 2))} y_{k}_{l}")
    terms += [f"{3 + k} u_{k}" for k in range(K)]
    lines.append(" + ".join(terms))
    lines.append("subject to")
    for k in range(K):
        lines.append(
            " + ".join(f"y_{k}_{l}" for l in range(L)) + f" - u_{k} = 0"
        )
    for l in range(L):
        lines.append(
            " + ".join(f"y_{k}_{l}" for k in range(K)) + f" - v_{l} = 0"
        )
    if onehot_u:
        lines.append(" + ".join(f"u_{k}" for k in range(K)) + " = 1")
    if onehot_v:
        lines.append(" + ".join(f"v_{l}" for l in range(L)) + " = 1")
    lines.append("binary")
    lines.append(
        " ".join(f"u_{k}" for k in range(K))
        + " "
        + " ".join(f"v_{l}" for l in range(L))
        + " "
        + " ".join(f"y_{k}_{l}" for k in range(K) for l in range(L))
    )
    lines.append("end")
    return "\n".join(lines)


def _enumerate_feasible(pb):
    n = len(pb.vars.values)
    out = []
    for bits in itertools.product((0, 1), repeat=n):
        if is_valid_solution_values(pb, bits):
            out.append((bits, compute_solution_values(pb, bits)))
    return out


def test_grid_fold_detected():
    ctx = bx.make_context(0)
    pb = bx.parse_lp(_grid_lp())
    folded = fold_linearized_products(ctx, Problem.from_raw(pb))
    assert len(folded.derived_vars) == 6
    assert len(folded.vars.values) == 5  # 3 u + 2 v
    assert folded.n_constraints == 2  # the two one-hot rows
    assert len(folded.objective.qelements) == 6


def test_grid_fold_exact_by_enumeration():
    ctx = bx.make_context(0)
    raw = bx.parse_lp(_grid_lp())
    folded = fold_linearized_products(ctx, Problem.from_raw(raw))
    orig = {v: bits for bits, v in _enumerate_feasible(raw)}
    fold = {v: bits for bits, v in _enumerate_feasible(folded)}
    # same set of objective values (bijection on feasible assignments)
    assert sorted(orig) == sorted(fold)


def test_no_fold_without_onehot():
    """Without the one-hot marginal rows the outer-product equality is not
    forced — the pass must leave the problem untouched."""
    ctx = bx.make_context(0)
    raw = bx.parse_lp(_grid_lp(onehot_u=False))
    folded = fold_linearized_products(ctx, Problem.from_raw(raw))
    assert len(folded.derived_vars) == 0
    assert folded is not None and folded.n_constraints == raw.n_constraints


def test_no_fold_on_plain_cover():
    ctx = bx.make_context(0)
    raw = bx.parse_lp(
        "minimize\nx + 2 y + 3 z\nsubject to\n"
        "x + y >= 1\ny + z >= 1\nbinary\nx y z\nend"
    )
    folded = fold_linearized_products(ctx, Problem.from_raw(raw))
    assert len(folded.derived_vars) == 0


def test_small4_folds_to_assignment():
    ctx = bx.make_context(0)
    raw = bx.parse_lp(open(SMALL4).read())
    pb = fold_linearized_products(ctx, preprocess(ctx, raw))
    assert len(pb.vars.values) == 16
    assert pb.n_constraints == 8
    assert len(pb.derived_vars) == 256
    assert pb.objective.qelements  # quadratic QAP costs


def test_small4_optimize_reaches_790():
    """The acceptance bar the reference itself cannot pass on a 2-core
    host (optimize.cpp:55-87: exact optimum 790): after the fold the
    problem is a 16-var assignment polytope, solved to optimality in
    seconds."""
    raw = bx.parse_lp(open(SMALL4).read())
    ctx = bx.make_context(0)
    p = ctx.parameters
    p.seed = 123456789
    p.time_limit = 10.0
    p.theta, p.delta = 0.5, 0.2
    p.kappa_step, p.kappa_max = 1e-3, 0.6
    p.alpha, p.w = 0.0, 20
    r = bx.optimize(ctx, raw)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(raw, r)
    assert compute_solution(raw, r) == pytest.approx(790.0)


def test_sol_roundtrip_includes_derived(tmp_path):
    from baryonyx_tpu.io.sol_io import write_result

    raw = bx.parse_lp(open(SMALL4).read())
    ctx = bx.make_context(0)
    p = ctx.parameters
    p.seed = 1
    p.time_limit = 6.0
    r = bx.optimize(ctx, raw)
    assert r.status == bx.ResultStatus.success
    text = write_result(r)
    # every original variable must appear in the .sol
    names = {
        line.split("=")[0] for line in text.splitlines() if "=" in line and
        not line.startswith("\\")
    }
    assert set(raw.vars.names) <= names

"""CSV benchmark-harness tests (reference: app/src/benchmark.cpp —
load :418+, save :317-331, save_stats :333-416). Mirrors the protocol:
column 1 model name, column 2 best-known objective, then one column per
recorded solver run; running the harness appends a column, rewrites the
CSV, and writes <name>-stats.csv with per-model/mean/final ranks."""

import csv
import os

import baryonyx_tpu as bx
from baryonyx_tpu.bench.harness import BenchData, benchmark
from baryonyx_tpu.generators import random_assignment_lp, random_set_cover_lp


def _write_suite(tmp_path):
    (tmp_path / "cover1.lp").write_text(
        random_set_cover_lp(12, 40, density=0.2, seed=3)
    )
    (tmp_path / "assign1.lp").write_text(random_assignment_lp(3, seed=4))
    csv_path = tmp_path / "suite.csv"
    csv_path.write_text(
        "file,optimum,other-solver\n"
        "cover1,10,12\n"
        "assign1,50,inf\n"
        "missing-model,1,2\n"
    )
    return str(csv_path)


def _ctx():
    ctx = bx.make_context(0)
    ctx.parameters.time_limit = 4.0
    ctx.parameters.limit = 200
    ctx.parameters.thread = 8
    ctx.parameters.seed = 11
    return ctx


def test_benchmark_appends_column_and_stats(tmp_path):
    csv_path = _write_suite(tmp_path)
    assert benchmark(_ctx(), csv_path, "bx-test") == 0

    data = BenchData.load(csv_path)
    assert data.header == ["file", "optimum", "other-solver", "bx-test"]
    rows = {r[0]: r for r in data.rows}
    # solved models carry a finite objective, missing ones "inf"
    # (reference: try_benchmark catches and records inf, :614-780)
    assert float(rows["cover1"][3]) > 0
    assert float(rows["assign1"][3]) > 0
    assert rows["missing-model"][3] == "inf"

    stats_path = os.path.splitext(csv_path)[0] + "-stats.csv"
    assert os.path.exists(stats_path)
    with open(stats_path) as fh:
        stats = [row for row in csv.reader(fh) if row]
    assert stats[0] == ["model", "other-solver", "bx-test"]
    labels = [r[0] for r in stats]
    assert "mean-rank" in labels and "final-rank" in labels
    # final rank row assigns each solver a distinct 1..N rank
    final = stats[labels.index("final-rank")][1:]
    assert sorted(final) == ["1", "2"]


def test_benchmark_duplicate_column_gets_suffix(tmp_path):
    csv_path = _write_suite(tmp_path)
    assert benchmark(_ctx(), csv_path, "other-solver") == 0
    data = BenchData.load(csv_path)
    # reference warns and appends anyway; we disambiguate with a suffix
    assert data.header[-1] == "other-solver-2"


def test_contradiction_cover_generator():
    """The head-to-head treadmill instance (scripts/head_to_head.py) must
    parse, survive preprocessing un-fixed, and be infeasible by
    construction (row A needs >= 60% of a group set, row B caps the group
    minus one variable at 25%)."""
    from baryonyx_tpu.core.context import make_context
    from baryonyx_tpu.generators import contradiction_cover_lp
    from baryonyx_tpu.io.lp_parse import parse_lp
    from baryonyx_tpu.preprocess.fixing import preprocess

    pb = parse_lp(contradiction_cover_lp(5, 20, seed=1))
    assert len(pb.vars.values) == 100
    assert len(pb.greater_constraints) == 5
    assert len(pb.less_constraints) == 5
    out = preprocess(make_context(0), pb)
    # nothing fixable: the contradiction must survive to the solver
    assert len(out.vars.values) == 100
    # infeasibility: A requires >= 12 of the 20, B allows <= 5 of the
    # first 19 -> A - B <= x_last + 5 < 12 for any 0/1 assignment
    import itertools

    hi = int(pb.greater_constraints[0].value)
    lo = int(pb.less_constraints[0].value)
    assert hi > lo + 1  # x_last alone cannot bridge the gap

"""float32-vs-float64 objective parity (VERDICT r3 item 7).

The reference defaults to double and offers long double
(reference: itm-common.hpp:1486-1494, float_sel). Here float32 is the
device fast path; this battery asserts that on the reference fixture
classes the f32 run reaches the same objectives as f64 — the evidence
behind the float-policy warning in solver/optimize.py.

delta/cost normalization always run in f64 on host (solver/common.py),
so the only device-precision surface is the sweep arithmetic itself.
"""

import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.params import FloatType
from baryonyx_tpu.validate import compute_solution, is_valid_solution

FIXTURES = [
    "/root/reference/lib/test/assignment_problem_1.lp",
    "/root/reference/lib/test/8_queens_puzzle.lp",
    "/root/reference/lib/test/negative-coeff.lp",
]


def _run(path, ft, mode):
    with open(path) as fh:
        pb = bx.parse_lp(fh.read())
    ctx = bx.make_context(0)
    p = ctx.parameters
    p.seed = 11
    p.float_type = ft
    p.limit = 2000
    p.time_limit = 8.0
    r = bx.solve(ctx, pb) if mode == "solve" else bx.optimize(ctx, pb)
    assert r.status == bx.ResultStatus.success, (path, ft, r.status)
    assert is_valid_solution(pb, r)
    return compute_solution(pb, r)


@pytest.mark.parametrize("path", FIXTURES)
def test_f32_matches_f64_solve(path):
    v32 = _run(path, FloatType.float32, "solve")
    v64 = _run(path, FloatType.float64, "solve")
    # stochastic solver: identical seeds but different rounding may pick
    # different (equally valid) solutions; the fixture classes all reach
    # their optimum under both dtypes
    assert v32 == v64


def test_f32_matches_f64_optimize_scp():
    from baryonyx_tpu.generators import random_set_cover_lp

    text = random_set_cover_lp(40, 120, 0.08, seed=3)
    pb = bx.parse_lp(text)
    vals = {}
    for ft in (FloatType.float32, FloatType.float64):
        ctx = bx.make_context(0)
        p = ctx.parameters
        p.seed = 5
        p.float_type = ft
        p.time_limit = 4.0
        r = bx.optimize(ctx, pb)
        assert r.status == bx.ResultStatus.success
        assert is_valid_solution(pb, r)
        vals[ft] = compute_solution(pb, r)
    # equal-budget quality parity within 2% (stochastic trajectories)
    lo, hi = sorted(vals.values())
    assert hi - lo <= 0.02 * max(hi, 1.0), vals


def test_f32_ranking_resolution_telebus_scale():
    """VERDICT r4 item 5: telebus-class costs are ~1e5-1e6 with
    unit-scale differences — exactly where the reference's double
    default matters (itm-common.hpp:1486-1494). The device ranks
    NORMALIZED costs (host-side f64 normalization, solver/common.py);
    this asserts the f32 cast of those normalized costs preserves the
    strict order for every pair that is distinct in f64 — i.e. f32
    selection cannot misrank telebus-scale reduced costs."""
    import numpy as np

    from baryonyx_tpu.core.params import CostNormType
    from baryonyx_tpu.generators import telebus_crew_lp
    from baryonyx_tpu.solver import common

    pb = bx.parse_lp(telebus_crew_lp(150, 12, 4, seed=3))
    n = len(pb.vars.values)
    c = common.build_cost_vector(pb, n)
    assert c.max() >= 1e5  # telebus-scale magnitudes
    rng = np.random.default_rng(0)
    for norm in (CostNormType.loo, CostNormType.l1, CostNormType.l2,
                 CostNormType.none):
        cn64 = common.normalize_costs(c, norm, rng)
        cn32 = cn64.astype(np.float32)
        o64 = np.argsort(cn64, kind="stable")
        s64 = cn64[o64]
        s32 = cn32[o64]
        # every strictly-increasing step in f64 stays non-decreasing and
        # every strict step bigger than one ulp stays strict in f32
        d64 = np.diff(s64)
        d32 = np.diff(s32.astype(np.float64))
        assert (d32[d64 > 0] >= 0).all(), f"f32 inverts order under {norm}"
        collapsed = int(((d64 > 0) & (d32 == 0)).sum())
        # unit differences at 1e6 scale are ~1e-6 relative — above f32
        # resolution (2^-23); nothing may collapse
        assert collapsed == 0, f"{collapsed} pairs collapse under {norm}"


def test_f32_matches_f64_optimize_telebus():
    """End-to-end equal-budget parity on large-cost set partitioning."""
    from baryonyx_tpu.generators import telebus_crew_lp

    pb = bx.parse_lp(telebus_crew_lp(60, 8, 3, seed=2))
    vals = {}
    for ft in (FloatType.float32, FloatType.float64):
        ctx = bx.make_context(0)
        p = ctx.parameters
        p.seed = 5
        p.float_type = ft
        p.time_limit = 6.0
        r = bx.optimize(ctx, pb)
        assert r.status == bx.ResultStatus.success
        assert is_valid_solution(pb, r)
        vals[ft] = compute_solution(pb, r)
    lo, hi = sorted(vals.values())
    assert hi - lo <= 0.02 * max(hi, 1.0), vals

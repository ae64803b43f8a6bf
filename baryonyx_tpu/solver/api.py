"""Library façade: preprocessing + mode routing.

reference: lib/src/lpcore.cpp:88-132 (solve/optimize entry points) and
lib/src/itm.hpp:94-254 (dispatch on problem type / solver type / meta mode).

The reference dispatches to six per-coefficient-shape template
instantiations; the TPU kernel is a single masked implementation covering
eq/ineq × 0-1/±1 rows, with ℤ-coefficient rows routed to the exact per-row
subsolver path (SURVEY.md section 2.5).
"""

from __future__ import annotations

from typing import Optional

from baryonyx_tpu.core.context import Context
from baryonyx_tpu.core.errors import SolverError
from baryonyx_tpu.core.model import Problem, RawProblem
from baryonyx_tpu.core.params import ModeType, PreprocessorOptions, SolverParameters
from baryonyx_tpu.core.result import Result, ResultStatus
from baryonyx_tpu.preprocess.fixing import preprocess as _preprocess
from baryonyx_tpu.preprocess.fixing import unpreprocess as _unpreprocess


def _prepare(ctx: Context, raw: RawProblem) -> Problem:
    params = ctx.parameters
    if params.preprocessor == PreprocessorOptions.all:
        from baryonyx_tpu.preprocess.products import fold_linearized_products

        return fold_linearized_products(ctx, _preprocess(ctx, raw))
    return _unpreprocess(ctx, raw)


def solve(ctx: Context, raw: RawProblem) -> Result:
    """reference: lpcore.cpp:88-98."""
    if ctx.start_cb:
        ctx.start_cb(ctx.parameters)
    ctx.parameters = ctx.parameters.validated()
    pb = _prepare(ctx, raw)
    from baryonyx_tpu.solver.solve import solve_compiled

    return solve_compiled(ctx, pb)


def optimize(ctx: Context, raw: RawProblem) -> Result:
    """reference: lpcore.cpp:100-132."""
    if ctx.start_cb:
        ctx.start_cb(ctx.parameters)
    ctx.parameters = ctx.parameters.validated()
    params = ctx.parameters

    if params.mode & ModeType.branch:
        from baryonyx_tpu.solver.meta import branch_optimize

        return branch_optimize(ctx, raw)
    if params.mode & ModeType.nlopt:
        from baryonyx_tpu.solver.meta import nelder_mead_optimize

        return nelder_mead_optimize(ctx, raw)
    if params.mode & ModeType.manual:
        from baryonyx_tpu.solver.meta import manual_optimize

        return manual_optimize(ctx, raw)

    pb = _prepare(ctx, raw)
    from baryonyx_tpu.solver.optimize import optimize_compiled

    return optimize_compiled(ctx, pb)

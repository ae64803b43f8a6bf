"""baryonyx-tpu: a TPU-native 0-1 integer linear program solver.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
baryonyx C++ solver (Wedelin-style Lagrangian dual-descent heuristic,
reference: quesnel/baryonyx v0.5.0):

- CPLEX LP-format reader/writer (``baryonyx_tpu.io``), mirroring the grammar
  of the reference parser (reference: lib/src/parser.cpp).
- Variable-fixing preprocessor and constraint merging
  (``baryonyx_tpu.preprocess``; reference: lib/src/preprocessor.cpp,
  lib/src/merged-constraint.cpp).
- The Wedelin "in-the-middle" inner loop as batched masked dense updates on
  a blocked constraint-matrix layout in HBM (``baryonyx_tpu.ops``;
  reference: lib/src/itm-common.hpp, lib/src/itm-solver-*.cpp).
- ``solve`` (single run feasibility) and ``optimize`` (evolutionary
  multi-start) drivers where the reference's thread pool becomes vmapped
  replica batches sharded over a TPU mesh (``baryonyx_tpu.solver``;
  reference: lib/src/itm-solver-common.hpp, lib/src/itm-optimizer-common.hpp).

Public API mirrors the reference's ``lib/include/baryonyx/core`` entry
points (reference: core:788-858): ``make_problem``, ``solve``, ``optimize``,
``is_valid_solution``, ``compute_solution``.
"""

from baryonyx_tpu.runtime import setup_cache as _setup_cache
from baryonyx_tpu.core.context import Context, make_context
from baryonyx_tpu.core.errors import (
    BaryonyxError,
    FileFormatError,
    ProblemDefinitionError,
    SolverError,
)
from baryonyx_tpu.core.model import (
    Constraint,
    FunctionElement,
    ObjectiveFunction,
    ObjectiveQuadraticTerm,
    ObjectiveType,
    OperatorType,
    Problem,
    ProblemSolverType,
    RawProblem,
    VariableType,
)
from baryonyx_tpu.core.params import (
    ConstraintOrder,
    CostNormType,
    FloatType,
    InitPolicyType,
    ModeType,
    ObserverType,
    PreConstraintOrder,
    PreprocessorOptions,
    SolverParameters,
    SolverType,
    StorageType,
)
from baryonyx_tpu.core.result import Result, ResultStatus, Solution
from baryonyx_tpu.io.lp_parse import make_problem, parse_lp
from baryonyx_tpu.io.lp_write import write_problem
from baryonyx_tpu.io.sol_io import make_result, write_result
from baryonyx_tpu.validate import (
    compute_min_max_objective_function,
    compute_solution,
    is_valid_solution,
)

__version__ = "0.1.0"


def solve(ctx: Context, problem: RawProblem) -> Result:
    """Find a feasible solution (single solver run).

    Mirrors ``baryonyx::solve`` (reference: lib/src/lpcore.cpp:88-98):
    preprocess according to ``ctx.parameters.preprocessor`` then run the
    inner solver once.
    """
    from baryonyx_tpu.solver.api import solve as _solve

    _setup_cache()  # lazily, once the backend is decided
    return _solve(ctx, problem)


def optimize(ctx: Context, problem: RawProblem) -> Result:
    """Optimize with the evolutionary multi-start solver.

    Mirrors ``baryonyx::optimize`` (reference: lib/src/lpcore.cpp:100-132):
    route to the manual/nlopt/branch meta-optimizers per ``ctx.parameters.mode``
    or run the batched-replica optimizer.
    """
    from baryonyx_tpu.solver.api import optimize as _optimize

    _setup_cache()
    return _optimize(ctx, problem)

"""Device-side compute: blocked problem layout and the Wedelin sweep kernel.

reference: the L4 solver kernels (lib/src/itm-solver-*.cpp,
lib/src/itm-common.hpp, lib/src/sparse-matrix.hpp) re-designed as masked
dense updates over a padded row/column layout (SURVEY.md section 7).
"""

from baryonyx_tpu.ops.layout import CompiledProblem, compile_problem

"""I/O: CPLEX LP-format reader/writer and .sol result files.

reference: lib/src/parser.cpp, lib/src/problem.hpp (writer),
lib/src/result.cpp / result.hpp (.sol files).
"""

from baryonyx_tpu.io.lp_parse import make_problem, parse_lp
from baryonyx_tpu.io.lp_write import write_problem
from baryonyx_tpu.io.sol_io import make_result, write_result

"""Preprocessing: variable fixing, constraint merging, classification.

reference: lib/src/preprocessor.cpp, lib/src/merged-constraint.cpp,
lib/src/problem.hpp (which_problem_type).
"""

from baryonyx_tpu.preprocess.fixing import affect, preprocess, split, unpreprocess
from baryonyx_tpu.preprocess.merge import MergedConstraint, make_merged_constraints

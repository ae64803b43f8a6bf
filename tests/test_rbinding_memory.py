"""R-binding surface (reference: rbaryonyx/src/rbaryonyx.cpp) and memory
accounting (reference: lib/src/memory.{hpp,cpp})."""

import os

from baryonyx_tpu import memory
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.rbinding import optimize_01lp_problem, solve_01lp_problem


def _write_lp(tmp_path, name, text):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as fh:
        fh.write(text)
    return p


def test_rbinding_solve(tmp_path):
    path = _write_lp(tmp_path, "scp.lp", random_set_cover_lp(10, 30, 0.2, seed=5))
    r = solve_01lp_problem(
        path, time_limit=30.0, seed=7, float_type=0, verbose=False
    )
    assert not r["error_found"]
    assert r["solution_found"]
    assert r["minimize"]
    assert r["constraints"] > 0
    assert r["remaining_constraints"] == 0
    assert r["solutions"]


def test_rbinding_optimize(tmp_path):
    path = _write_lp(tmp_path, "scp.lp", random_set_cover_lp(8, 24, 0.25, seed=6))
    r = optimize_01lp_problem(
        path, time_limit=5.0, seed=7, float_type=0, verbose=False
    )
    assert not r["error_found"]
    assert r["solution_found"]
    assert r["value"] > 0


def test_rbinding_error_path(tmp_path):
    r = solve_01lp_problem(os.path.join(tmp_path, "missing.lp"), verbose=False)
    assert r["error_found"]
    assert not r["solution_found"]


def test_memory_accounting():
    pb = parse_lp(random_set_cover_lp(10, 30, 0.2, seed=5))
    total = memory.memory_consumed(pb)
    assert total > 1000  # nonzero, scales with elements
    v, unit = memory.memory_consumed_size(total)
    assert unit in ("B", "KB", "MB", "GB")
    assert "KB" in memory.to_string(2048) or "B" in memory.to_string(2048)
    stats = memory.device_memory_stats()
    assert isinstance(stats, dict)

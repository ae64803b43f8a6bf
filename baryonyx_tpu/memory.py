"""Memory accounting: estimate bytes used by problem structures and
report device (HBM) usage.

TPU-native replacement for the reference's host-struct byte accounting
(reference: lib/src/memory.hpp:42-86, memory.cpp:33-60): the same
``memory_consumed`` estimates for the host-side problem model, plus the
sizes that actually matter here — the compiled device arrays and the
live-buffer totals JAX reports for the chip.
"""

from __future__ import annotations

from typing import Tuple

from baryonyx_tpu.core.model import Problem, RawProblem


def memory_consumed_size(size: float) -> Tuple[float, str]:
    """Scale a byte count into (value, unit)
    (reference: memory.hpp:42-65)."""
    kb = size / 1024.0
    mb = kb / 1024.0
    gb = mb / 1024.0
    if gb > 0.5:
        return gb, "GB"
    if mb > 0.5:
        return mb, "MB"
    if kb > 0.5:
        return kb, "KB"
    return float(size), "B"


def to_string(size: float) -> str:
    v, unit = memory_consumed_size(size)
    return f"{v:.2f} {unit}"


def memory_consumed(pb: RawProblem | Problem) -> int:
    """Estimated bytes held by a problem's python-side model
    (reference: memory.cpp memory_consumed(raw_problem) — element counts
    times the reference's struct sizes, which we keep for comparability:
    16 B per linear/constraint element, 24 B per quadratic element,
    8 B per variable record)."""
    total = 64
    total += 16 * len(pb.objective.elements)
    total += 24 * len(pb.objective.qelements)
    for group in (pb.equal_constraints, pb.greater_constraints, pb.less_constraints):
        for cst in group:
            total += 32 + 16 * len(cst.elements)
    total += 8 * len(pb.vars.values)
    for name in pb.vars.names:
        total += len(name)
    av = getattr(pb, "affected_vars", None)
    if av is not None:
        total += len(av.values)
        for name in av.names:
            total += len(name)
    return total


def compiled_memory_consumed(cp) -> int:
    """Bytes of the padded device layout for one replica-less instance
    (multiply the per-replica terms by R for a full optimize state)."""
    total = 0
    for f in (
        cp.row_vars, cp.row_factor, cp.row_mask, cp.col_rows, cp.col_slots,
        cp.col_mask, cp.bmin, cp.bmax, cp.neg_count, cp.r_size, cp.is_eq,
        cp.assign_bits, cp.assign_valid, cp.enum_row, cp.quad_var,
        cp.quad_fac, cp.quad_mask, cp.dense_A,
    ):
        if f is not None:
            total += f.size * f.dtype.itemsize
    return total


def replica_state_bytes(cp, R: int, itemsize: int = 4) -> int:
    """Per-chip solver state for R replicas: x, P, pi, S, viol
    (see solver/optimize.py ReplicaState)."""
    per_replica = (
        cp.n  # x
        + cp.m * cp.Kr  # P
        + cp.m  # pi
        + cp.n  # S
        + cp.m  # viol (bool, counted at 1 byte below)
    )
    return (cp.n + cp.m * cp.Kr + cp.m + cp.n) * R * itemsize + cp.m * R


def estimated_peak_bytes(cp, R: int, itemsize: int = 4) -> int:
    """Execution-peak estimate for one chip's share of the optimize
    state: the carried ReplicaState plus the sweep's dominant transients
    — the per-block row gathers accumulate to O(m*Kr*R) and the merged
    column-sum recompute materializes O(n*Kc*R) (ops/sweep.py
    column_sums), each live alongside a donated copy. Measured: a 2.5 GB
    carried state OOMed a 16 GB chip through exactly these transients."""
    transient = 2 * (cp.m * cp.Kr + cp.n * cp.Kc) * R * itemsize
    return replica_state_bytes(cp, R, itemsize) * 2 + transient


def device_memory_stats() -> dict:
    """Live-buffer bytes per device as reported by the runtime
    (the TPU-native analogue of the reference's host estimates)."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats

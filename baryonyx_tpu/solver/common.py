"""Shared solver machinery: cost vectors, normalization, delta, init
policies, constraint-ordering schedules.

reference: lib/src/itm-common.hpp — default_cost_type (:1000-1148),
normalize_costs (:967-998), compute_delta (:917-933), init policies
(:255-374), compute_order (:627-915).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from baryonyx_tpu.core.model import ObjectiveType, Problem
from baryonyx_tpu.core.params import ConstraintOrder, CostNormType, SolverParameters
from baryonyx_tpu.ops.layout import CompiledProblem
from baryonyx_tpu.ops.sweep import activities
from baryonyx_tpu.preprocess.merge import MergedConstraint


def build_cost_vector(pb: Problem, n: int) -> np.ndarray:
    """Dense linear cost accumulation (reference: itm-common.hpp:1006-1016).
    Always float64 on host; cast to the solver dtype after normalization
    (SURVEY.md section 7 hard part (e))."""
    c = np.zeros(n, dtype=np.float64)
    for el in pb.objective.elements:
        c[el.variable_index] += el.factor
    return c


def normalize_costs(
    c: np.ndarray, norm: CostNormType, rng: np.random.Generator
) -> np.ndarray:
    """reference: itm-common.hpp:967-998 + the norm members :1025-1125.

    Quirks preserved: l2 divides by the sum of squares (no sqrt,
    :1105-1115); loo divides by the signed maximum element (:1117-1125);
    the divide is skipped when the divisor is 0/inf/nan/subnormal."""
    c = c.copy()

    def _div(v, d):
        return v / d if np.isfinite(d) and d != 0 and abs(d) >= 2.3e-308 else v

    if norm == CostNormType.none:
        return c
    if norm == CostNormType.l1:
        return _div(c, np.sum(np.abs(c)))
    if norm == CostNormType.l2:
        return _div(c, np.sum(c * c))
    if norm == CostNormType.loo:
        return _div(c, np.max(c)) if c.size else c
    # random: make all values distinct by spreading equal runs over a random
    # epsilon interval, then loo-normalize (reference: :1025-1082)
    order = np.argsort(c, kind="stable")
    sorted_c = c[order]
    out = sorted_c.copy()
    i = 0
    nvals = len(sorted_c)
    while i < nvals:
        j = i
        while j < nvals and sorted_c[j] == sorted_c[i]:
            j += 1
        if j - i > 1:
            lo = sorted_c[i]
            hi = sorted_c[j] if j < nvals else lo + 1.0
            out[i:j] = rng.uniform(lo, hi, size=j - i)
        i = j
    c[order] = out
    return _div(c, np.max(c)) if c.size else c


def normalize_costs_quad(
    c: np.ndarray,
    qfac: np.ndarray,
    norm: CostNormType,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Normalize linear + quadratic factors by a shared divisor
    (reference: quadratic_cost_type::make_*_norm — e.g. loo takes the max
    over both element sets and divides both, itm-common.hpp:1384-1400)."""

    def _apply(div):
        if np.isfinite(div) and div != 0:
            return c / div, qfac / div
        return c.copy(), qfac.copy()

    flat = qfac[qfac != 0]
    if norm == CostNormType.none:
        return c.copy(), qfac.copy()
    if norm == CostNormType.l1:
        return _apply(np.sum(np.abs(c)) + np.sum(np.abs(flat)))
    if norm == CostNormType.l2:
        return _apply(np.sum(c * c) + np.sum(flat * flat))
    # random + loo both end in a loo-style divide
    div = max(np.max(c) if c.size else 0.0, np.max(flat) if flat.size else 0.0)
    return _apply(div)


def min_abs_nonzero(c: np.ndarray) -> float:
    """reference: default_cost_type::min (itm-common.hpp:1084-1094)."""
    nz = np.abs(c[c != 0])
    return float(nz.min()) if nz.size else float(np.finfo(np.float64).max)


def compute_delta(c_norm: np.ndarray, theta: float) -> float:
    """delta auto = min|c| - theta * min|c| (reference: itm-common.hpp:917-933)."""
    mini = min_abs_nonzero(c_norm)
    return mini - theta * mini


def objective_value(pb: Problem, x: np.ndarray) -> float:
    """True objective from the original costs
    (reference: default_cost_type::results, itm-common.hpp:1137-1145)."""
    v = pb.objective.value
    for el in pb.objective.elements:
        v += el.factor * int(x[el.variable_index])
    for q in pb.objective.qelements:
        v += q.factor * int(x[q.variable_index_a]) * int(x[q.variable_index_b])
    return float(v)


# ---------------------------------------------------------------------------
# init policies (host-side, per solve; reference: itm-common.hpp:255-374)
# ---------------------------------------------------------------------------


def init_bastert(c: np.ndarray, minimize: bool, value_if_0: int = 0) -> np.ndarray:
    """x_i = [c_i < 0] for minimize, [c_i > 0] for maximize, value_if_0 at 0
    (reference: init_with_bastert + init_x, itm-common.hpp:202-267)."""
    if minimize:
        x = np.where(c < 0, 1, np.where(c == 0, value_if_0, 0))
    else:
        x = np.where(c > 0, 1, np.where(c == 0, value_if_0, 0))
    return x.astype(np.int32)


def init_random(n: int, p: float, rng: np.random.Generator) -> np.ndarray:
    """reference: init_with_random, itm-common.hpp:269-282."""
    return (rng.random(n) < p).astype(np.int32)


def init_pre_solve(
    c: np.ndarray,
    constraints: List[MergedConstraint],
    minimize: bool,
    rng: np.random.Generator,
    init_random_prob: float,
    optimistic: bool,
    x_out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-constraint greedy fill (reference: init_with_pre_solve,
    itm-common.hpp:284-374): for each constraint (chosen with probability
    ``init_random_prob``), sort its variables by original cost and set the
    smallest (pessimistic) or largest (optimistic) prefix whose factor sum
    satisfies the [min, max] bounds."""
    n = len(c)
    x = np.zeros(n, np.int32) if x_out is None else x_out
    for cst in constraints:
        if rng.random() >= init_random_prob:
            continue
        items = [(float(c[el.variable_index]), el.factor, el.variable_index) for el in cst.elements]
        rng.shuffle(items)
        items.sort(key=lambda t: t[0], reverse=not minimize)
        r_size = len(items)
        if not optimistic:
            best = -2
            ssum = 0
            for i in range(-1, r_size):
                if cst.min <= ssum <= cst.max:
                    best = i
                    break
                if i + 1 < r_size:
                    ssum += items[i + 1][1]
        else:
            best = -2
            ssum = 0
            for i in range(-1, r_size):
                if cst.min <= ssum <= cst.max:
                    best = i
                if best != -2 and i + 1 < r_size:
                    nxt = items[i + 1][0]
                    if (nxt > 0) if minimize else (nxt < 0):
                        break
                if i + 1 < r_size:
                    ssum += items[i + 1][1]
        for i in range(r_size):
            x[items[i][2]] = 1 if i <= best else 0
    return x


def initial_x(
    params: SolverParameters,
    c_orig: np.ndarray,
    constraints: List[MergedConstraint],
    minimize: bool,
    rng: np.random.Generator,
) -> np.ndarray:
    """Solve-mode initialization: policy then Bernoulli(init_policy_random)
    bit inversion (reference: itm-solver-common.hpp:99-123)."""
    from baryonyx_tpu.core.params import InitPolicyType

    if params.init_policy == InitPolicyType.bastert:
        x = init_bastert(c_orig, minimize)
    elif params.init_policy == InitPolicyType.pessimistic_solve:
        x = init_pre_solve(c_orig, constraints, minimize, rng, 1.0, optimistic=False)
    else:
        x = init_pre_solve(c_orig, constraints, minimize, rng, 1.0, optimistic=True)
    flip = rng.random(len(x)) < params.init_policy_random
    return np.where(flip, 1 - x, x).astype(np.int32)


def dual_bound(
    cp, pi: np.ndarray, c_norm: np.ndarray, minimize: bool
) -> float:
    """Lagrangian dual bound: lb = sum_k pi_k b_k + sum_j min(0, c_j -
    sum_k a_kj pi_k), using the row lower bounds for minimize (upper for
    maximize) — reference: bounds_printer, itm-common.hpp:501-625."""
    rv = np.asarray(cp.row_vars)
    rf = np.asarray(cp.row_factor)
    rm = np.asarray(cp.row_mask)
    b = np.asarray(cp.bmin if minimize else cp.bmax, dtype=np.float64)
    n = cp.n
    # one O(nnz) bincount instead of a per-row Python loop — this runs on
    # the 1 Hz progress path, where an O(m) loop stalls 7-20k-row
    # instances (VERDICT r3)
    mr = cp.m_real
    mask = rm[:mr]
    idx = rv[:mr][mask]
    w = (rf[:mr] * np.asarray(pi[:mr], dtype=np.float64)[:, None])[mask]
    sum_a_pi = np.bincount(idx, weights=w, minlength=n)[:n]
    resid = c_norm[: len(sum_a_pi)] - sum_a_pi
    lb = float(np.dot(pi[: cp.m_real], b[: cp.m_real]))
    if minimize:
        lb += float(np.minimum(0.0, resid).sum())
    else:
        lb += float(np.maximum(0.0, resid).sum())
    return lb


# ---------------------------------------------------------------------------
# constraint-ordering schedules (reference: compute_order,
# itm-common.hpp:627-915) — device-side, one permutation per sweep
# ---------------------------------------------------------------------------

# pi_sign_change parity note: the reference's policy is a random shuffle
# over ALL rows (R is filled with iota at init and never refilled,
# itm-common.hpp:671-672, then shuffled per run :864-865). The π-sign
# tracking it computes is discarded: the early return
# `if (!pi_changed && remaining == 0) return 0` (:869-870) is subsumed by
# the following `return remaining` — both return 0 exactly when
# remaining == 0, so pi_changed never affects behavior. Our realization
# (random permutation + process-all-rows scheduling) is therefore exact,
# not an approximation.

# numeric codes carried in device state for the `cycle` policy
ORDER_CODES = {
    ConstraintOrder.none: 0,
    ConstraintOrder.reversing: 1,
    ConstraintOrder.random_sorting: 2,
    ConstraintOrder.infeasibility_decr: 3,
    ConstraintOrder.infeasibility_incr: 4,
    ConstraintOrder.lagrangian_decr: 5,
    ConstraintOrder.lagrangian_incr: 6,
    ConstraintOrder.pi_sign_change: 7,
}
N_CYCLE_STATES = 8


def make_order(
    cp: CompiledProblem,
    order_code: jax.Array,
    x: jax.Array,
    pi: jax.Array,
    key: jax.Array,
    m_pad: int,
    static_policy: "Optional[ConstraintOrder]" = None,
) -> jax.Array:
    """Row-processing permutation for one sweep, padded to ``m_pad`` with
    the sentinel ``m``. Violated rows keep the same relative order the
    reference's policies produce; non-violated rows are no-ops wherever
    they land (the sweep masks them).

    The schedule is shared across the replica lane axis; for the
    state-dependent policies (infeasibility/lagrangian sorts) the sort key
    aggregates over replicas — a deviation from the reference, where each
    thread orders by its own state.

    ``static_policy``: when the policy is known at trace time and is not
    ``cycle``, only that policy's inputs are computed — the dynamic
    ``lax.switch`` would otherwise force the activities matmul and the
    argsorts into every step (measured: the matmul alone costs as much as
    a violated-row mask, ~25%% of a sweep)."""
    m = cp.m
    iota = jnp.arange(m, dtype=jnp.int32)

    def by_key(k, descending=False):
        k = jnp.where(descending, -k, k)
        return jnp.argsort(k, stable=True).astype(jnp.int32)

    def excess_key():
        act = activities(cp, x)  # [m] or [m, R]
        bmin = cp.bmin.astype(act.dtype)
        bmax = cp.bmax.astype(act.dtype)
        if act.ndim == 2:
            bmin, bmax = bmin[:, None], bmax[:, None]
        excess = jnp.maximum(bmin - act, act - bmax)
        if excess.ndim == 2:
            excess = jnp.mean(excess, axis=1)
        return excess

    def pi_key():
        return jnp.mean(pi, axis=1) if pi.ndim == 2 else pi

    if static_policy is not None and static_policy != ConstraintOrder.cycle:
        # Invariant (trace-time): the runtime order_code only ever diverges
        # from the static policy under `cycle` (the only code path that
        # advances it, solver/optimize.py). A caller mixing a non-cycle
        # static_policy with a foreign order_code — e.g. state restored
        # from a cycle run — would silently get the static schedule while
        # downstream `process_all` logic keys off order_code, so refuse.
        if order_code is not None and not isinstance(
            order_code, jax.core.Tracer
        ):
            expect = ORDER_CODES.get(static_policy, 0)
            assert int(order_code) == expect, (
                f"order_code {int(order_code)} inconsistent with static "
                f"policy {static_policy} (expected {expect}); was this "
                "state produced under ConstraintOrder.cycle?"
            )
        branch = {
            ConstraintOrder.none: lambda: iota,
            ConstraintOrder.reversing: lambda: iota[::-1],
            ConstraintOrder.random_sorting: lambda: jax.random.permutation(
                key, m
            ).astype(jnp.int32),
            ConstraintOrder.infeasibility_decr: lambda: by_key(
                excess_key(), descending=True
            ),
            ConstraintOrder.infeasibility_incr: lambda: by_key(excess_key()),
            ConstraintOrder.lagrangian_decr: lambda: by_key(
                pi_key(), descending=True
            ),
            ConstraintOrder.lagrangian_incr: lambda: by_key(pi_key()),
            ConstraintOrder.pi_sign_change: lambda: jax.random.permutation(
                key, m
            ).astype(jnp.int32),
        }[static_policy]
        order = branch()
    else:
        excess = excess_key()
        pim = pi_key()
        shuffled = jax.random.permutation(key, m).astype(jnp.int32)
        branches = [
            lambda: iota,  # none
            lambda: iota[::-1],  # reversing
            lambda: shuffled,  # random_sorting
            lambda: by_key(excess, descending=True),  # infeasibility_decr
            lambda: by_key(excess),  # infeasibility_incr
            lambda: by_key(pim, descending=True),  # lagrangian_decr
            lambda: by_key(pim),  # lagrangian_incr
            lambda: shuffled,  # pi_sign_change (processes all rows)
        ]
        order = jax.lax.switch(order_code, branches)
    pad = jnp.full((m_pad - m,), m, jnp.int32)
    return jnp.concatenate([order, pad])

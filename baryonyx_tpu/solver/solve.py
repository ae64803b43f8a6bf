"""Solve mode: a single kappa-annealed run to feasibility + push phase.

reference: lib/src/itm-solver-common.hpp:43-262 (solver_functor) and
:264-319 (solve_problem wrapper).

TPU design: the inner loop is a ``lax.while_loop`` over sweeps, executed in
host-dispatched chunks so the host can enforce the wall-clock limit and run
observers/callbacks between chunks (replacing the reference's in-loop
``is_time_limit`` checks). The push phase (reference: :171-213) amplifies
reduced costs by the objective for one sweep per push round, then runs
normal sweeps.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from baryonyx_tpu.core.context import Context
from baryonyx_tpu.core.model import ObjectiveType, Problem
from baryonyx_tpu.core.params import ConstraintOrder, FloatType, SolverParameters
from baryonyx_tpu.core.errors import InfeasibleConstraintError
from baryonyx_tpu.core.result import Result, ResultStatus, Solution
from baryonyx_tpu.ops.layout import CompiledProblem, compile_problem
from baryonyx_tpu.ops.sweep import sweep, violated_mask
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common


class DeviceState(NamedTuple):
    """Device-carried solver state. Solve mode runs a single replica, so
    the lane axis R is 1 (the sweep kernel is lane-major — see
    ops/sweep.py)."""

    x: jax.Array  # int32[n, 1]
    P: jax.Array  # f[m, Kr, 1]
    pi: jax.Array  # f[m, 1]
    S: jax.Array  # f[n, 1] — carried merged column sums (see ops/sweep.py)
    viol: jax.Array  # bool[m, 1]
    kappa: jax.Array  # f[1]
    loop: jax.Array  # int32: global iteration counter
    remaining: jax.Array  # int32[1]
    best_x: jax.Array  # int32[n, 1]
    best_remaining: jax.Array  # int32[1]
    best_value: jax.Array  # f[1] (true objective, solver dtype)
    best_loop: jax.Array  # int32[1]
    order_code: jax.Array  # int32 (current policy, advanced by `cycle`)
    key: jax.Array
    stop_reason: jax.Array  # int32: 0 running, 1 feasible, 2 kappa_max, 3 limit


STOP_RUNNING, STOP_FEASIBLE, STOP_KAPPA, STOP_LIMIT = 0, 1, 2, 3


def _m_pad(m: int, block: int) -> int:
    return ((m + block - 1) // block) * block


def make_initial_state(
    cp: CompiledProblem,
    x0: np.ndarray,
    params: SolverParameters,
    key: jax.Array,
    dtype,
    order_code: int,
    minimize: bool,
) -> DeviceState:
    n, m = cp.n, cp.m
    x = jnp.asarray(x0, jnp.int32).reshape(n, 1)
    viol = violated_mask(cp, x)  # [m, 1]
    return DeviceState(
        x=x,
        P=jnp.zeros((m, cp.Kr, 1), dtype),
        pi=jnp.zeros((m, 1), dtype),
        S=jnp.zeros((n, 1), dtype),
        viol=viol,
        kappa=jnp.full((1,), params.kappa_min, dtype),
        loop=jnp.asarray(0, jnp.int32),
        remaining=jnp.sum(viol.astype(jnp.int32), axis=0),
        best_x=x,
        best_remaining=jnp.full((1,), 2**31 - 1, jnp.int32),
        best_value=jnp.full((1,), jnp.inf if minimize else -jnp.inf, dtype),
        best_loop=jnp.zeros((1,), jnp.int32),
        order_code=jnp.asarray(order_code, jnp.int32),
        key=key,
        stop_reason=jnp.asarray(STOP_RUNNING, jnp.int32),
    )


def _step(
    cp: CompiledProblem,
    cost_norm: jax.Array,
    cost_orig: jax.Array,
    cost_constant: jax.Array,
    st: DeviceState,
    hp,  # dict of device hyperparameters
    minimize: bool,
    block_size: int,
    push_amp,
    anneal_counter=None,
    random_solver: bool = False,
    order_policy=None,
) -> DeviceState:
    """One outer iteration: schedule, sweep, best-tracking, kappa anneal
    (reference: itm-solver-common.hpp:135-166)."""
    dtype = st.P.dtype
    m = cp.m
    key, k_order, k_sweep = jax.random.split(st.key, 3)
    mp = _m_pad(m, block_size)
    order = common.make_order(
        cp, st.order_code, st.x, st.pi, k_order, mp,
        static_policy=order_policy,
    )
    process_all = st.order_code == common.ORDER_CODES[ConstraintOrder.pi_sign_change]
    if push_amp is not None:
        # The push sweep re-runs rows with objective-amplified reduced
        # costs. The reference only walks the previously-violated list,
        # which is empty right after feasibility — making its solve-mode
        # push a no-op under the default ordering (the list is refilled by
        # compute_violated_constraints, itm-common.hpp:102-115, before the
        # push starts). We process every row instead, which is what the
        # reference's pi_sign_change policy does and what makes the push
        # actually improve the incumbent.
        process_all = True
    eff_viol = st.viol | process_all  # [m, 1]

    # compact scheduled rows (union over lanes) to the front, preserving
    # policy order, so the block loop runs ceil(remaining / B) steps
    sched_any = jnp.any(eff_viol, axis=1)  # [m]
    padded = jnp.concatenate([sched_any, jnp.zeros((1,), bool)])[
        jnp.minimum(order, m)
    ]
    compact = jnp.argsort(~padded, stable=True)
    order = order[compact]
    n_rows = jnp.sum(padded.astype(jnp.int32))

    amp = (
        jnp.zeros((1,), dtype)
        if push_amp is None
        else jnp.full((1,), 1.0, dtype) * push_amp
    )
    kappa_eff = st.kappa if push_amp is None else st.kappa * hp["pushing_k_factor"]

    if cp.has_z:
        if random_solver:
            # the reference's dispatch has no random solver for Z problems
            # (itm.hpp:181-200 raises internal_error)
            raise NotImplementedError("random solver for Z problems")
        from baryonyx_tpu.ops.zsweep import z_sweep as kernel

        kw = dict(quad_fac=hp.get("quad_fac"))
    else:
        kernel = sweep
        # carried column sums: recompute exactly every 16 sweeps to bound
        # float drift from the incremental updates
        kw = dict(
            random_solver=random_solver,
            quad_fac=hp.get("quad_fac"),
            S=st.S,
            S_fresh=(st.loop % 16) != 0,
        )
    out = kernel(
        cp,
        st.x,
        P=st.P,
        pi=st.pi,
        cost=cost_norm,
        sched=eff_viol,
        order=order,
        kappa=kappa_eff,
        delta=hp["delta"],
        theta=hp["theta"],
        key=k_sweep,
        obj_amp=amp,
        n_rows=n_rows,
        minimize=minimize,
        block_size=block_size,
        **kw,
    )
    if cp.has_z:
        x, P, pi, viol, remaining = out
        S = st.S
    else:
        x, P, pi, S, viol, remaining = out

    # best tracking (reference: store_if_better, :242-261)
    value = jnp.einsum("n,nr->r", cost_orig, x.astype(dtype)) + cost_constant
    if "qa" in hp:
        xa = x[hp["qa"]].astype(dtype)
        xb = x[hp["qb"]].astype(dtype)
        value = value + jnp.einsum("q,qr->r", hp["qfv"], xa * xb)
    feasible = remaining == 0
    better_value = (value < st.best_value) if minimize else (value > st.best_value)
    improves = jnp.where(
        feasible & (st.best_remaining == 0),
        better_value,
        jnp.where(
            feasible,
            True,  # first feasible always wins over infeasible best
            remaining < st.best_remaining,
        ),
    )
    best_x = jnp.where(improves, x, st.best_x)
    best_remaining = jnp.where(
        improves, jnp.where(feasible, 0, remaining), st.best_remaining
    ).astype(jnp.int32)
    best_value = jnp.where(improves & feasible, value, st.best_value)
    best_loop = jnp.where(improves, st.loop, st.best_loop).astype(jnp.int32)

    # kappa annealing after warmup w (reference: :152-155); the push phase
    # anneals on its own inner counter (reference: :196-200) and the push
    # sweep itself never anneals
    if anneal_counter is None:
        kappa = st.kappa
    else:
        kappa = jnp.where(
            (anneal_counter > hp["w"]) & ~feasible,
            st.kappa
            + hp["kappa_step"]
            * jnp.power(
                remaining.astype(dtype) / jnp.asarray(cp.m_real, dtype),
                hp["alpha"],
            ),
            st.kappa,
        )

    # cycle policy advances only on push sweeps
    # (reference: itm-common.hpp:694-695)
    order_code = st.order_code
    if push_amp is not None:
        order_code = jnp.where(
            hp["use_cycle"],
            (st.order_code + 1) % common.N_CYCLE_STATES,
            st.order_code,
        )

    return DeviceState(
        x=x,
        P=P,
        pi=pi,
        S=S,
        viol=viol,
        kappa=kappa,
        loop=st.loop + 1,
        remaining=remaining,
        best_x=best_x,
        best_remaining=best_remaining,
        best_value=best_value,
        best_loop=best_loop,
        order_code=order_code,
        key=key,
        stop_reason=st.stop_reason,
    )


def make_hyper(
    params: SolverParameters, cost_norm: np.ndarray, dtype
) -> dict:
    """Device hyperparameter bundle (traced pytree, so different values hit
    the same compiled executable)."""
    delta = (
        common.compute_delta(cost_norm, params.theta)
        if params.delta < 0
        else params.delta
    )
    return dict(
        delta=jnp.asarray(delta, dtype),
        theta=jnp.asarray(params.theta, dtype),
        kappa_step=jnp.asarray(params.kappa_step, dtype),
        kappa_max=jnp.asarray(params.kappa_max, dtype),
        alpha=jnp.asarray(params.alpha, dtype),
        w=jnp.asarray(int(params.w), jnp.int32),
        pushing_k_factor=jnp.asarray(params.pushing_k_factor, dtype),
        pushing_objective_amplifier=jnp.asarray(
            params.pushing_objective_amplifier, dtype
        ),
        limit=jnp.asarray(min(params.limit, 2**31 - 1), jnp.int32),
        use_cycle=jnp.asarray(params.order == ConstraintOrder.cycle, bool),
    )


@functools.partial(
    jax.jit,
    static_argnames=("minimize", "block_size", "random_solver", "order_policy"),
)
def run_chunk(
    cp: CompiledProblem,
    cost_norm: jax.Array,
    cost_orig: jax.Array,
    cost_constant: jax.Array,
    hp: dict,
    st: DeviceState,
    n_iters: jax.Array,
    minimize: bool,
    block_size: int,
    random_solver: bool = False,
    order_policy=None,
) -> DeviceState:
    """Up to n_iters annealed sweeps, stopping early on feasibility /
    kappa_max / global limit (reference: itm-solver-common.hpp:135-166).
    Module-level and jitted on (problem shape, minimize, block_size) only,
    so repeated solves and restarts reuse the compiled executable."""
    start_loop = st.loop

    def cond(st):
        return (st.stop_reason == STOP_RUNNING) & (st.loop - start_loop < n_iters)

    def body(st):
        st = _step(
            cp, cost_norm, cost_orig, cost_constant, st, hp,
            minimize, block_size, None, anneal_counter=st.loop,
            random_solver=random_solver, order_policy=order_policy,
        )
        reason = jnp.where(
            st.remaining[0] == 0,
            STOP_FEASIBLE,
            jnp.where(
                st.kappa[0] > hp["kappa_max"],
                STOP_KAPPA,
                jnp.where(st.loop >= hp["limit"], STOP_LIMIT, STOP_RUNNING),
            ),
        )
        return st._replace(stop_reason=reason.astype(jnp.int32))

    return jax.lax.while_loop(cond, body, st)


@functools.partial(
    jax.jit,
    static_argnames=(
        "minimize", "block_size", "push_iters", "random_solver", "order_policy"
    ),
)
def run_push_round(
    cp: CompiledProblem,
    cost_norm: jax.Array,
    cost_orig: jax.Array,
    cost_constant: jax.Array,
    hp: dict,
    st: DeviceState,
    minimize: bool,
    block_size: int,
    push_iters: int,
    random_solver: bool = False,
    order_policy=None,
) -> DeviceState:
    """One objective-amplified sweep + up to ``push_iters`` normal sweeps
    (reference: itm-solver-common.hpp:171-213)."""
    st = _step(
        cp, cost_norm, cost_orig, cost_constant, st, hp,
        minimize, block_size, hp["pushing_objective_amplifier"],
        random_solver=random_solver, order_policy=order_policy,
    )
    st = st._replace(stop_reason=jnp.asarray(STOP_RUNNING, jnp.int32))

    def cond(c):
        st, it = c
        return (it < push_iters) & (st.stop_reason == STOP_RUNNING)

    def body(c):
        st, it = c
        st = _step(
            cp, cost_norm, cost_orig, cost_constant, st, hp,
            minimize, block_size, None, anneal_counter=it,
            random_solver=random_solver, order_policy=order_policy,
        )
        stop = jnp.where(
            st.remaining[0] == 0,
            STOP_FEASIBLE,
            jnp.where(st.kappa[0] > hp["kappa_max"], STOP_KAPPA, STOP_RUNNING),
        )
        return st._replace(stop_reason=stop.astype(jnp.int32)), it + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.asarray(0, jnp.int32)))
    return st


def solve_compiled(
    ctx: Context,
    pb: Problem,
    key: Optional[jax.Array] = None,
) -> Result:
    """End-to-end solve on a preprocessed Problem
    (reference: solve_problem, itm-solver-common.hpp:264-319)."""
    t0 = time.monotonic()
    params = ctx.parameters
    minimize = pb.type == ObjectiveType.minimize
    dtype = jnp.float64 if params.float_type == FloatType.float64 else jnp.float32

    ret = Result(method="solve")
    n = len(pb.vars.values)
    constraints = make_merged_constraints(ctx, pb)

    if not constraints or n == 0:
        ret.status = ResultStatus.success
        ret.solutions.append(Solution([], pb.objective.value))
        _finalize(ret, pb, len(constraints), t0)
        return ret

    from baryonyx_tpu.core.params import ObserverType as _Obs
    from baryonyx_tpu.core.params import SolverType as _Sol
    from baryonyx_tpu.solver.exact import exact_enumerate

    # observer/debug runs want the real loop's trace; the --random
    # baseline must stay random
    exact = None
    if (
        params.observer == _Obs.none
        and not params.debug
        and params.solver != _Sol.random
    ):
        exact = exact_enumerate(pb, constraints, n)
    if exact is not None:
        bits, value = exact
        ctx.info(
            "  - exact enumeration ({} variables): optimum {}\n", n, value
        )
        ret.method += "+exact-enum"
        ret.status = ResultStatus.success
        ret.solutions.append(Solution([int(b) for b in bits], value))
        _finalize(ret, pb, len(constraints), t0)
        return ret

    seed = params.seed if params.seed else int(time.time())
    rng = np.random.default_rng(seed)
    if key is None:
        key = jax.random.key(seed)

    try:
        cp = compile_problem(
            constraints, n, dtype=dtype, qelements=pb.objective.qelements
        )
    except InfeasibleConstraintError as e:
        # a provably-unsatisfiable row: report what the solver loop would
        # have reported after exhausting its budget (row stays violated)
        ctx.warning("  - infeasible at compile time: {}\n", e)
        ret.status = ResultStatus.limit_reached
        ret.remaining_constraints = 1
        _finalize(ret, pb, len(constraints), t0)
        return ret
    cost_orig_real = common.build_cost_vector(pb, n)
    quad_fac_norm = None
    if cp.has_quad:
        cost_norm_real, q_norm = common.normalize_costs_quad(
            cost_orig_real,
            np.asarray(cp.quad_fac, np.float64),
            params.cost_norm,
            rng,
        )
        quad_fac_norm = jnp.asarray(q_norm, dtype)
    else:
        cost_norm_real = common.normalize_costs(
            cost_orig_real, params.cost_norm, rng
        )
    pad = cp.n - n
    cost_orig = np.pad(cost_orig_real, (0, pad))
    cost_norm = np.pad(cost_norm_real, (0, pad))

    x0 = np.pad(
        common.initial_x(params, cost_orig_real, constraints, minimize, rng),
        (0, pad),
    )

    order_code = common.ORDER_CODES.get(params.order, 0)
    if params.order == ConstraintOrder.cycle:
        order_code = 0
    st = make_initial_state(cp, x0, params, key, dtype, order_code, minimize)

    cn = jnp.asarray(cost_norm, dtype)
    co = jnp.asarray(cost_orig, dtype)
    cc = jnp.asarray(pb.objective.value, dtype)
    hp = make_hyper(params, cost_norm, dtype)
    if cp.has_quad:
        hp["quad_fac"] = quad_fac_norm
        hp["qa"] = jnp.asarray(
            [q.variable_index_a for q in pb.objective.qelements], jnp.int32
        )
        hp["qb"] = jnp.asarray(
            [q.variable_index_b for q in pb.objective.qelements], jnp.int32
        )
        hp["qfv"] = jnp.asarray(
            [q.factor for q in pb.objective.qelements], dtype
        )

    # The time-limit budget runs on its own clock so that excluding jit
    # compilation does not distort ret.duration, which keeps the reference
    # semantics of spanning the whole solve from entry. A zero-length
    # warmup chunk pays compilation up front (warm caches pay ~nothing),
    # so the budget excludes exactly compile time and no solving work.
    budget_t0 = t0

    def time_left() -> bool:
        return (
            params.time_limit <= 0
            or (time.monotonic() - budget_t0) < params.time_limit
        )

    from baryonyx_tpu.core.params import ObserverType, SolverType
    from baryonyx_tpu.observer import make_observer

    use_random = params.solver == SolverType.random

    observer = make_observer(params.observer)

    # warm the jit cache with a zero-length chunk (a value fetch is the
    # only reliable synchronization through the axon tunnel)
    int(
        run_chunk(
            cp, cn, co, cc, hp, st, jnp.asarray(0, jnp.int32),
            minimize=minimize, block_size=params.block_size,
            random_solver=use_random, order_policy=params.order,
        ).loop
    )
    budget_t0 = time.monotonic()

    # per-row debug trace (reference: debug_logger, itm-common.hpp:
    # 1496-1550, --debug → per-thread `name-<hash>.log` with every row
    # update). Kernel internals (reduced costs, selection) live in device
    # registers; the TPU-native trace granularity is per sweep: rows whose
    # multiplier moved (= rows the sweep updated) with their pi delta and
    # post-sweep violation flag, chunked to one sweep per dispatch.
    debug_fh = None
    chunk_len = params.chunk_size
    if params.debug:
        import os as _os

        debug_path = f"baryonyx-debug-{_os.getpid()}.log"
        debug_fh = open(debug_path, "w")
        ctx.notice("- debug row trace: {}\n", debug_path)
        chunk_len = 1
        _prev_pi = np.asarray(st.pi[:, 0]).copy()

    # main annealed loop, in host-dispatched chunks
    timed_out = False
    while True:
        st = run_chunk(
            cp, cn, co, cc, hp, st,
            jnp.asarray(chunk_len, jnp.int32),
            minimize=minimize, block_size=params.block_size,
            random_solver=use_random, order_policy=params.order,
        )
        if debug_fh is not None:
            pi0 = np.asarray(st.pi[:, 0])
            viol0 = np.asarray(st.viol[:, 0])
            dpi = pi0 - _prev_pi
            loop_i = int(st.loop)
            for k in np.nonzero((dpi != 0) | viol0)[0]:
                debug_fh.write(
                    f"sweep={loop_i} k={int(k)} pi={pi0[k]:.9g} "
                    f"dpi={dpi[k]:.9g} violated={int(viol0[k])}\n"
                )
            _prev_pi = pi0.copy()
        if params.observer != ObserverType.none:
            observer.make_observation(
                np.asarray(st.P[..., 0]), np.asarray(st.pi[:, 0]), int(st.loop)
            )
        if params.print_level > 0:
            lb = common.dual_bound(cp, np.asarray(st.pi[:, 0]), cost_norm, minimize)
            ctx.info(
                "  - loop {}: remaining {} kappa {:.4f} dual-bound {:.6g}\n",
                int(st.loop),
                int(st.remaining[0]),
                float(st.kappa[0]),
                lb,
            )
        reason = int(st.stop_reason)
        if reason != STOP_RUNNING:
            break
        if not time_left():
            timed_out = True
            break

    if reason == STOP_FEASIBLE and not timed_out:
        # push phase (reference: :171-213)
        for _ in range(params.pushes_limit):
            st = run_push_round(
                cp, cn, co, cc, hp, st,
                minimize=minimize, block_size=params.block_size,
                push_iters=params.pushing_iteration_limit,
                random_solver=use_random, order_policy=params.order,
            )
            if not time_left():
                timed_out = True
                break
        reason = STOP_FEASIBLE

    if debug_fh is not None:
        debug_fh.close()

    # status (reference: :125-169, :215-216)
    best_remaining = int(st.best_remaining[0])
    if best_remaining == 0:
        ret.status = ResultStatus.success
    elif timed_out:
        ret.status = ResultStatus.time_limit_reached
    elif reason == STOP_KAPPA:
        ret.status = ResultStatus.kappa_max_reached
    else:
        ret.status = ResultStatus.limit_reached

    best_x = np.asarray(st.best_x).ravel()[:n]
    ret.loop = int(st.best_loop[0])
    ret.remaining_constraints = best_remaining
    if best_remaining == 0:
        value = common.objective_value(pb, best_x)
        ret.solutions.append(Solution([int(v) for v in best_x], value))
    elif best_remaining != 2**31 - 1:
        ret.solutions.append(
            Solution([int(v) for v in best_x], float("inf") if minimize else float("-inf"))
        )

    _finalize(ret, pb, len(constraints), t0)
    if ctx.finish_cb:
        ctx.finish_cb(ret)
    return ret


def _finalize(ret: Result, pb: Problem, n_constraints: int, t0: float) -> None:
    # Result.method records the route that produced the solution so
    # artifacts are self-describing (exact enumeration and product-fold
    # short-circuit the dual-descent kernel; the reference's result always
    # reflects its solver loop, core:716)
    if len(pb.derived_vars) and "product-fold" not in ret.method:
        ret.method += "+product-fold"
    ret.variable_name = list(pb.vars.names)
    ret.affected_vars = pb.affected_vars
    ret.derived_vars = pb.derived_vars
    ret.variables = len(pb.vars.values)
    ret.constraints = n_constraints
    ret.duration = time.monotonic() - t0

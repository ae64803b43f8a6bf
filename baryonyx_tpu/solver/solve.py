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

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from baryonyx_tpu.core.context import Context
from baryonyx_tpu.core.model import ObjectiveType, Problem
from baryonyx_tpu.core.params import ConstraintOrder, FloatType, SolverParameters
from baryonyx_tpu.core.result import Result, ResultStatus, Solution
from baryonyx_tpu.ops.layout import CompiledProblem, compile_problem
from baryonyx_tpu.ops.sweep import sweep, violated_mask
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common


class DeviceState(NamedTuple):
    """Device-carried solver state for one replica."""

    x: jax.Array  # int32[n]
    P: jax.Array  # f[m, Kr]
    pi: jax.Array  # f[m]
    viol: jax.Array  # bool[m]
    kappa: jax.Array  # f scalar
    loop: jax.Array  # int32: global iteration counter
    remaining: jax.Array  # int32
    best_x: jax.Array  # int32[n]
    best_remaining: jax.Array  # int32
    best_value: jax.Array  # f scalar (true objective, solver dtype)
    best_loop: jax.Array  # int32
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
    x = jnp.asarray(x0, jnp.int32)
    viol = violated_mask(cp, x)
    return DeviceState(
        x=x,
        P=jnp.zeros((m, cp.Kr), dtype),
        pi=jnp.zeros((m,), dtype),
        viol=viol,
        kappa=jnp.asarray(params.kappa_min, dtype),
        loop=jnp.asarray(0, jnp.int32),
        remaining=jnp.sum(viol.astype(jnp.int32)),
        best_x=x,
        best_remaining=jnp.asarray(2**31 - 1, jnp.int32),
        best_value=jnp.asarray(jnp.inf if minimize else -jnp.inf, dtype),
        best_loop=jnp.asarray(0, jnp.int32),
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
) -> DeviceState:
    """One outer iteration: schedule, sweep, best-tracking, kappa anneal
    (reference: itm-solver-common.hpp:135-166)."""
    dtype = st.P.dtype
    m = cp.m
    key, k_order, k_sweep = jax.random.split(st.key, 3)
    mp = _m_pad(m, block_size)
    order = common.make_order(cp, st.order_code, st.x, st.pi, k_order, mp)
    process_all = st.order_code == common.ORDER_CODES[ConstraintOrder.pi_sign_change]

    amp = jnp.asarray(0, dtype) if push_amp is None else push_amp
    kappa_eff = st.kappa if push_amp is None else st.kappa * hp["pushing_k_factor"]

    x, P, pi, viol, remaining = sweep(
        cp,
        st.x,
        P=st.P,
        pi=st.pi,
        cost=cost_norm,
        viol=st.viol | process_all,
        order=order,
        kappa=kappa_eff,
        delta=hp["delta"],
        theta=hp["theta"],
        key=k_sweep,
        obj_amp=amp,
        minimize=minimize,
        block_size=block_size,
    )

    # best tracking (reference: store_if_better, :242-261)
    value = (
        jnp.dot(cost_orig, x.astype(dtype)) + cost_constant
    )
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
    )
    best_value = jnp.where(improves & feasible, value, st.best_value)
    best_loop = jnp.where(improves, st.loop, st.best_loop)

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
                remaining.astype(dtype) / jnp.asarray(m, dtype), hp["alpha"]
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


def make_runner(
    cp: CompiledProblem,
    cost_norm: np.ndarray,
    cost_orig: np.ndarray,
    cost_constant: float,
    params: SolverParameters,
    minimize: bool,
    dtype,
):
    """Build the jitted chunk runners. Returns (run_chunk, run_push_round).

    ``run_chunk(state, n_iters)``: up to n_iters annealed sweeps, stopping
    early on feasibility / kappa_max / global limit.
    ``run_push_round(state)``: one objective-amplified sweep + up to
    ``pushing_iteration_limit`` normal sweeps
    (reference: itm-solver-common.hpp:171-213).
    """
    cn = jnp.asarray(cost_norm, dtype)
    co = jnp.asarray(cost_orig, dtype)
    cc = jnp.asarray(cost_constant, dtype)
    m = cp.m

    hp = dict(
        delta=None,  # filled below
        theta=jnp.asarray(params.theta, dtype),
        kappa_step=jnp.asarray(params.kappa_step, dtype),
        kappa_max=jnp.asarray(params.kappa_max, dtype),
        alpha=jnp.asarray(params.alpha, dtype),
        w=jnp.asarray(int(params.w), jnp.int32),
        pushing_k_factor=jnp.asarray(params.pushing_k_factor, dtype),
        pushing_objective_amplifier=jnp.asarray(
            params.pushing_objective_amplifier, dtype
        ),
        use_cycle=jnp.asarray(params.order == ConstraintOrder.cycle, bool),
    )
    delta = (
        common.compute_delta(cost_norm, params.theta)
        if params.delta < 0
        else params.delta
    )
    hp["delta"] = jnp.asarray(delta, dtype)

    limit = params.limit
    block_size = params.block_size

    def step_fn(st, push_amp=None, anneal_counter=None):
        return _step(
            cp, cn, co, cc, st, hp, minimize, block_size, push_amp, anneal_counter
        )

    @jax.jit
    def run_chunk(st: DeviceState, n_iters: jax.Array) -> DeviceState:
        start_loop = st.loop

        def cond(st):
            return (
                (st.stop_reason == STOP_RUNNING)
                & (st.loop - start_loop < n_iters)
            )

        def body(st):
            st = step_fn(st, anneal_counter=st.loop)
            reason = jnp.where(
                st.remaining == 0,
                STOP_FEASIBLE,
                jnp.where(
                    st.kappa > hp["kappa_max"],
                    STOP_KAPPA,
                    jnp.where(st.loop >= limit, STOP_LIMIT, STOP_RUNNING),
                ),
            )
            return st._replace(stop_reason=reason.astype(jnp.int32))

        return jax.lax.while_loop(cond, body, st)

    @jax.jit
    def run_push_round(st: DeviceState) -> DeviceState:
        # one amplified sweep
        st = step_fn(st, push_amp=hp["pushing_objective_amplifier"])

        # inner normal sweeps; stop on feasible / kappa_max
        def cond(c):
            st, it = c
            return (it < params.pushing_iteration_limit) & (st.stop_reason == 0)

        def body(c):
            st, it = c
            st = step_fn(st, anneal_counter=it)
            stop = jnp.where(
                st.remaining == 0,
                STOP_FEASIBLE,
                jnp.where(st.kappa > hp["kappa_max"], STOP_KAPPA, STOP_RUNNING),
            )
            return st._replace(stop_reason=stop.astype(jnp.int32)), it + 1

        st = st._replace(stop_reason=jnp.asarray(STOP_RUNNING, jnp.int32))
        st, _ = jax.lax.while_loop(cond, body, (st, jnp.asarray(0, jnp.int32)))
        return st

    return run_chunk, run_push_round


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

    seed = params.seed if params.seed else int(time.time())
    rng = np.random.default_rng(seed)
    if key is None:
        key = jax.random.key(seed)

    cp = compile_problem(constraints, n, dtype=dtype)
    cost_orig = common.build_cost_vector(pb, n)
    cost_norm = common.normalize_costs(cost_orig, params.cost_norm, rng)

    x0 = common.initial_x(params, cost_orig, constraints, minimize, rng)

    order_code = common.ORDER_CODES.get(params.order, 0)
    if params.order == ConstraintOrder.cycle:
        order_code = 0
    st = make_initial_state(cp, x0, params, key, dtype, order_code, minimize)

    run_chunk, run_push_round = make_runner(
        cp, cost_norm, cost_orig, pb.objective.value, params, minimize, dtype
    )

    def time_left() -> bool:
        return (
            params.time_limit <= 0
            or (time.monotonic() - t0) < params.time_limit
        )

    # main annealed loop, in host-dispatched chunks
    timed_out = False
    while True:
        st = run_chunk(st, jnp.asarray(params.chunk_size, jnp.int32))
        reason = int(st.stop_reason)
        if reason != STOP_RUNNING:
            break
        if not time_left():
            timed_out = True
            break

    if reason == STOP_FEASIBLE and not timed_out:
        # push phase (reference: :171-213)
        for _ in range(params.pushes_limit):
            st = run_push_round(st)
            if not time_left():
                timed_out = True
                break
        reason = STOP_FEASIBLE

    # status (reference: :125-169, :215-216)
    best_remaining = int(st.best_remaining)
    if best_remaining == 0:
        ret.status = ResultStatus.success
    elif timed_out:
        ret.status = ResultStatus.time_limit_reached
    elif reason == STOP_KAPPA:
        ret.status = ResultStatus.kappa_max_reached
    else:
        ret.status = ResultStatus.limit_reached

    best_x = np.asarray(st.best_x)
    ret.loop = int(st.best_loop)
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
    ret.variable_name = list(pb.vars.names)
    ret.affected_vars = pb.affected_vars
    ret.variables = len(pb.vars.values)
    ret.constraints = n_constraints
    ret.duration = time.monotonic() - t0

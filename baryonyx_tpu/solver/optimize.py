"""Optimize mode: evolutionary multi-start as batched solver replicas.

The reference spawns N threads, each looping restart → annealed run → push
phase, sharing one solution population under a mutex
(reference: itm-optimizer-common.hpp:620-751 optimize_functor,
:776-908 optimize_problem). Here each "thread" is a replica in a vmapped
batch: one jitted evolution step advances every replica by one sweep and
runs its per-replica restart state machine; population insertion,
crossover and mutation are batched array ops inside the same step
(SURVEY.md section 2.6 "TPU-native equivalent").

Replica phases: ANNEAL (kappa-annealed feasibility run), PUSH (one
objective-amplified sweep), PUSH_ITER (recovery sweeps after a push).
A finished replica reports its result to the population and is re-seeded
in the same step via the kappa-improve ladder or population crossover +
mutation (reference: best_solution_recorder::reinit, :528-554). P and pi
persist across restarts, as in the reference where the Solver object
outlives the restart loop.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from baryonyx_tpu.core.context import Context
from baryonyx_tpu.core.model import ObjectiveType, Problem
from baryonyx_tpu.core.params import ConstraintOrder, FloatType, SolverParameters, StorageType
from baryonyx_tpu.core.result import Result, ResultStatus, Solution
from baryonyx_tpu.ops.layout import CompiledProblem, compile_problem
from baryonyx_tpu.ops.sweep import sweep, violated_mask
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common
from baryonyx_tpu.solver.population import (
    Population,
    batch_insert,
    choose_solution_index,
    crossover_mix,
    hash_x,
    init_population_host,
    make_hash_weights,
    sort_population,
)
from baryonyx_tpu.solver.solve import _finalize

PHASE_ANNEAL, PHASE_PUSH, PHASE_PUSH_ITER = 0, 1, 2
INT_MAX = 2**31 - 1


class ReplicaState(NamedTuple):
    x: jax.Array  # int32[R, n]
    P: jax.Array  # f[R, m, Kr]
    pi: jax.Array  # f[R, m]
    viol: jax.Array  # bool[R, m]
    kappa: jax.Array  # f[R]
    kappa_start: jax.Array  # f[R]
    kappa_append: jax.Array  # f[R] — the per-thread ladder position
    iter_i: jax.Array  # int32[R] — counter within the current phase
    phase: jax.Array  # int32[R]
    push_idx: jax.Array  # int32[R]
    best_remaining: jax.Array  # int32[R] — per-restart min
    restarts: jax.Array  # int32[R] — reference: m_call_number
    order_code: jax.Array  # int32[R]
    key: jax.Array  # [R] keys


class OptState(NamedTuple):
    replicas: ReplicaState
    pop: Population
    key: jax.Array
    sweeps: jax.Array  # int32 — total evolution steps executed


@functools.partial(
    jax.jit,
    static_argnames=("minimize", "block_size", "n_steps"),
)
def evolve(
    cp: CompiledProblem,
    cost_norm: jax.Array,
    cost_orig: jax.Array,
    cost_constant: jax.Array,
    bastert_x: jax.Array,
    hash_weights: jax.Array,
    hp: dict,
    state: OptState,
    minimize: bool,
    block_size: int,
    n_steps: int,
) -> OptState:
    """Run ``n_steps`` evolution steps: every replica does one sweep + its
    state-machine transition; finished replicas report to the population
    and restart."""

    def one_step(state: OptState, _):
        rs = state.replicas
        R = rs.kappa.shape[0]
        dtype = rs.P.dtype

        is_push = rs.phase == PHASE_PUSH
        kappa_eff = jnp.where(is_push, hp["pushing_k_factor"], rs.kappa)
        amp = jnp.where(
            is_push, hp["pushing_objective_amplifier"], jnp.asarray(0, dtype)
        )

        keys = jax.vmap(jax.random.split)(rs.key)
        step_keys, next_keys = keys[:, 0], keys[:, 1]

        x, P, pi, viol, remaining = jax.vmap(
            lambda xx, PP, ppi, vv, oc, kk, ky, am, pa: _sweep_one(
                cp, cost_norm, hp, xx, PP, ppi, vv, oc, kk, ky, am, pa,
                minimize, block_size,
            )
        )(rs.x, rs.P, rs.pi, rs.viol, rs.order_code, kappa_eff, step_keys,
          amp, is_push)

        value = x.astype(dtype) @ cost_orig + cost_constant
        found = remaining == 0
        it1 = rs.iter_i + 1

        # --- ANNEAL transitions (reference: :668-699) ---
        in_anneal = rs.phase == PHASE_ANNEAL
        best_rem = jnp.where(
            in_anneal, jnp.minimum(rs.best_remaining, remaining), rs.best_remaining
        )
        anneal_kappa = rs.kappa + hp["kappa_step"] * jnp.power(
            remaining.astype(dtype) / jnp.asarray(cp.m, dtype), hp["alpha"]
        )
        do_anneal = (rs.iter_i > hp["w"]) & ~found
        kappa = jnp.where(in_anneal & do_anneal, anneal_kappa, rs.kappa)
        anneal_fail = in_anneal & ~found & (
            (kappa > hp["kappa_max"]) | (it1 >= hp["limit"])
        )
        anneal_found = in_anneal & found

        # --- PUSH transitions (reference: :702-723) ---
        push_done_sweep = is_push  # amplified sweep just ran

        # --- PUSH_ITER transitions (reference: :724-749) ---
        in_pi = rs.phase == PHASE_PUSH_ITER
        pi_kappa = jnp.where(in_pi & do_anneal, anneal_kappa, kappa)
        kappa = jnp.where(in_pi, pi_kappa, kappa)
        pi_end = in_pi & (
            found | (kappa > hp["kappa_max"]) | (it1 >= hp["push_iters"])
        )

        push_idx = jnp.where(pi_end, rs.push_idx + 1, rs.push_idx)
        push_exhausted = pi_end & (push_idx >= hp["pushes_limit"])

        restart = anneal_fail | push_exhausted

        # --- population inserts ---
        # feasible x found in any phase → try_update (value-deduped);
        # failed anneal → try_advance with (x, best_remaining)
        cand_mask = found | anneal_fail
        cand_remaining = jnp.where(found, 0, best_rem).astype(jnp.int32)
        state_key, k_ins, k_reinit = jax.random.split(state.key, 3)
        pop = batch_insert(
            state.pop, x, value, cand_remaining, cand_mask, k_ins,
            hash_weights, minimize,
        )

        # --- reinit for restarting replicas (reference: :528-554) ---
        ladder = rs.kappa_append < hp["kappa_improve_stop"]
        new_append = jnp.where(
            restart,
            jnp.where(
                ladder,
                rs.kappa_append + hp["kappa_improve_increase"],
                hp["kappa_improve_start"],
            ),
            rs.kappa_append,
        )
        ladder_kappa = hp["kappa_min"] + (
            hp["kappa_max"] - hp["kappa_min"]
        ) * new_append

        reinit_keys = jax.vmap(
            lambda i: jax.random.fold_in(k_reinit, i)
        )(jnp.arange(R))

        def reinit_x(xx, do, use_crossover, ky):
            k1, k2, k3, k4, k5, k6 = jax.random.split(ky, 6)
            # crossover source (reference: storage::crossover :369-421)
            Psize = pop.x.shape[0]
            i1 = choose_solution_index(
                k1, Psize, hp["sel_mean"], hp["sel_stddev"]
            )
            i2 = choose_solution_index(
                k2, Psize, hp["sel_mean"], hp["sel_stddev"]
            )
            i2 = jnp.where(i2 == i1, (i1 + 1) % Psize, i2)
            other = jnp.where(
                jax.random.bernoulli(k3, hp["bastert_insertion"]),
                jnp.where(
                    jax.random.bernoulli(k4, 0.5),
                    bastert_x,
                    jax.random.bernoulli(k4, 0.5, xx.shape).astype(xx.dtype),
                ),
                pop.x[i2],
            )
            crossed = crossover_mix(k5, pop.x[i1], other)
            nx = jnp.where(use_crossover, crossed, xx)

            # mutation (reference: :494-526); the reference resamples
            # truncated normals — approximated by |N| with clipping
            km1, km2, km3 = jax.random.split(k6, 3)
            var_p = jnp.clip(
                jnp.abs(
                    hp["mut_var_mean"]
                    + hp["mut_var_stddev"] * jax.random.normal(km1)
                ),
                1e-7,
                0.999,
            )
            val_p = jnp.clip(
                jnp.abs(
                    hp["mut_val_mean"]
                    + hp["mut_val_stddev"] * jax.random.normal(km2)
                ),
                0.0,
                1.0,
            )
            mutate = jax.random.bernoulli(km1, var_p, xx.shape)
            mval = jax.random.bernoulli(km3, val_p, xx.shape).astype(xx.dtype)
            nx = jnp.where(mutate & (hp["mut_enabled"] > 0), mval, nx)
            return jnp.where(do, nx, xx)

        use_crossover = ~ladder  # ladder keeps x, crossover replaces it
        x = jax.vmap(reinit_x)(x, restart, use_crossover, reinit_keys)

        new_kappa_start = jnp.where(
            restart, jnp.where(ladder, ladder_kappa, hp["kappa_min"]), rs.kappa_start
        )
        kappa = jnp.where(restart, new_kappa_start, kappa)

        # phase transitions
        phase = jnp.where(
            anneal_found,
            PHASE_PUSH,
            jnp.where(
                push_done_sweep,
                PHASE_PUSH_ITER,
                jnp.where(
                    pi_end & ~push_exhausted, PHASE_PUSH, rs.phase
                ),
            ),
        )
        phase = jnp.where(restart, PHASE_ANNEAL, phase).astype(jnp.int32)

        # counters: entering PUSH_ITER resets iter and kappa←kappa_start
        enter_pi = push_done_sweep
        kappa = jnp.where(enter_pi, rs.kappa_start, kappa)
        iter_i = jnp.where(
            enter_pi | restart | anneal_found | (pi_end & ~push_exhausted),
            0,
            it1,
        ).astype(jnp.int32)
        push_idx = jnp.where(restart, 0, jnp.where(anneal_found, 0, push_idx))
        best_rem = jnp.where(restart, INT_MAX, best_rem)

        # cycle policy advances on push sweeps (reference: itm-common.hpp:694)
        order_code = jnp.where(
            is_push & hp["use_cycle"],
            (rs.order_code + 1) % common.N_CYCLE_STATES,
            rs.order_code,
        ).astype(jnp.int32)

        # restarting replicas recompute their violated set from the new x
        viol = jnp.where(
            restart[:, None], jax.vmap(lambda xx: violated_mask(cp, xx))(x), viol
        )

        new_rs = ReplicaState(
            x=x, P=P, pi=pi, viol=viol, kappa=kappa,
            kappa_start=new_kappa_start, kappa_append=new_append,
            iter_i=iter_i, phase=phase,
            push_idx=push_idx.astype(jnp.int32),
            best_remaining=best_rem.astype(jnp.int32),
            restarts=(rs.restarts + restart.astype(jnp.int32)),
            order_code=order_code, key=next_keys,
        )
        return OptState(new_rs, pop, state_key, state.sweeps + 1), None

    state, _ = jax.lax.scan(one_step, state, None, length=n_steps)
    return state


def _sweep_one(
    cp, cost_norm, hp, xx, PP, ppi, vv, order_code, kappa, key, amp, push_all,
    minimize, block_size,
):
    m = cp.m
    B = block_size
    mp = ((m + B - 1) // B) * B
    k_order, k_sweep = jax.random.split(key)
    order = common.make_order(cp, order_code, xx, ppi, k_order, mp)
    process_all = (
        order_code == common.ORDER_CODES[ConstraintOrder.pi_sign_change]
    ) | push_all
    eff_viol = vv | process_all
    sched = jnp.concatenate([eff_viol, jnp.zeros((1,), bool)])[
        jnp.minimum(order, m)
    ]
    compact = jnp.argsort(~sched, stable=True)
    order = order[compact]
    n_rows = jnp.sum(sched.astype(jnp.int32))
    return sweep(
        cp, xx, P=PP, pi=ppi, cost=cost_norm, viol=eff_viol, order=order,
        kappa=kappa, delta=hp["delta"], theta=hp["theta"], key=k_sweep,
        obj_amp=amp, n_rows=n_rows, minimize=minimize, block_size=block_size,
    )


def default_replicas(params: SolverParameters) -> int:
    """reference: get_thread_number (itm-optimizer-common.hpp:757-774) —
    thread<=0 means auto; on TPU the replica batch replaces the thread
    pool."""
    if params.thread > 0:
        return params.thread
    backend = jax.default_backend()
    return 128 if backend not in ("cpu",) else 16


def optimize_compiled(ctx: Context, pb: Problem) -> Result:
    """reference: optimize_problem (itm-optimizer-common.hpp:776-908)."""
    t0 = time.monotonic()
    params = ctx.parameters
    minimize = pb.type == ObjectiveType.minimize
    dtype = jnp.float64 if params.float_type == FloatType.float64 else jnp.float32

    ret = Result(method="optimize")
    n = len(pb.vars.values)
    constraints = make_merged_constraints(ctx, pb)

    if not constraints or n == 0:
        ret.status = ResultStatus.success
        ret.solutions.append(Solution([], pb.objective.value))
        _finalize(ret, pb, len(constraints), t0)
        return ret

    seed = params.seed if params.seed else int(time.time())
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)

    cp = compile_problem(constraints, n, dtype=dtype)
    cost_orig = common.build_cost_vector(pb, n)
    cost_norm = common.normalize_costs(cost_orig, params.cost_norm, rng)

    R = default_replicas(params)
    P_size = params.init_population_size

    def evaluate(x: np.ndarray):
        value = common.objective_value(pb, x)
        rem = 0
        for cst in constraints:
            s = sum(el.factor * int(x[el.variable_index]) for el in cst.elements)
            if not (cst.min <= s <= cst.max):
                rem += 1
        return value, rem

    pop_x, pop_val, pop_rem = init_population_host(
        params, cost_orig, constraints, minimize, rng, P_size, evaluate
    )
    hw = jnp.asarray(make_hash_weights(n, seed))
    pop = Population(
        x=jnp.asarray(pop_x, jnp.int32),
        value=jnp.asarray(pop_val, dtype),
        remaining=jnp.asarray(pop_rem, jnp.int32),
        hash=hash_x(jnp.asarray(pop_x, jnp.int32), hw),
    )
    pop = sort_population(pop, minimize)

    bastert = jnp.asarray(common.init_bastert(cost_orig, minimize), jnp.int32)

    # hyper bundle
    delta = (
        common.compute_delta(cost_norm, params.theta)
        if params.delta < 0
        else params.delta
    )
    hp = dict(
        delta=jnp.asarray(delta, dtype),
        theta=jnp.asarray(params.theta, dtype),
        kappa_min=jnp.asarray(params.kappa_min, dtype),
        kappa_step=jnp.asarray(params.kappa_step, dtype),
        kappa_max=jnp.asarray(params.kappa_max, dtype),
        alpha=jnp.asarray(params.alpha, dtype),
        w=jnp.asarray(int(params.w), jnp.int32),
        limit=jnp.asarray(min(params.limit, INT_MAX), jnp.int32),
        pushes_limit=jnp.asarray(params.pushes_limit, jnp.int32),
        push_iters=jnp.asarray(params.pushing_iteration_limit, jnp.int32),
        pushing_k_factor=jnp.asarray(params.pushing_k_factor, dtype),
        pushing_objective_amplifier=jnp.asarray(
            params.pushing_objective_amplifier, dtype
        ),
        kappa_improve_start=jnp.asarray(params.init_kappa_improve_start, dtype),
        kappa_improve_increase=jnp.asarray(
            params.init_kappa_improve_increase, dtype
        ),
        kappa_improve_stop=jnp.asarray(params.init_kappa_improve_stop, dtype),
        sel_mean=jnp.asarray(params.init_crossover_solution_selection_mean, dtype),
        sel_stddev=jnp.asarray(
            params.init_crossover_solution_selection_stddev, dtype
        ),
        bastert_insertion=jnp.asarray(
            params.init_crossover_bastert_insertion, dtype
        ),
        mut_var_mean=jnp.asarray(params.init_mutation_variable_mean, dtype),
        mut_var_stddev=jnp.asarray(params.init_mutation_variable_stddev, dtype),
        mut_val_mean=jnp.asarray(params.init_mutation_value_mean, dtype),
        mut_val_stddev=jnp.asarray(params.init_mutation_value_stddev, dtype),
        mut_enabled=jnp.asarray(
            0.0
            if (
                params.init_mutation_value_mean == 0.0
                and params.init_mutation_value_stddev == 0.0
            )
            else 1.0,
            dtype,
        ),
        use_cycle=jnp.asarray(params.order == ConstraintOrder.cycle, bool),
    )

    # replica init: crossover from the population, like a first reinit
    keys = jax.random.split(key, R + 1)
    key, rkeys = keys[0], keys[1:]
    init_idx = np.minimum(
        np.abs(rng.normal(0, 0.5, R)) * P_size, P_size - 1
    ).astype(np.int32)
    x0 = pop.x[jnp.asarray(init_idx)]
    viol0 = jax.vmap(lambda xx: violated_mask(cp, xx))(x0)
    order_code = common.ORDER_CODES.get(params.order, 0)
    if params.order == ConstraintOrder.cycle:
        order_code = 0

    rs = ReplicaState(
        x=x0,
        P=jnp.zeros((R, cp.m, cp.Kr), dtype),
        pi=jnp.zeros((R, cp.m), dtype),
        viol=viol0,
        kappa=jnp.full((R,), params.kappa_min, dtype),
        kappa_start=jnp.full((R,), params.kappa_min, dtype),
        kappa_append=jnp.full((R,), params.init_kappa_improve_start, dtype),
        iter_i=jnp.zeros((R,), jnp.int32),
        phase=jnp.zeros((R,), jnp.int32),
        push_idx=jnp.zeros((R,), jnp.int32),
        best_remaining=jnp.full((R,), INT_MAX, jnp.int32),
        restarts=jnp.zeros((R,), jnp.int32),
        order_code=jnp.full((R,), order_code, jnp.int32),
        key=rkeys,
    )
    state = OptState(rs, pop, key, jnp.asarray(0, jnp.int32))

    cn = jnp.asarray(cost_norm, dtype)
    co = jnp.asarray(cost_orig, dtype)
    cc = jnp.asarray(pb.objective.value, dtype)

    time_limit = params.time_limit if params.time_limit > 0 else 10.0
    if params.time_limit <= 0:
        ctx.notice(
            "optimize: no time limit given; defaulting to {}s "
            "(the reference loops until its 1 Hz poll passes the limit)\n",
            time_limit,
        )

    chunk = max(1, params.chunk_size)
    while (time.monotonic() - t0) < time_limit:
        state = evolve(
            cp, cn, co, cc, bastert, hw, hp, state,
            minimize=minimize, block_size=params.block_size, n_steps=chunk,
        )
        if ctx.update_cb:
            pop0 = state.pop
            ctx.update_cb(
                int(pop0.remaining[0]),
                float(pop0.value[0]),
                int(state.sweeps),
                time.monotonic() - t0,
                int(jnp.sum(state.replicas.restarts)),
            )

    # extraction (reference: :869-900); best LAST to match Result.best
    pop = state.pop
    rem0 = int(pop.remaining[0])
    ret.status = (
        ResultStatus.success if rem0 == 0 else ResultStatus.time_limit_reached
    )
    ret.remaining_constraints = rem0
    ret.loop = int(state.sweeps)

    def to_solution(i: int) -> Solution:
        xv = [int(v) for v in np.asarray(pop.x[i])]
        val = common.objective_value(pb, np.asarray(pop.x[i]))
        return Solution(xv, val)

    if params.storage == StorageType.one:
        ret.solutions = [to_solution(0)]
    elif params.storage == StorageType.bound:
        ret.solutions = [to_solution(P_size - 1), to_solution(0)]
    else:
        ret.solutions = [to_solution(i) for i in range(4, -1, -1)]

    _finalize(ret, pb, len(constraints), t0)
    if ctx.finish_cb:
        ctx.finish_cb(ret)
    return ret

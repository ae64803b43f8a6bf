"""The Wedelin "in-the-middle" sweep as masked dense updates.

One sweep = one pass over the (previously violated) constraints, applying
the per-row dual update. The reference is strictly row-sequential
(Gauss-Seidel: each row sees the P/pi/x effects of the previous row via
column walks — reference: itm-solver-inequalities-01.cpp:258-296). Here
rows are processed in blocks of ``block_size``: Jacobi inside a block
(every row computes from the same snapshot), sequential across blocks via
``lax.fori_loop`` — ``block_size=1`` reproduces the reference exactly,
larger blocks trade per-row sequencing for VPU width (SURVEY.md section 7).

Per-row update (reference: itm-common.hpp:382-467 ``affect``,
itm-solver-*.cpp ``compute_update_row``):

1. decay preferences  P[k,:] *= theta
2. reduced costs      r_s = c[j] - sum_{k' in col(j)} a_k'j pi_k'
                                  - sum_{k' in col(j)} a_k'j P[k',s']
   sign-flipped for negative factors a_kj < 0
3. sort r ascending (minimize; descending for maximize) with random
   tie-breaks (reference: calculator_sort + random_shuffle_unique,
   itm-common.hpp:117-148) — realized as a two-key ``lax.sort``
4. select: equalities take the first  bk + c_size  entries; inequalities
   walk positions [bkmin+c_size, min(bkmax+c_size, r_size)] and stop at the
   first reduced cost of blocking sign, a Bernoulli(0.5) coin deciding at
   exactly zero (reference: select_variables + stop_iterating,
   itm-common.hpp:150-163)
5. affect: chosen elements (sorted rank <= selected) set their variable
   (negative factors invert) and get P += d, unchosen the opposite; the
   middle case also moves pi_k by the mean of the straddling reduced costs
   (reference: itm-common.hpp:382-467); d = delta + kappa/(1-kappa) * gap

x-write conflicts inside a block resolve in favor of the later row in
block order (a priority-encoded scatter-max), matching the sequential
semantics of the reference where the last writer wins.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from baryonyx_tpu.ops.layout import CompiledProblem


def activities(cp: CompiledProblem, x: jax.Array) -> jax.Array:
    """Row activities A x as a [m] vector."""
    vals = x[cp.row_vars].astype(cp.row_factor.dtype)
    return jnp.sum(jnp.where(cp.row_mask, cp.row_factor * vals, 0), axis=1)


def violated_mask(cp: CompiledProblem, x: jax.Array) -> jax.Array:
    """Rows whose activity falls outside [bmin, bmax]
    (reference: is_valid_constraint / compute_violated_constraints,
    itm-common.hpp:76-115)."""
    act = activities(cp, x)
    return (act < cp.bmin.astype(act.dtype)) | (act > cp.bmax.astype(act.dtype))


def _row_update(
    cp: CompiledProblem,
    P: jax.Array,
    pi: jax.Array,
    cost: jax.Array,
    k: jax.Array,
    key: jax.Array,
    kappa,
    delta,
    theta,
    obj_amp,
    minimize: bool,
):
    """Compute one row's update from the current (P, pi) snapshot.

    Returns (vars [Kr], slot_mask [Kr], new_bits [Kr], new_P_row [Kr],
    new_pi_k scalar).
    """
    Kr = cp.Kr
    dtype = P.dtype

    vars_ = cp.row_vars[k]  # [Kr]
    a = cp.row_factor[k]  # [Kr]
    mask = cp.row_mask[k]  # [Kr]
    P_row = P[k]  # [Kr]

    # column walks: for each variable of the row, sum a*pi and a*P over all
    # rows touching it (reference: compute_reduced_costs,
    # itm-solver-equalities-101.cpp:161-195)
    crows = cp.col_rows[vars_]  # [Kr, Kc]
    cslots = cp.col_slots[vars_]  # [Kr, Kc]
    cmask = cp.col_mask[vars_]  # [Kr, Kc]
    ca = cp.row_factor[crows, cslots]  # [Kr, Kc]
    sum_a_pi = jnp.sum(jnp.where(cmask, ca * pi[crows], 0), axis=1)
    sum_a_p = jnp.sum(jnp.where(cmask, ca * P[crows, cslots], 0), axis=1)
    # the reference decays P[k,:] *= theta BEFORE the column walks; the
    # walks above saw the un-decayed own-row values, so correct in place
    theta = jnp.asarray(theta, dtype)
    sum_a_p = sum_a_p + a * (theta - 1) * P_row
    P_dec = theta * P_row

    r = cost[vars_] - sum_a_pi - sum_a_p
    r = jnp.where(a < 0, -r, r)
    # push mode amplifies by the (normalized) objective
    # (reference: push_and_compute_update_row,
    # itm-solver-equalities-101.cpp:230-234)
    r = r + jnp.asarray(obj_amp, dtype) * cost[vars_]

    # sort with random tie-breaks: two-key sort (value, random) == sort then
    # shuffle equal runs
    big = jnp.asarray(jnp.inf if minimize else -jnp.inf, dtype)
    keyvals = jnp.where(mask, r, big)
    sortvals = keyvals if minimize else -keyvals
    tie_key, coin_key = jax.random.split(key)
    tb = jax.random.uniform(tie_key, (Kr,), dtype=jnp.float32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (Kr,), 0)
    sorted_v, _, sorted_slot = jax.lax.sort((sortvals, tb, slots), num_keys=2)
    Rs = sorted_v if minimize else -sorted_v  # sorted reduced costs
    rank = jnp.zeros((Kr,), jnp.int32).at[sorted_slot].set(slots)

    r_size = cp.r_size[k]
    c_size = cp.neg_count[k]
    bkmin = cp.bmin[k]
    bkmax = cp.bmax[k]

    # equalities: first bk + c_size entries
    # (reference: itm-solver-equalities-101.cpp:196-206)
    sel_eq = jnp.minimum(bkmin + c_size, r_size) - 1

    # inequalities: walk [bkmin+c_size, min(bkmax+c_size, r_size)], stop at
    # the first blocking-sign entry (coin flip at exactly 0)
    # (reference: itm-solver-inequalities-101.cpp:235-248)
    lo = bkmin + c_size
    hi = jnp.minimum(bkmax + c_size, r_size)
    pos = slots
    coin = jax.random.bernoulli(coin_key, 0.5, (Kr,))
    if minimize:
        stop = (Rs > 0) | ((Rs == 0) & coin)
    else:
        stop = (Rs < 0) | ((Rs == 0) & coin)
    cand = stop & (pos >= lo) & (pos <= hi)
    first = jnp.argmax(cand)  # index of first True (0 if none)
    sel_ineq = jnp.where(jnp.any(cand), first - 1, hi - 1)

    selected = jnp.where(cp.is_eq[k], sel_eq, sel_ineq)

    # affect (reference: itm-common.hpp:382-467)
    case_none = selected < 0
    case_all = selected + 1 >= r_size
    selc = jnp.clip(selected, 0, Kr - 1)
    selc1 = jnp.clip(selected + 1, 0, Kr - 1)
    kappa = jnp.asarray(kappa, dtype)
    kp = kappa / (1 - kappa)
    delta = jnp.asarray(delta, dtype)
    half = jnp.asarray(0.5, dtype)
    mid = jnp.asarray(1.5, dtype)
    d = delta + kp * jnp.where(
        case_none,
        Rs[0] * half,
        jnp.where(case_all, Rs[selc] * mid, Rs[selc1] - Rs[selc]),
    )
    new_pi_k = pi[k] + jnp.where(
        case_none | case_all, jnp.asarray(0, dtype), (Rs[selc] + Rs[selc1]) * half
    )

    chosen = rank <= selected  # per original slot
    s = jnp.where(chosen, jnp.asarray(1, dtype), jnp.asarray(-1, dtype))
    new_P_row = P_dec + s * jnp.sign(a) * d
    new_bits = (s * a > 0).astype(jnp.int32)

    return vars_, mask, new_bits, new_P_row, new_pi_k


@functools.partial(
    jax.jit, static_argnames=("minimize", "block_size", "process_all")
)
def sweep(
    cp: CompiledProblem,
    x: jax.Array,
    P: jax.Array,
    pi: jax.Array,
    cost: jax.Array,
    viol: jax.Array,
    order: jax.Array,
    kappa: jax.Array,
    delta: jax.Array,
    theta: jax.Array,
    key: jax.Array,
    obj_amp: jax.Array,
    n_rows: Optional[jax.Array] = None,
    minimize: bool = True,
    block_size: int = 8,
    process_all: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One full pass over the scheduled rows.

    ``order`` is an int32 permutation of row ids padded to a multiple of
    ``block_size`` with the sentinel ``m``; only rows with ``viol`` set are
    updated unless ``process_all`` (the pi_sign_change policy processes
    every row — reference: itm-common.hpp:667-671). When the caller
    compacts the scheduled rows to the front of ``order`` it can pass
    ``n_rows`` to bound the block loop dynamically — late sweeps with few
    violated rows then cost O(remaining) instead of O(m).

    Returns (x, P, pi, new_violated_mask, remaining_count).
    """
    m, n = cp.m, cp.n
    B = block_size
    if n_rows is None:
        n_blocks = order.shape[0] // B
    else:
        n_blocks = jnp.minimum(
            (n_rows + B - 1) // B, jnp.asarray(order.shape[0] // B, n_rows.dtype)
        )
    dtype = P.dtype

    upd = functools.partial(
        _row_update,
        cp,
        cost=cost,
        kappa=kappa,
        delta=delta,
        theta=theta,
        obj_amp=obj_amp,
        minimize=minimize,
    )

    def block_body(b, carry):
        x, P, pi = carry
        rows = jax.lax.dynamic_slice(order, (b * B,), (B,))
        rows_c = jnp.minimum(rows, m - 1)
        valid = rows < m
        if not process_all:
            valid = valid & viol[rows_c]

        keys = jax.vmap(lambda i: jax.random.fold_in(key, b * B + i))(
            jnp.arange(B)
        )
        vars_, mask, bits, new_P_rows, new_pi = jax.vmap(
            lambda k, kk: upd(P, pi, k=k, key=kk)
        )(rows_c, keys)

        upd_rows = jnp.where(valid, rows_c, m)  # out-of-bounds → dropped
        P = P.at[upd_rows].set(new_P_rows, mode="drop")
        pi = pi.at[upd_rows].set(new_pi, mode="drop")

        # priority scatter: the later row in block order wins conflicting
        # x writes, matching sequential last-writer-wins semantics
        prio = jax.lax.broadcasted_iota(jnp.int32, (B, cp.Kr), 0)
        slot_ok = mask & valid[:, None]
        enc = jnp.where(slot_ok, prio * 2 + bits, -1)
        tgt = jnp.where(slot_ok, vars_, n)
        tmp = jnp.full((n,), -1, jnp.int32).at[tgt.reshape(-1)].max(
            enc.reshape(-1), mode="drop"
        )
        x = jnp.where(tmp >= 0, tmp & 1, x)
        return x, P, pi

    x, P, pi = jax.lax.fori_loop(0, n_blocks, block_body, (x, P, pi))
    new_viol = violated_mask(cp, x)
    return x, P, pi, new_viol, jnp.sum(new_viol.astype(jnp.int32))

"""The Wedelin "in-the-middle" sweep as masked dense updates, lane-major.

One sweep = one pass over the scheduled constraints, applying the per-row
dual update. The reference is strictly row-sequential (Gauss-Seidel: each
row update sees the P/pi/x effects of the previous row via column walks —
reference: itm-solver-inequalities-01.cpp:258-296). Here rows are
processed in blocks of ``block_size``: Jacobi inside a block, sequential
across blocks via ``lax.fori_loop`` — ``block_size=1`` reproduces the
reference's sequencing exactly (SURVEY.md section 7).

TPU layout — replicas on lanes. All solver state carries a trailing
replica axis R (the multi-start axis that replaces the reference's thread
pool): ``x[n,R]``, ``P[m,Kr,R]``, ``pi[m,R]``. Row/column indices are
shared across replicas, so every gather/scatter in the hot loop moves
R-lane vectors (hundreds of bytes per element) instead of 4-byte scalars
— the difference between an HBM-bound kernel and a latency-bound one.

The reference's column walks (sum of a*pi and a*P over every row touching
a variable — reference: itm-solver-equalities-101.cpp:161-195) become one
maintained merged column-sum array ``S[n,R]`` (every consumer reads only
pi+P contributions summed), recomputed exactly at sweep entry and updated
incrementally after each row block (the updates are row-local: pi changes
only for the processed row, P only for its elements), so reduced costs
are a single [B,Kr,R] gather.

Per-row update (reference: itm-common.hpp:382-467 ``affect``):
1. decay preferences  P[k,:] *= theta
2. reduced costs      r_s = c[j] - S[j] (own-row decay
   corrected), sign-flipped where a_kj < 0
3. two-key lax.sort (value, random) == sort + shuffle of equal runs
   (reference: calculator_sort, itm-common.hpp:117-148)
4. select: equalities take the first bk + c_size entries; inequalities
   walk [bkmin+c_size, min(bkmax+c_size, r_size)] and stop at the first
   blocking-sign reduced cost, a Bernoulli(0.5) coin deciding at exactly
   zero (reference: select_variables + stop_iterating)
5. affect: chosen elements (sorted rank <= selected) set their variable
   (negative factors invert) and get P += d, the rest the opposite; the
   middle case moves pi_k by the mean of the straddling reduced costs;
   d = delta + kappa/(1-kappa) * gap

x-write conflicts inside a block resolve in favor of the later row in
block order (priority-encoded scatter-max), matching sequential
last-writer-wins semantics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from baryonyx_tpu.ops.layout import CompiledProblem


def activities(cp: CompiledProblem, x: jax.Array) -> jax.Array:
    """Row activities A x. x: [n] or [n, R] → [m] or [m, R].

    Uses the dense factor matrix (one MXU matmul) when available — gathers
    of 4-byte elements are the bottleneck on TPU — falling back to the
    padded-row gather for very large instances."""
    if cp.dense_A is not None and x.ndim == 2:
        return jnp.dot(
            cp.dense_A,
            x.astype(cp.dense_A.dtype),
            preferred_element_type=cp.dense_A.dtype,
        )
    xg = x[cp.row_vars]  # [m, Kr] or [m, Kr, R]
    a = cp.row_factor
    mask = cp.row_mask
    if x.ndim == 2:
        a = a[:, :, None]
        mask = mask[:, :, None]
    return jnp.sum(jnp.where(mask, a * xg.astype(cp.row_factor.dtype), 0), axis=1)


def violated_mask(cp: CompiledProblem, x: jax.Array) -> jax.Array:
    """Rows whose activity falls outside [bmin, bmax]
    (reference: is_valid_constraint, itm-common.hpp:76-115).
    x: [n] → [m]; x: [n, R] → [m, R]."""
    act = activities(cp, x)
    bmin = cp.bmin.astype(act.dtype)
    bmax = cp.bmax.astype(act.dtype)
    if x.ndim == 2:
        bmin = bmin[:, None]
        bmax = bmax[:, None]
    return (act < bmin) | (act > bmax)


def _onehot_gather(S: jax.Array, idx_flat: jax.Array, n: int) -> jax.Array:
    """rows of S at idx_flat via a one-hot matmul (MXU) — out-of-range
    indices yield zero rows (drop semantics). S: [n, R] → [E, R]."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx_flat.shape[0], n), 1)
    oh = (iota == idx_flat[:, None]).astype(S.dtype)
    return jnp.dot(oh, S, preferred_element_type=S.dtype)


def _onehot_scatter_add(
    S: jax.Array, idx_flat: jax.Array, upd_flat: jax.Array, n: int
) -> jax.Array:
    """S[idx] += upd via the transposed one-hot matmul; duplicate indices
    accumulate, out-of-range indices drop. upd_flat: [E, R]."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, idx_flat.shape[0]), 0)
    oh = (iota == idx_flat[None, :]).astype(S.dtype)
    return S + jnp.dot(oh, upd_flat, preferred_element_type=S.dtype)


def column_sums(
    cp: CompiledProblem, P: jax.Array, pi: jax.Array
) -> jax.Array:
    """Exact S[j] = sum_k a_kj (pi_k + P[k,s(k,j)]) via one scatter-add
    over all elements. The reference tracks the pi and P column walks
    separately (itm-solver-equalities-101.cpp:161-195) but every consumer
    reads only their sum, so one merged array halves the gather/scatter
    traffic in the sweep. P: [m,Kr,R], pi: [m,R]."""
    R = pi.shape[-1]
    a = cp.row_factor[:, :, None]  # [m, Kr, 1]
    contrib = (a * (pi[:, None, :] + P)).reshape(-1, R)
    idx = jnp.where(cp.row_mask, cp.row_vars, cp.n).reshape(-1)
    zeros = jnp.zeros((cp.n, R), P.dtype)
    if idx.shape[0] * cp.n <= (1 << 24):
        return _onehot_scatter_add(zeros, idx, contrib, cp.n)
    return zeros.at[idx].add(contrib, mode="drop")


@functools.partial(
    jax.jit, static_argnames=("minimize", "block_size", "random_solver")
)
def sweep(
    cp: CompiledProblem,
    x: jax.Array,  # int32[n, R]
    P: jax.Array,  # f[m, Kr, R]
    pi: jax.Array,  # f[m, R]
    cost: jax.Array,  # f[n]
    sched: jax.Array,  # bool[m, R] — which (row, replica) to process
    order: jax.Array,  # int32[mp] — shared row permutation, sentinel m padding
    kappa: jax.Array,  # f[R]
    delta: jax.Array,  # f scalar
    theta: jax.Array,  # f scalar
    key: jax.Array,
    obj_amp: jax.Array,  # f[R] — 0 disables the push amplification
    n_rows: Optional[jax.Array] = None,
    minimize: bool = True,
    block_size: int = 8,
    random_solver: bool = False,
    quad_fac: Optional[jax.Array] = None,  # f[n, Qmax] normalized factors
    S: Optional[jax.Array] = None,  # carried merged column sums f[n, R]
    S_fresh: Optional[jax.Array] = None,  # bool: carried sums still exact
) -> Tuple:
    """One full pass over the scheduled rows for all replicas.

    ``random_solver=True`` replaces the computed reduced costs with
    uniform noise, turning selection into a randomized greedy fill — the
    benchmark baseline solver (reference: random-solver.cpp:32-340, CLI
    ``--random``).

    When the caller compacts the scheduled rows (union over replicas) to
    the front of ``order``, ``n_rows`` bounds the block loop dynamically.

    The merged column sums S are updated incrementally inside the sweep;
    callers may carry them across sweeps (P and pi change only in here,
    so carried sums stay consistent up to float accumulation) and pass
    ``S_fresh=False`` periodically to force an exact recompute that
    bounds the drift.

    Returns (x, P, pi, S, new_violated [m,R], remaining [R])."""
    m, n, Kr = cp.m, cp.n, cp.Kr
    B = block_size
    mp = order.shape[0]
    if n_rows is None:
        n_blocks = mp // B
    else:
        n_blocks = jnp.minimum(
            (n_rows + B - 1) // B, jnp.asarray(mp // B, n_rows.dtype)
        )
    dtype = P.dtype
    R = pi.shape[-1]

    theta = jnp.asarray(theta, dtype)
    delta = jnp.asarray(delta, dtype)
    kappa = jnp.asarray(kappa, dtype)
    kp = kappa / (1 - kappa)  # [R]
    amp = jnp.asarray(obj_amp, dtype)  # [R]
    one = jnp.asarray(1, dtype)
    half = jnp.asarray(0.5, dtype)
    mid = jnp.asarray(1.5, dtype)

    if S is None:
        S = column_sums(cp, P, pi)
    else:
        S = jax.lax.cond(
            S_fresh,
            lambda: S,
            lambda: column_sums(cp, P, pi),
        )

    def block_body(b, carry):
        x, P, pi, S = carry
        kb = jax.random.fold_in(key, b)
        k_tie, _ = jax.random.split(kb)

        rows = jax.lax.dynamic_slice(order, (b * B,), (B,))  # [B]
        rows_c = jnp.minimum(rows, m - 1)
        row_ok = rows < m  # [B]
        valid = sched[rows_c] & row_ok[:, None]  # [B, R]

        vars0 = cp.row_vars[rows_c]  # [B, Kr]
        a = cp.row_factor[rows_c]  # [B, Kr]
        mask = cp.row_mask[rows_c]  # [B, Kr]
        a3 = a[:, :, None]
        P_rows = P[rows_c]  # [B, Kr, R]

        # 4-byte-element gathers are the TPU bottleneck; up to a size cap,
        # gather/scatter of S rows run as one-hot matmuls on the MXU
        use_onehot = B * Kr * n <= (1 << 24)
        gvars = jnp.where(mask, vars0, 0)
        if use_onehot:
            gidx = jnp.where(mask, vars0, n).reshape(-1)
            Sg = _onehot_gather(S, gidx, n).reshape(B, Kr, R)
        else:
            Sg = S[gvars]  # [B, Kr, R]
        # c(j, x): linear plus active quadratic neighbor terms
        # (reference: quadratic_cost_type::operator(),
        # itm-common.hpp:1404-1416)
        if cp.has_quad and quad_fac is not None:
            qv = cp.quad_var[gvars]  # [B, Kr, Q]
            qf = quad_fac[gvars]
            qm = cp.quad_mask[gvars]
            qx = x[qv].astype(dtype)  # [B, Kr, Q, R]
            cx = cost[gvars][:, :, None] + jnp.sum(
                jnp.where(qm[..., None], qf[..., None] * qx, 0), axis=2
            )  # [B, Kr, R]
        else:
            cx = cost[gvars][:, :, None]

        # own-row decay correction: the reference decays P[k,:] *= theta
        # before the column walk; S still holds the un-decayed values
        Sg = Sg + a3 * (theta - 1) * P_rows
        P_dec = theta * P_rows

        r = cx - Sg
        r = jnp.where(a3 < 0, -r, r)
        r = r + amp[None, None, :] * cx
        if random_solver:
            r = jax.random.uniform(
                jax.random.fold_in(kb, 2), (B, Kr, R), dtype
            ) - jnp.asarray(0.5, dtype)

        # Random tie-breaks (reference: random_shuffle_unique on equal runs,
        # itm-common.hpp:117-132) realized as sub-resolution noise on the
        # sort key; with all keys distinct, "sorted rank <= selected"
        # becomes a simple threshold test against the (selected+1)-th
        # smallest key — no inverse permutation needed. The Bernoulli coin
        # at exactly-zero reduced cost (reference: stop_iterating,
        # itm-common.hpp:150-163) is subsumed by the noise: a zero becomes
        # a coin-flip-signed perturbation.
        tb = jax.random.uniform(k_tie, (B, Kr, R), dtype=dtype)
        eps = jnp.asarray(1e-6, dtype) * (
            1 + jnp.max(jnp.abs(jnp.where(mask[:, :, None], r, 0)))
        )
        r = r + (tb - jnp.asarray(0.5, dtype)) * eps
        # sv: ascending-selection space (negated for maximize); masked
        # slots sort to the end as +inf
        sv = jnp.where(mask[:, :, None], r if minimize else -r, jnp.inf)

        r_size = cp.r_size[rows_c][:, None]  # [B, 1]
        c_size = cp.neg_count[rows_c][:, None]
        bkmin = cp.bmin[rows_c][:, None]
        bkmax = cp.bmax[rows_c][:, None]
        is_eq = cp.is_eq[rows_c][:, None]

        sel_eq = jnp.minimum(bkmin + c_size, r_size) - 1  # [B, 1]
        lo = bkmin + c_size  # [B, 1]
        hi = jnp.minimum(bkmax + c_size, r_size)

        # The walk over sorted positions [lo, hi] stopping at the first
        # blocking-sign entry (reference: select_variables,
        # itm-solver-inequalities-01.cpp:193-206) reduces to arithmetic on
        # the nonpositive count: selected + 1 = clip(cnt, lo, hi).
        cnt = jnp.sum((sv <= 0).astype(jnp.int32), axis=1)  # [B, R]
        sel_ineq = jnp.clip(cnt, lo, hi) - 1
        selected = jnp.where(is_eq, sel_eq, sel_ineq)  # [B, R]

        if cp.sel_reduction_ok:
            # Sort-free order statistics (see CompiledProblem.J_bot):
            # lax.sort on [B, Kr, R] dominates the sweep (~40% in
            # profiles); the needed ranks come from masked reductions.
            J_bot, J_top = cp.J_bot, cp.J_top
            slot_i = jax.lax.broadcasted_iota(jnp.int32, (B, Kr, R), 1)
            # rank semantics, not value semantics: remove exactly ONE
            # slot (the argmin) per extraction so exact key ties yield a
            # zero sel/sel+1 gap like the reference's sorted array does
            # (value-dedup `work == mj` skipped ALL duplicates, inflating
            # d by kp*(next distinct - tie) on tied ranks)
            bots = []
            work = sv
            for j in range(J_bot):
                mj = jnp.min(work, axis=1)  # [B, R]
                bots.append(mj)
                if j + 1 < J_bot:
                    am = jnp.argmin(work, axis=1)  # [B, R]
                    work = jnp.where(
                        slot_i == am[:, None, :], jnp.inf, work
                    )
            tops = []
            work = jnp.where(mask[:, :, None], sv, -jnp.inf)
            for j in range(J_top):
                Mj = jnp.max(work, axis=1)
                tops.append(Mj)
                if j + 1 < J_top:
                    aM = jnp.argmax(work, axis=1)
                    work = jnp.where(
                        slot_i == aM[:, None, :], -jnp.inf, work
                    )
            # boundary ranks cnt-1 / cnt: largest nonpositive, smallest
            # positive
            mx_np = jnp.max(jnp.where(sv <= 0, sv, -jnp.inf), axis=1)
            mn_p = jnp.min(jnp.where(sv > 0, sv, jnp.inf), axis=1)

            def pick(stack, idx):
                acc = stack[-1]
                for j in range(len(stack) - 2, -1, -1):
                    acc = jnp.where(idx == j, stack[j], acc)
                return acc

            unclipped = (~is_eq) & (selected + 1 == cnt)
            bot_ok = (selected >= 0) & (selected < J_bot)
            sv_sel = jnp.where(
                unclipped,
                mx_np,
                jnp.where(
                    bot_ok, pick(bots, selected), pick(tops, r_size - 1 - selected)
                ),
            )
            bot1_ok = selected + 1 < J_bot
            sv_sel1 = jnp.where(
                unclipped,
                mn_p,
                jnp.where(
                    bot1_ok,
                    pick(bots, selected + 1),
                    pick(tops, r_size - 2 - selected),
                ),
            )
            sv0 = bots[0]
            if minimize:
                Rs_sel, Rs_sel1, Rs0 = sv_sel, sv_sel1, sv0
            else:
                Rs_sel, Rs_sel1, Rs0 = -sv_sel, -sv_sel1, -sv0
            thr = jnp.where(selected < 0, -jnp.inf, sv_sel)[:, None, :]
        else:
            # general fallback: full sort (deep rank needs, e.g. rows
            # whose equality RHS sits mid-row)
            svs = jax.lax.sort(sv, dimension=1)
            slots = jax.lax.broadcasted_iota(jnp.int32, (B, Kr, R), 1)
            # one scalar per (row, lane) from the sorted array:
            # take_along_axis lowers to a pathological per-element gather
            # on TPU (627 us per block in profiles) — a masked reduction
            # is ~300x cheaper
            selc = jnp.clip(selected, 0, Kr - 1)
            selc1 = jnp.clip(selected + 1, 0, Kr - 1)
            oh_sel = slots == selc[:, None, :]
            oh_sel1 = slots == selc1[:, None, :]
            sv_sel = jnp.sum(jnp.where(oh_sel, svs, 0), axis=1)
            sv_sel1 = jnp.sum(jnp.where(oh_sel1, svs, 0), axis=1)
            if minimize:
                Rs_sel, Rs_sel1, Rs0 = sv_sel, sv_sel1, svs[:, 0, :]
            else:
                Rs_sel, Rs_sel1, Rs0 = -sv_sel, -sv_sel1, -svs[:, 0, :]
            thr = jnp.where(selected < 0, -jnp.inf, sv_sel)[:, None, :]

        case_none = selected < 0
        case_all = selected + 1 >= r_size
        d = delta + kp[None, :] * jnp.where(
            case_none, Rs0 * half, jnp.where(case_all, Rs_sel * mid, Rs_sel1 - Rs_sel)
        )
        dpi = jnp.where(
            case_none | case_all, jnp.asarray(0, dtype), (Rs_sel + Rs_sel1) * half
        )  # [B, R]

        # membership by threshold: slot chosen iff its (noised, distinct)
        # key is among the selected+1 smallest
        chosen = sv <= thr  # [B, Kr, R]
        s = jnp.where(chosen, one, -one)
        new_P = P_dec + s * jnp.sign(a3) * d[:, None, :]
        bits = (s * a3 > 0).astype(jnp.int32)

        vmask = valid[:, None, :] & mask[:, :, None]  # [B, Kr, R]
        new_P = jnp.where(vmask, new_P, P_rows)
        dpi = jnp.where(valid, dpi, 0)

        # writes: whole rows (per-lane masking already folded in)
        w_rows = jnp.where(row_ok, rows_c, m)
        P = P.at[w_rows].set(new_P, mode="drop")
        pi = pi.at[w_rows].add(dpi, mode="drop")

        # incremental column sums (row-local updates)
        sidx = jnp.where(mask & row_ok[:, None], vars0, n).reshape(-1)
        upd = (a3 * (dpi[:, None, :] + new_P - P_rows)).reshape(-1, R)
        if use_onehot:
            S = _onehot_scatter_add(S, sidx, upd, n)
        else:
            S = S.at[sidx].add(upd, mode="drop")

        # priority scatter: later row in block wins conflicting x writes
        prio = jax.lax.broadcasted_iota(jnp.int32, (B, Kr, R), 0)
        enc = jnp.where(vmask, prio * 2 + bits, -1)
        tmp = jnp.full((n, R), -1, jnp.int32).at[sidx].max(
            enc.reshape(-1, R), mode="drop"
        )
        x = jnp.where(tmp >= 0, tmp & 1, x)
        return x, P, pi, S

    x, P, pi, S = jax.lax.fori_loop(0, n_blocks, block_body, (x, P, pi, S))
    new_viol = violated_mask(cp, x)
    return (
        x,
        P,
        pi,
        S,
        new_viol,
        jnp.sum(new_viol.astype(jnp.int32), axis=0),
    )

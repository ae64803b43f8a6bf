"""Sweep kernel for ℤ-coefficient problems (equalities_Z / inequalities_Z).

The reference routes problems with general integer coefficients to
``solver_inequalities_Zcoeff`` (reference: itm-solver-inequalities-Z.cpp),
which differs from the 0/1 and ±1 kernels:

- reduced costs use absolute factors and fold pi and P together:
  r_j = c(j) - sum_{k' in col(j)} |a_k'j| (pi_k' + P[k',s'])
  with no sign flip (reference: compute_reduced_costs, :253-293)
- each row is solved by a per-row subsolver: exact enumeration over the
  row's feasible assignments for short rows (reference: exhaustive_solver)
  or branch-and-bound, with a greedy prefix walk for ±1 rows
  (reference: select_variables_101, :308-325). Long ℤ rows use an exact
  0-1 knapsack DP over factor sums (``_dp_select`` below) in place of the
  reference's DFS branch-and-bound
  (branch-and-bound-solver.hpp:450-533) — same optimum, but a dense
  bounded-shape recurrence the VPU can chew on instead of a branchy walk
- the update ``local_affect`` (:346-439) uses a constant
  d = kappa/(1-kappa) + delta, always moves pi_k, sets chosen variables
  regardless of factor sign, and runs a "repair" second pass that
  recomputes each variable's reduced cost after the update and compensates
  P when its sign disagrees with the assignment

Here (lane-major, like ops/sweep.py): enumeration scores are one matmul
``assign_bits[row] @ r`` per block (MXU work), the walk is a masked prefix
scan, and the repair pass is exact and fully vectorized — each variable
appears once per row, so repairs are independent within a row.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from baryonyx_tpu.ops.layout import CompiledProblem
from baryonyx_tpu.ops.sweep import violated_mask


def _dp_select(
    cp: CompiledProblem,
    rows_c: jax.Array,  # int32[B]
    r: jax.Array,  # f[B, Kr, R] reduced costs
    mask: jax.Array,  # bool[B, Kr]
    minimize: bool,
) -> jax.Array:
    """Exact per-row 0-1 selection for long ℤ rows: argmin (argmax) of
    sum_{s chosen} r_s subject to bmin <= sum_s a_s z_s <= bmax, solved by
    a DP over the bounded activity range — semantically identical to the
    enumeration path (and to the reference's branch-and-bound,
    branch-and-bound-solver.hpp:450-533) but polynomial in the activity
    span instead of exponential in the row length.

    Table f[b, w, r] = best score with activity (w + dp_lo). The chosen
    set is carried alongside as packed uint32 bitmask words, so no
    traceback pass or [Kr, W] decision table is needed.

    Returns chosen bool[B, Kr, R]."""
    B, Kr, R = r.shape
    W = cp.Wdp
    dtype = r.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    nw = (Kr + 31) // 32

    # gcd-scaled factors/bounds (ops/layout.py): the DP runs in a/g space
    # so arbitrary coefficient magnitudes fit the bounded table
    a = cp.dp_fac[rows_c]  # [B, Kr] int32
    lo = cp.dp_lo[rows_c]  # [B]
    rq = r if minimize else -r
    # padded/invalid slots must never be picked: +inf item cost means the
    # take-branch never wins
    rq = jnp.where(mask[:, :, None], rq, inf)

    w_iota = jnp.arange(W, dtype=jnp.int32)  # [W]
    f0 = jnp.where(
        (w_iota[None, :] == -lo[:, None])[:, :, None],
        jnp.zeros((), dtype),
        inf,
    ) * jnp.ones((B, W, R), dtype)
    m0 = jnp.zeros((B, W, R, nw), jnp.uint32)

    def slot_body(s, carry):
        f, msk = carry
        a_s = a[:, s]  # [B]
        # f_shifted[w] = f[w - a_s] with +inf outside the table
        widx = w_iota[None, :] - a_s[:, None]  # [B, W]
        ok = (widx >= 0) & (widx < W)
        widx_c = jnp.clip(widx, 0, W - 1)
        fsh = jnp.take_along_axis(f, widx_c[:, :, None], axis=1)
        fsh = jnp.where(ok[:, :, None], fsh, inf)
        cand = fsh + rq[:, s, :][:, None, :]  # [B, W, R]
        take = cand < f
        # chosen-set words follow the winning branch, with bit s set on take
        msh = jnp.take_along_axis(msk, widx_c[:, :, None, None], axis=1)
        word = s // 32  # traced int32
        bit = jnp.uint32(1) << (s % 32).astype(jnp.uint32)
        nw_iota = jnp.arange(nw, dtype=jnp.int32)
        msh = jnp.where(nw_iota[None, None, None, :] == word, msh | bit, msh)
        f = jnp.where(take, cand, f)
        msk = jnp.where(take[..., None], msh, msk)
        return f, msk

    f, msk = jax.lax.fori_loop(0, Kr, slot_body, (f0, m0))

    # feasible activity window per row (scaled space)
    wlo = (cp.dp_blo[rows_c] - lo)[:, None]  # [B, 1]
    whi = (cp.dp_bhi[rows_c] - lo)[:, None]
    in_range = (w_iota[None, :] >= wlo) & (w_iota[None, :] <= whi)  # [B, W]
    f = jnp.where(in_range[:, :, None], f, inf)
    w_best = jnp.argmin(f, axis=1)  # [B, R]
    words = jnp.take_along_axis(
        msk, w_best[:, None, :, None], axis=1
    )[:, 0]  # [B, R, nw]
    kr_iota = jnp.arange(Kr, dtype=jnp.int32)
    wsel = jnp.take(words, kr_iota // 32, axis=2)  # [B, R, Kr]
    bits = (wsel >> (kr_iota % 32).astype(jnp.uint32)[None, None, :]) & 1
    return jnp.transpose(bits, (0, 2, 1)) > 0  # [B, Kr, R]


_DP_BIG = 1e30  # finite "infinity": keeps all DP sums finite


def _dp_select_pallas(
    cp: CompiledProblem,
    rows_c: jax.Array,  # int32[B]
    r: jax.Array,  # f32[B, Kr, R]
    mask: jax.Array,  # bool[B, Kr]
    minimize: bool,
) -> jax.Array:
    """VMEM-resident Pallas variant of ``_dp_select``: the f table and the
    chosen-set mask words stay on-chip across the whole slot loop, so HBM
    sees each tensor once per row instead of once per (row, slot) — the
    jnp DP is bandwidth-bound on exactly that traffic (measured: the DP
    dominates Z-instance sweep time). One grid cell = (block row, 128-lane
    replica tile); the W-axis shift by each slot's factor is a sublane
    `pltpu.roll`. Exact same selection as ``_dp_select``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from baryonyx_tpu.ops import psweep as _pw

    B, Kr, R = r.shape
    W = cp.Wdp
    nw = (Kr + 31) // 32
    rq = r if minimize else -r
    rq = jnp.where(mask[:, :, None], rq, _DP_BIG)

    a_blk = cp.dp_fac[rows_c]  # [B, Kr] i32 (0 on non-DP rows: harmless)
    lo_blk = cp.dp_lo[rows_c].astype(jnp.int32)  # [B]
    wlo_blk = (cp.dp_blo[rows_c] - cp.dp_lo[rows_c]).astype(jnp.int32)
    whi_blk = (cp.dp_bhi[rows_c] - cp.dp_lo[rows_c]).astype(jnp.int32)

    def kernel(a_ref, lo_ref, wlo_ref, whi_ref, rq_ref, out_ref, f_scr, m_scr):
        b = pl.program_id(0)
        wi = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
        lo = lo_ref[b]
        f_scr[:, :] = jnp.where(
            wi == -lo, jnp.float32(0.0), jnp.float32(_DP_BIG)
        )
        for w_ in range(nw):
            m_scr[w_, :, :] = jnp.zeros((W, 128), jnp.uint32)
        for s in range(Kr):
            a_s = a_ref[b, s]
            sh = jax.lax.rem(a_s, W)
            sh = jnp.where(sh < 0, sh + W, sh).astype(jnp.int32)
            f = f_scr[:, :]
            fsh = pltpu.roll(f, sh, axis=0)
            src = wi - a_s
            ok = (src >= 0) & (src < W)
            fsh = jnp.where(ok, fsh, jnp.float32(_DP_BIG))
            cand = fsh + rq_ref[0, s, :][None, :]
            take = cand < f
            word, bit = s // 32, jnp.uint32(1 << (s % 32))
            for w_ in range(nw):
                mw = m_scr[w_, :, :]
                msh = pltpu.roll(mw, sh, axis=0)
                msh = jnp.where(ok, msh, jnp.uint32(0))
                if w_ == word:
                    msh = msh | bit
                m_scr[w_, :, :] = jnp.where(take, msh, mw)
            f_scr[:, :] = jnp.where(take, cand, f)
        f = f_scr[:, :]
        f = jnp.where((wi >= wlo_ref[b]) & (wi <= whi_ref[b]), f, jnp.float32(_DP_BIG))
        fmin = jnp.min(f, axis=0)  # [128]
        wbest = jnp.min(jnp.where(f == fmin[None, :], wi, W), axis=0)
        onehot = wi == wbest[None, :]  # [W, 128]
        rows = []
        for s in range(Kr):
            bits = (
                (m_scr[s // 32, :, :] >> jnp.uint32(s % 32)) & jnp.uint32(1)
            ).astype(jnp.int32)
            rows.append(jnp.max(jnp.where(onehot, bits, 0), axis=0))
        out_ref[0, :, :] = jnp.stack(rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, R // 128),
        in_specs=[
            pl.BlockSpec((1, Kr, 128), lambda b, t, *_: (b, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, Kr, 128), lambda b, t, *_: (b, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((W, 128), jnp.float32),
            pltpu.VMEM((nw, W, 128), jnp.uint32),
        ],
    )
    chosen = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kr, R), jnp.int32),
        interpret=_pw.enabled_mode() == "interpret",
    )(a_blk, lo_blk, wlo_blk, whi_blk, rq)
    return chosen > 0


def _dp_dispatch(cp, rows_c, r, mask, minimize):
    """Pallas DP when the backend supports it, jnp fallback otherwise."""
    from baryonyx_tpu.ops import psweep as _pw

    B, Kr, R = r.shape
    if (
        _pw.enabled_mode() is not None
        and R % 128 == 0
        and Kr <= 128  # static unroll bound (compile size)
        and cp.Wdp * 128 * 4 * (1 + (Kr + 31) // 32) <= 8 * 1024 * 1024
    ):
        return _dp_select_pallas(cp, rows_c, r, mask, minimize)
    return _dp_select(cp, rows_c, r, mask, minimize)


def _walk_select(cp, rows_c, r_masked, a, kb, minimize, B, Kr, R, dtype):
    """Greedy prefix walk for long ±1 rows (reference:
    select_variables_101, itm-solver-inequalities-Z.cpp:308-325):
    sort reduced costs (random tie-break), take the longest feasible
    prefix before the first stop-sign element. Returns chosen [B, Kr, R]."""
    tb = jax.random.uniform(jax.random.fold_in(kb, 1), (B, Kr, R), jnp.float32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (B, Kr, R), 1)
    sortv = r_masked if minimize else -r_masked
    sv, _, sslot = jax.lax.sort((sortv, tb, slots), dimension=1, num_keys=2)
    rs_sorted = sv if minimize else -sv
    rank = jnp.argsort(sslot, axis=1)
    f_sorted = jnp.take_along_axis(
        jnp.broadcast_to(a[:, :, None], (B, Kr, R)), sslot, axis=1
    )
    prefix = jnp.cumsum(f_sorted, axis=1)  # activity of prefix [0..i]
    bkmin = cp.bmin[rows_c][:, None, None].astype(dtype)
    bkmax = cp.bmax[rows_c][:, None, None].astype(dtype)
    r_size = cp.r_size[rows_c][:, None]  # [B, 1]
    in_len = slots < r_size[:, :, None]
    feasible = (
        (prefix >= bkmin) & (prefix <= bkmax) & in_len
    )  # [B, Kr, R] — position i means prefix 0..i selected
    empty_feasible = (bkmin <= 0) & (bkmax >= 0)  # selected = -1
    if minimize:
        stop = rs_sorted > 0
    else:
        stop = rs_sorted < 0
    # first feasible position (or -1 if the empty prefix is feasible)
    anyf = jnp.any(feasible, axis=1)  # [B, R]
    firstf = jnp.argmax(feasible, axis=1)
    firstf = jnp.where(
        empty_feasible[:, 0, :], -jnp.ones_like(firstf), jnp.where(anyf, firstf, Kr)
    )
    # the walk breaks at the first stop-sign element after a feasible
    # prefix exists: cut = min { i : i > firstf and stop[i] }
    idxs = slots
    stop_after = stop & (idxs > firstf[:, None, :])
    any_stop = jnp.any(stop_after, axis=1)
    cut = jnp.where(any_stop, jnp.argmax(stop_after, axis=1) - 1, Kr - 1)
    # best = last feasible position <= cut
    ok = feasible & (idxs <= cut[:, None, :])
    best_walk = jnp.where(
        jnp.any(ok, axis=1),
        (Kr - 1) - jnp.argmax(ok[:, ::-1, :], axis=1),
        jnp.where(empty_feasible[:, 0, :], -1, -1),
    )  # [B, R]; -1 = select nothing
    return rank <= best_walk[:, None, :]


def column_sums_abs(cp: CompiledProblem, P: jax.Array, pi: jax.Array) -> jax.Array:
    """S[j] = sum_k |a_kj| (pi_k + P[k,s]) via one scatter-add."""
    R = pi.shape[-1]
    absa = jnp.abs(cp.row_factor)[:, :, None]  # [m, Kr, 1]
    contrib = (absa * (pi[:, None, :] + P)).reshape(-1, R)
    idx = jnp.where(cp.row_mask, cp.row_vars, cp.n).reshape(-1)
    return jnp.zeros((cp.n, R), P.dtype).at[idx].add(contrib, mode="drop")


@functools.partial(jax.jit, static_argnames=("minimize", "block_size"))
def z_sweep(
    cp: CompiledProblem,
    x: jax.Array,  # int32[n, R]
    P: jax.Array,  # f[m, Kr, R]
    pi: jax.Array,  # f[m, R]
    cost: jax.Array,  # f[n]
    sched: jax.Array,  # bool[m, R]
    order: jax.Array,  # int32[mp]
    kappa: jax.Array,  # f[R]
    delta: jax.Array,
    theta: jax.Array,
    key: jax.Array,
    obj_amp: jax.Array,  # f[R]
    n_rows: Optional[jax.Array] = None,
    minimize: bool = True,
    block_size: int = 8,
    quad_fac: Optional[jax.Array] = None,  # f[n, Qmax] normalized factors
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One pass over the scheduled rows of a Z problem for all replicas.

    Returns (x, P, pi, new_violated [m,R], remaining [R])."""
    m, n, Kr, Amax = cp.m, cp.n, cp.Kr, cp.Amax
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
    d_const = kp + delta  # [R] (reference: local_affect :361)
    amp = jnp.asarray(obj_amp, dtype)
    big = jnp.asarray(jnp.inf if minimize else -jnp.inf, dtype)
    half = jnp.asarray(0.5, dtype)
    mid = jnp.asarray(1.5, dtype)

    S = column_sums_abs(cp, P, pi)

    def block_body(b, carry):
        x, P, pi, S = carry
        kb = jax.random.fold_in(key, b)

        rows = jax.lax.dynamic_slice(order, (b * B,), (B,))
        rows_c = jnp.minimum(rows, m - 1)
        row_ok = rows < m
        valid = sched[rows_c] & row_ok[:, None]  # [B, R]

        vars0 = cp.row_vars[rows_c]  # [B, Kr]
        a = cp.row_factor[rows_c]
        absa = jnp.abs(a)
        mask = cp.row_mask[rows_c]
        a3 = absa[:, :, None]
        P_rows = P[rows_c]  # [B, Kr, R]

        gvars = jnp.where(mask, vars0, 0)
        Sv = S[gvars]  # [B, Kr, R]
        # c(j, x): linear plus active quadratic neighbor terms
        # (reference: quadratic_cost_type::operator(),
        # itm-common.hpp:1404-1416 — applies to every solver including Z
        # via the template fan-out, itm.hpp:32-84)
        if cp.has_quad and quad_fac is not None:
            qv = cp.quad_var[gvars]  # [B, Kr, Q]
            qf = quad_fac[gvars]
            qm = cp.quad_mask[gvars]
            qx = x[qv].astype(dtype)  # [B, Kr, Q, R]
            cx = cost[gvars][:, :, None] + jnp.sum(
                jnp.where(qm[..., None], qf[..., None] * qx, 0), axis=2
            )  # [B, Kr, R]
        else:
            cx = cost[gvars][:, :, None]  # [B, Kr, 1]

        # own-row decay correction (P[k,:] *= theta before reduced costs)
        Sv = Sv + a3 * (theta - 1) * P_rows
        P_dec = theta * P_rows

        r = cx - Sv  # [B, Kr, R]
        r = r + amp[None, None, :] * cx
        r_masked = jnp.where(mask[:, :, None], r, big)

        # ---- enumeration path: scores for every feasible assignment ----
        bits = cp.assign_bits[rows_c].astype(dtype)  # [B, Amax, Kr]
        avalid = cp.assign_valid[rows_c]  # [B, Amax]
        scores = jax.lax.dot_general(
            bits,
            jnp.where(mask[:, :, None], r, 0),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype,
        )  # [B, Amax, R]
        scores = jnp.where(avalid[:, :, None], scores, big)
        best_a = (
            jnp.argmin(scores, axis=1) if minimize else jnp.argmax(scores, axis=1)
        )  # [B, R]
        # chosen_enum[b,s,r] = assign_bits[b, best_a[b,r], s], realized as a
        # one-hot contraction over the assignment axis (MXU-friendly)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (B, Amax, R), 1)
            == best_a[:, None, :]
        ).astype(dtype)
        chosen_enum = (
            jax.lax.dot_general(
                bits,
                onehot,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype,
            )
            > 0.5
        )  # [B, Kr, R]

        # ---- greedy prefix walk for long ±1 rows (select_variables_101):
        # skipped entirely (static flag) when every real row is solved by
        # enumeration or the DP — the walk's 3-operand lax.sort is the
        # dominant per-block cost on enum/DP-only instances
        r_size = cp.r_size[rows_c][:, None]  # [B, 1]
        chosen_walk = None
        if cp.z_needs_walk:
            chosen_walk = _walk_select(
                cp, rows_c, r_masked, a, kb, minimize, B, Kr, R, dtype
            )
        enum_flag = cp.enum_row[rows_c][:, None, None]  # [B,1,1]
        if chosen_walk is None:
            chosen = chosen_enum  # non-enum rows are DP rows (or padding)
        else:
            chosen = jnp.where(enum_flag, chosen_enum, chosen_walk)  # [B, Kr, R]
        if cp.Wdp:
            # exact DP for long ℤ rows (reference: branch-and-bound path)
            chosen_dp = _dp_dispatch(cp, rows_c, r, mask, minimize)
            dp_flag = cp.dp_row[rows_c][:, None, None]
            chosen = jnp.where(dp_flag, chosen_dp, chosen)
        chosen = chosen & mask[:, :, None]

        # ---- pi update (reference local_affect cases, on the reordered R:
        # chosen sorted first) ----
        nchosen = jnp.sum(chosen.astype(jnp.int32), axis=1)  # [B, R]
        case_none = nchosen == 0
        case_all = nchosen >= r_size
        if minimize:
            worst_chosen = jnp.max(jnp.where(chosen, r, -jnp.inf), axis=1)
            best_unchosen = jnp.min(
                jnp.where(~chosen & mask[:, :, None], r, jnp.inf), axis=1
            )
            r0_all = jnp.min(jnp.where(mask[:, :, None], r, jnp.inf), axis=1)
        else:
            worst_chosen = jnp.min(jnp.where(chosen, r, jnp.inf), axis=1)
            best_unchosen = jnp.max(
                jnp.where(~chosen & mask[:, :, None], r, -jnp.inf), axis=1
            )
            r0_all = jnp.max(jnp.where(mask[:, :, None], r, -jnp.inf), axis=1)
        dpi = jnp.where(
            case_none,
            r0_all * half,
            jnp.where(
                case_all,
                worst_chosen * mid,
                (worst_chosen + best_unchosen) * half,
            ),
        )  # [B, R]
        dpi = jnp.where(valid, dpi, 0)

        # ---- P update with repair ----
        sgn = jnp.where(chosen, jnp.ones((), dtype), -jnp.ones((), dtype))
        P1 = P_dec + sgn * d_const[None, None, :]
        # repair: reduced cost recomputed after pi/P change
        # (reference: local_compute_reduced_cost, :296-307)
        repair = r - a3 * (dpi[:, None, :] + sgn * d_const[None, None, :])
        fix_chosen = chosen & (repair >= 0)
        fix_unchosen = (~chosen) & (repair <= 0)
        P2 = jnp.where(
            fix_chosen,
            P1 - repair + d_const[None, None, :],
            jnp.where(fix_unchosen, P1 + repair - d_const[None, None, :], P1),
        )

        vmask = valid[:, None, :] & mask[:, :, None]
        P2 = jnp.where(vmask, P2, P_rows)
        bits_out = chosen.astype(jnp.int32)

        w_rows = jnp.where(row_ok, rows_c, m)
        P = P.at[w_rows].set(P2, mode="drop")
        pi = pi.at[w_rows].add(dpi, mode="drop")

        sidx = jnp.where(mask & row_ok[:, None], vars0, n).reshape(-1)
        dS = a3 * (dpi[:, None, :] + (P2 - P_rows))
        S = S.at[sidx].add(dS.reshape(-1, R), mode="drop")

        prio = jax.lax.broadcasted_iota(jnp.int32, (B, Kr, R), 0)
        enc = jnp.where(vmask, prio * 2 + bits_out, -1)
        tmp = jnp.full((n, R), -1, jnp.int32).at[sidx].max(
            enc.reshape(-1, R), mode="drop"
        )
        x = jnp.where(tmp >= 0, tmp & 1, x)
        return x, P, pi, S

    x, P, pi, S = jax.lax.fori_loop(0, n_blocks, block_body, (x, P, pi, S))
    new_viol = violated_mask(cp, x)
    return x, P, pi, new_viol, jnp.sum(new_viol.astype(jnp.int32), axis=0)

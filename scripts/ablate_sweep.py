"""Ablate stages of the real sweep to find the remaining bottleneck.

Builds the bench problem (scp 200x1000), then times modified sweeps with
individual stages disabled. Wrong results, honest timings.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.ops.layout import compile_problem
from baryonyx_tpu.ops.sweep import (
    _onehot_gather,
    _onehot_scatter_add,
    column_sums,
    violated_mask,
)
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common


def make_sweep(cp, cost, minimize=True, B=50, ablate=()):
    """A stripped copy of ops.sweep:sweep (linear costs, reduction
    selection) with stages named in `ablate` disabled."""
    m, n, Kr = cp.m, cp.n, cp.Kr
    dtype = jnp.float32

    def sweep_fn(x, P, pi, S, sched, order, kappa, delta, theta, key, amp):
        S_api, S_p = S
        R = pi.shape[-1]
        kp = kappa / (1 - kappa)
        half = jnp.asarray(0.5, dtype)
        mid = jnp.asarray(1.5, dtype)
        one = jnp.asarray(1, dtype)
        mp = order.shape[0]
        n_blocks = mp // B

        def block_body(b, carry):
            x, P, pi, S_api, S_p = carry
            kb = jax.random.fold_in(key, b)
            k_tie, _ = jax.random.split(kb)
            rows = jax.lax.dynamic_slice(order, (b * B,), (B,))
            rows_c = jnp.minimum(rows, m - 1)
            row_ok = rows < m
            valid = sched[rows_c] & row_ok[:, None]
            vars0 = cp.row_vars[rows_c]
            a = cp.row_factor[rows_c]
            mask = cp.row_mask[rows_c]
            a3 = a[:, :, None]
            P_rows = P[rows_c] if "Pgather" not in ablate else jnp.zeros(
                (B, Kr, R), dtype
            )
            gvars = jnp.where(mask, vars0, 0)
            if "Sgather" not in ablate:
                gidx = jnp.where(mask, vars0, n).reshape(-1)
                Sa = _onehot_gather(S_api, gidx, n).reshape(B, Kr, R)
                Sp = _onehot_gather(S_p, gidx, n).reshape(B, Kr, R)
            else:
                Sa = jnp.zeros((B, Kr, R), dtype)
                Sp = jnp.zeros((B, Kr, R), dtype)
            cx = cost[gvars][:, :, None]
            Sp = Sp + a3 * (theta - 1) * P_rows
            P_dec = theta * P_rows
            r = cx - Sa - Sp
            r = jnp.where(a3 < 0, -r, r)
            r = r + amp[None, None, :] * cx

            if "select" not in ablate:
                tb = jax.random.uniform(k_tie, (B, Kr, R), dtype=dtype)
                eps = jnp.asarray(1e-6, dtype) * (
                    1 + jnp.max(jnp.abs(jnp.where(mask[:, :, None], r, 0)))
                )
                r = r + (tb - half) * eps
                sv = jnp.where(mask[:, :, None], r, jnp.inf)
                r_size = cp.r_size[rows_c][:, None]
                c_size = cp.neg_count[rows_c][:, None]
                bkmin = cp.bmin[rows_c][:, None]
                bkmax = cp.bmax[rows_c][:, None]
                is_eq = cp.is_eq[rows_c][:, None]
                sel_eq = jnp.minimum(bkmin + c_size, r_size) - 1
                lo = bkmin + c_size
                hi = jnp.minimum(bkmax + c_size, r_size)
                cnt = jnp.sum((sv <= 0).astype(jnp.int32), axis=1)
                selected = jnp.where(is_eq, sel_eq, jnp.clip(cnt, lo, hi) - 1)
                J_bot, J_top = cp.J_bot, cp.J_top
                bots = []
                work = sv
                for j in range(J_bot):
                    mj = jnp.min(work, axis=1)
                    bots.append(mj)
                    if j + 1 < J_bot:
                        work = jnp.where(work == mj[:, None, :], jnp.inf, work)
                tops = []
                work = jnp.where(mask[:, :, None], sv, -jnp.inf)
                for j in range(J_top):
                    Mj = jnp.max(work, axis=1)
                    tops.append(Mj)
                    if j + 1 < J_top:
                        work = jnp.where(work == Mj[:, None, :], -jnp.inf, work)
                mx_np = jnp.max(jnp.where(sv <= 0, sv, -jnp.inf), axis=1)
                mn_p = jnp.min(jnp.where(sv > 0, sv, jnp.inf), axis=1)

                def pick(stack, idx):
                    acc = stack[-1]
                    for j in range(len(stack) - 2, -1, -1):
                        acc = jnp.where(idx == j, stack[j], acc)
                    return acc

                is_ineq = ~is_eq
                unclipped = is_ineq & (selected + 1 == cnt)
                bot_ok = (selected >= 0) & (selected < J_bot)
                sv_sel = jnp.where(
                    unclipped,
                    mx_np,
                    jnp.where(
                        bot_ok,
                        pick(bots, selected),
                        pick(tops, r_size - 1 - selected),
                    ),
                )
                sv_sel1 = jnp.where(
                    unclipped,
                    mn_p,
                    jnp.where(
                        selected + 1 < J_bot,
                        pick(bots, selected + 1),
                        pick(tops, r_size - 2 - selected),
                    ),
                )
                Rs_sel, Rs_sel1, Rs0 = sv_sel, sv_sel1, bots[0]
                thr = jnp.where(selected < 0, -jnp.inf, sv_sel)[:, None, :]
                case_none = selected < 0
                case_all = selected + 1 >= r_size
                d = delta + kp[None, :] * jnp.where(
                    case_none,
                    Rs0 * half,
                    jnp.where(case_all, Rs_sel * mid, Rs_sel1 - Rs_sel),
                )
                dpi = jnp.where(case_none | case_all, 0.0, (Rs_sel + Rs_sel1) * half)
                chosen = sv <= thr
            else:
                d = jnp.full((B, R), 0.01, dtype)
                dpi = jnp.full((B, R), 0.001, dtype)
                chosen = r < 0

            s = jnp.where(chosen, one, -one)
            new_P = P_dec + s * jnp.sign(a3) * d[:, None, :]
            bits = (s * a3 > 0).astype(jnp.int32)
            vmask = valid[:, None, :] & mask[:, :, None]
            new_P = jnp.where(vmask, new_P, P_rows)
            dpi = jnp.where(valid, dpi, 0)
            w_rows = jnp.where(row_ok, rows_c, m)
            if "Pwrite" not in ablate:
                P = P.at[w_rows].set(new_P, mode="drop")
                pi = pi.at[w_rows].add(dpi, mode="drop")
            sidx = jnp.where(mask & row_ok[:, None], vars0, n).reshape(-1)
            if "Supdate" not in ablate:
                upd_api = (a3 * dpi[:, None, :]).reshape(-1, R)
                upd_p = (a3 * (new_P - P_rows)).reshape(-1, R)
                S_api = _onehot_scatter_add(S_api, sidx, upd_api, n)
                S_p = _onehot_scatter_add(S_p, sidx, upd_p, n)
            if "xwrite" not in ablate:
                prio = jax.lax.broadcasted_iota(jnp.int32, (B, Kr, R), 0)
                enc = jnp.where(vmask, prio * 2 + bits, -1)
                tmp = jnp.full((n, R), -1, jnp.int32).at[sidx].max(
                    enc.reshape(-1, R), mode="drop"
                )
                x = jnp.where(tmp >= 0, tmp & 1, x)
            return x, P, pi, S_api, S_p

        x, P, pi, S_api, S_p = jax.lax.fori_loop(
            0, n_blocks, block_body, (x, P, pi, S_api, S_p)
        )
        if "viol" not in ablate:
            nv = violated_mask(cp, x)
            rem = jnp.sum(nv.astype(jnp.int32), axis=0)
        else:
            nv = sched
            rem = jnp.sum(x[:1], axis=0)
        return x, P, pi, (S_api, S_p), nv, rem

    return sweep_fn


def time_variant(cp, cost_norm, R, B, ablate):
    m, n = cp.m, cp.n
    mp = ((m + B - 1) // B) * B
    order = jnp.concatenate(
        [jnp.arange(m, dtype=jnp.int32), jnp.full((mp - m,), m, jnp.int32)]
    )
    key = jax.random.key(0)
    x = jax.random.bernoulli(key, 0.5, (n, R)).astype(jnp.int32)
    P = jnp.zeros((m, cp.Kr, R), jnp.float32)
    pi = jnp.zeros((m, R), jnp.float32)
    S0 = (jnp.zeros((n, R), jnp.float32), jnp.zeros((n, R), jnp.float32))
    fn = make_sweep(cp, cost_norm, B=B, ablate=ablate)

    @functools.partial(jax.jit, static_argnames=("nsteps",))
    def run(x, P, pi, key, nsteps):
        def body(c, i):
            x, P, pi, S, sched, key = c
            key, k = jax.random.split(key)
            x, P, pi, S, sched, rem = fn(
                x, P, pi, S, sched, order,
                jnp.full((R,), 0.1, jnp.float32), jnp.float32(0.01),
                jnp.float32(0.5), k, jnp.zeros((R,), jnp.float32),
            )
            return (x, P, pi, S, sched, key), rem
        sched0 = violated_mask(cp, x)
        c, rems = jax.lax.scan(body, (x, P, pi, S0, sched0, key), jnp.arange(nsteps))
        return rems[-1]

    def fetch(steps):
        return float(jnp.sum(run(x, P, pi, key, nsteps=steps)))

    N1, N2 = 10, 60
    fetch(N1); fetch(N2)
    t = time.perf_counter(); fetch(N1); t1 = time.perf_counter() - t
    t = time.perf_counter(); fetch(N2); t2 = time.perf_counter() - t
    return max((t2 - t1) / (N2 - N1), 1e-9)


def main():
    ctx = make_context(0)
    pb = preprocess(ctx, parse_lp(random_set_cover_lp(200, 1000, 0.02, seed=41)))
    csts = make_merged_constraints(ctx, pb)
    n0 = len(pb.vars.values)
    cp = compile_problem(csts, n0)
    cost = np.pad(common.build_cost_vector(pb, n0), (0, cp.n - n0))
    cost_norm = jnp.asarray(
        common.normalize_costs(cost, ctx.parameters.cost_norm, np.random.default_rng(0)),
        jnp.float32,
    )
    R, B = 1024, 50
    base = time_variant(cp, cost_norm, R, B, ())
    print(f"full sweep              {base*1e3:8.3f} ms   ({R/base:,.0f} replica-sweeps/s)")
    for ab in ["select", "Sgather", "Supdate", "Pgather", "Pwrite", "xwrite", "viol"]:
        t = time_variant(cp, cost_norm, R, B, (ab,))
        print(f"without {ab:14s}  {t*1e3:8.3f} ms   (saves {(base-t)*1e3:7.3f} ms)")


if __name__ == "__main__":
    main()

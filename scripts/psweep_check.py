"""Smoke + invariant check + throughput for the Pallas sweep on TPU."""

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
from baryonyx_tpu.ops import psweep as pw
from baryonyx_tpu.ops.sweep import column_sums, sweep, violated_mask
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common


def main():
    interpret = "--interpret" in sys.argv
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
    R = 128 if interpret else 512
    print("supports:", pw.supports(cp, R, jnp.float32, 1), "m,n,Kr,Jb,Jt =",
          cp.m, cp.n, cp.Kr, cp.J_bot, cp.J_top)

    m, n = cp.m, cp.n
    key = jax.random.key(0)
    x = jax.random.bernoulli(key, 0.5, (n, R)).astype(jnp.int32)
    P = jax.random.normal(key, (m, cp.Kr, R), jnp.float32) * 0.01
    pi = jax.random.normal(key, (m, R), jnp.float32) * 0.01
    sched = violated_mask(cp, x)
    order = jnp.arange(m, dtype=jnp.int32)
    kappa = jnp.full((R,), 0.1, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)

    out = pw.psweep(
        cp, x, P, pi, cost_norm, sched, order, kappa,
        jnp.float32(0.01), jnp.float32(0.5), jax.random.key(1), amp,
        minimize=True, interpret=interpret,
    )
    x2, P2, pi2, S2, viol2, rem2 = out
    jax.block_until_ready(out)
    print("remaining before:", int(jnp.sum(sched.astype(jnp.int32))),
          "after:", int(jnp.sum(rem2)))

    # invariant 1: carried S consistent with exact recompute
    S_exact = column_sums(cp, P2, pi2)
    err = float(jnp.max(jnp.abs(S2 - S_exact)))
    scale = float(jnp.max(jnp.abs(S_exact))) + 1e-9
    print(f"S consistency: max abs err {err:.3e} (scale {scale:.3e})")
    assert err <= 1e-3 * (1 + scale), "carried S diverged from recompute"

    # invariant 2: unscheduled (row, lane) keep P and pi
    unsched = ~np.asarray(sched)
    dP = np.abs(np.asarray(P2 - P)).max(axis=1)  # [m, R]
    dpi_arr = np.abs(np.asarray(pi2 - pi))
    assert dP[unsched].max() == 0.0, "P changed on unscheduled rows"
    assert dpi_arr[unsched].max() == 0.0, "pi changed on unscheduled rows"
    print("unscheduled rows untouched: OK")

    # progress check: several sweeps drive remaining down
    st = (x, P * 0, pi * 0, None)
    xx, PP, pp = x, P * 0, pi * 0
    S = None
    kk = jax.random.key(2)
    for it in range(30):
        sched_i = violated_mask(cp, xx)
        kk, ks = jax.random.split(kk)
        xx, PP, pp, S, viol, rem = pw.psweep(
            cp, xx, PP, pp, cost_norm, sched_i, order,
            jnp.full((R,), min(0.05 + it * 0.02, 0.5), jnp.float32),
            jnp.float32(0.01), jnp.float32(0.5), ks, amp,
            S=S, S_fresh=jnp.asarray(it % 16 != 0),
            minimize=True, interpret=interpret,
        )
    nf = int(jnp.sum((rem == 0).astype(jnp.int32)))
    print(f"after 30 sweeps: {nf}/{R} replicas feasible, "
          f"mean remaining {float(jnp.mean(rem.astype(jnp.float32))):.2f}")
    assert nf > 0, "no replica reached feasibility in 30 sweeps"

    if interpret:
        print("interpret-mode checks passed")
        return

    # throughput (slope method)
    @functools.partial(jax.jit, static_argnames=("nsteps",))
    def run(x, P, pi, key, nsteps):
        def body(c, i):
            x, P, pi, S, key = c
            key, k = jax.random.split(key)
            sched = violated_mask(cp, x)
            x, P, pi, S, viol, rem = pw.psweep(
                cp, x, P, pi, cost_norm, sched, order, kappa,
                jnp.float32(0.01), jnp.float32(0.5), k, amp,
                S=S, S_fresh=(i % 16) != 0, minimize=True,
            )
            return (x, P, pi, S, key), rem
        S0 = jnp.zeros((n, R), jnp.float32)
        c, rems = jax.lax.scan(body, (x, P, pi, S0, key), jnp.arange(nsteps))
        return rems[-1]

    def fetch(steps):
        return float(jnp.sum(run(x, P, pi, key, nsteps=steps)))

    N1, N2 = 20, 120
    fetch(N1); fetch(N2)
    t = time.perf_counter(); fetch(N1); t1 = time.perf_counter() - t
    t = time.perf_counter(); fetch(N2); t2 = time.perf_counter() - t
    per = max((t2 - t1) / (N2 - N1), 1e-9)
    print(f"pallas sweep: {per*1e3:.3f} ms/sweep = {R/per:,.0f} replica-sweeps/s")


if __name__ == "__main__":
    main()

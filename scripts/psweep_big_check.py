"""Hardware check + head-to-head timing for the Pallas sweep in *big*
(HBM-streamed table) mode at benchmark-suite scale (scp 1000x10000 class).

Run from the repo root on a TPU backend:
    python scripts/psweep_big_check.py [--small]

--small shrinks to 300x3000 for a quicker smoke (still big-mode tables).
Prints invariant checks and ms/sweep for psweep vs the jnp sweep.
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
from baryonyx_tpu.ops import psweep as pw
from baryonyx_tpu.ops.sweep import column_sums, sweep, violated_mask
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common


def main():
    small = "--small" in sys.argv
    m0, n0v, dens = (300, 3000, 0.02) if small else (1000, 10000, 0.02)
    t0 = time.perf_counter()
    ctx = make_context(0)
    pb = preprocess(ctx, parse_lp(random_set_cover_lp(m0, n0v, dens, seed=11)))
    csts = make_merged_constraints(ctx, pb)
    n0 = len(pb.vars.values)
    cp = compile_problem(csts, n0)
    print(f"build: {time.perf_counter()-t0:.1f}s  m,n,Kr = {cp.m},{cp.n},{cp.Kr}")
    cost = np.pad(common.build_cost_vector(pb, n0), (0, cp.n - n0))
    cost_norm = jnp.asarray(
        common.normalize_costs(cost, ctx.parameters.cost_norm, np.random.default_rng(0)),
        jnp.float32,
    )
    R = 512
    kplan = pw.plan(cp, R, jnp.float32, 8)
    print("plan:", kplan)
    assert kplan is not None and kplan.big, "expected big-mode plan"

    m, n = cp.m, cp.n
    key = jax.random.key(0)
    # sparse init so a healthy fraction of cover rows start violated
    x = jax.random.bernoulli(key, 0.02, (n, R)).astype(jnp.int32)
    P = jax.random.normal(key, (m, cp.Kr, R), jnp.float32) * 0.01
    pi = jax.random.normal(key, (m, R), jnp.float32) * 0.01
    sched = violated_mask(cp, x)
    order = jnp.arange(m, dtype=jnp.int32)
    kappa = jnp.full((R,), 0.1, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)

    t0 = time.perf_counter()
    out = pw.psweep(
        cp, x, P, pi, cost_norm, sched, order, kappa,
        jnp.float32(0.01), jnp.float32(0.5), jax.random.key(1), amp,
        minimize=True,
    )
    x2, P2, pi2, S2, viol2, rem2 = out
    rem_after = int(jnp.sum(rem2))
    print(f"first call (compile+run): {time.perf_counter()-t0:.1f}s; "
          f"remaining before: {int(jnp.sum(sched.astype(jnp.int32)))}, "
          f"after: {rem_after}")

    # invariant 1: carried S consistent with exact recompute
    S_exact = column_sums(cp, P2, pi2)
    err = float(jnp.max(jnp.abs(S2 - S_exact)))
    scale = float(jnp.max(jnp.abs(S_exact))) + 1e-9
    print(f"S consistency: max abs err {err:.3e} (scale {scale:.3e})")
    assert err <= 1e-3 * (1 + scale), "carried S diverged from recompute"

    # invariant 2: unscheduled (row, lane) keep P and pi
    unsched = ~np.asarray(sched)
    dP = np.abs(np.asarray(P2 - P)).max(axis=1)
    dpi_arr = np.abs(np.asarray(pi2 - pi))
    assert dP[unsched].max() == 0.0, "P changed on unscheduled rows"
    assert dpi_arr[unsched].max() == 0.0, "pi changed on unscheduled rows"
    print("unscheduled rows untouched: OK")

    # progress: sweeps drive remaining down
    xx, PP, pp, S = x, P * 0, pi * 0, None
    kk = jax.random.key(2)
    for it in range(30):
        sched_i = violated_mask(cp, xx)
        kk, ks = jax.random.split(kk)
        xx, PP, pp, S, viol, rem = pw.psweep(
            cp, xx, PP, pp, cost_norm, sched_i, order,
            jnp.full((R,), min(0.05 + it * 0.02, 0.5), jnp.float32),
            jnp.float32(0.01), jnp.float32(0.5), ks, amp,
            S=S, S_fresh=jnp.asarray(it % 16 != 0), minimize=True,
        )
    nf = int(jnp.sum((rem == 0).astype(jnp.int32)))
    print(f"after 30 sweeps: {nf}/{R} replicas feasible, "
          f"mean remaining {float(jnp.mean(rem.astype(jnp.float32))):.2f}")
    assert nf > 0, "no replica reached feasibility in 30 sweeps"

    # head-to-head ms/sweep: psweep vs jnp sweep (slope method; the axon
    # tunnel makes block_until_ready a no-op, so time via scan length)
    def make_run(impl):
        @functools.partial(jax.jit, static_argnames=("nsteps",))
        def run(x, P, pi, key, nsteps):
            def body(c, i):
                x, P, pi, S, key = c
                key, k = jax.random.split(key)
                sched = violated_mask(cp, x)
                args = (cp, x, P, pi, cost_norm, sched, order, kappa,
                        jnp.float32(0.01), jnp.float32(0.5), k, amp)
                kw = dict(S=S, S_fresh=(i % 16) != 0, minimize=True)
                if impl == "pallas":
                    x, P, pi, S, viol, rem = pw.psweep(*args, **kw)
                else:
                    x, P, pi, S, viol, rem = sweep(*args, **kw)
                return (x, P, pi, S, key), rem
            S0 = jnp.zeros((n, R), jnp.float32)
            c, rems = jax.lax.scan(body, (x, P, pi, S0, key), jnp.arange(nsteps))
            return rems[-1]
        return run

    N1, N2 = 5, 25
    for impl in ("pallas", "jnp"):
        run = make_run(impl)
        def fetch(steps):
            return float(jnp.sum(run(x, P, pi, key, nsteps=steps)))
        fetch(N1); fetch(N2)
        t = time.perf_counter(); fetch(N1); t1 = time.perf_counter() - t
        t = time.perf_counter(); fetch(N2); t2 = time.perf_counter() - t
        per = max((t2 - t1) / (N2 - N1), 1e-9)
        print(f"{impl:7s}: {per*1e3:8.3f} ms/sweep = {R/per:,.0f} replica-sweeps/s")


if __name__ == "__main__":
    main()

"""Per-path throughput tracking (VERDICT r4 weak 8): one sweep-rate
measurement per kernel regime, so regressions outside the headline
scp200x1000 metric are visible round over round.

Paths measured on the real chip:
  - big-table: scpnrh-class 1000x10000 (Kr ~ 576 Pallas, or jnp if
    unsupported) — the large-suite regime from the r5 battery
  - quad: qsap500x10 (n = 5000, dense CQ matmul path)
  - (Z is covered by scripts/zbench.py -> ZBENCH_r05.json)

Writes MULTIBENCH_r05.json; bench.py attaches it to its JSON line.

Usage: python scripts/multibench.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sweep_rate(lp_text: str, R_pref=(2048, 1024, 512), B=8):
    """Replica-sweeps/s of the full sweep (all rows scheduled) on the
    default backend, via the two-scan-length slope (the axon tunnel's
    block_until_ready is a no-op; only a fetch synchronizes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from baryonyx_tpu.core.context import make_context
    from baryonyx_tpu.io.lp_parse import parse_lp
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.ops.sweep import sweep, violated_mask
    from baryonyx_tpu.ops.zsweep import z_sweep
    from baryonyx_tpu.preprocess import unpreprocess
    from baryonyx_tpu.preprocess.merge import make_merged_constraints
    from baryonyx_tpu.solver import common

    ctx = make_context(0)
    pb = unpreprocess(ctx, parse_lp(lp_text))
    csts = make_merged_constraints(ctx, pb)
    n0 = len(pb.vars.values)
    cp = compile_problem(csts, n0, qelements=pb.objective.qelements)
    rng = np.random.default_rng(0)
    cost = np.pad(common.build_cost_vector(pb, n0), (0, cp.n - n0))
    quad_mat = None
    if cp.has_quad:
        cn_np, q_norm = common.normalize_costs_quad(
            cost, np.asarray(cp.quad_fac, np.float64),
            ctx.parameters.cost_norm, rng,
        )
        quad_fac = jnp.asarray(q_norm, jnp.float32)
        if cp.n <= 8192:
            # dense neighbor matrix for the fused kernel's CQ matmul
            # (mirrors solver/optimize.py's construction)
            qm_np = np.asarray(cp.quad_mask)
            qv_np = np.asarray(cp.quad_var)
            qf_np = np.asarray(q_norm, np.float64)
            dq = np.zeros((cp.n, cp.n))
            jj = np.repeat(np.arange(cp.n), qm_np.shape[1]).reshape(qm_np.shape)
            np.add.at(dq, (jj[qm_np], qv_np[qm_np]), qf_np[qm_np])
            quad_mat = jnp.asarray(dq, jnp.float32)
    else:
        cn_np = common.normalize_costs(cost, ctx.parameters.cost_norm, rng)
        quad_fac = None
    cn = jnp.asarray(cn_np, jnp.float32)

    R, Bc, use_pallas = 512, B, False
    if not cp.has_z:
        for cand_R in R_pref:
            for cand_B in (4, 8):
                if pw.supports(cp, cand_R, jnp.float32, cand_B):
                    R, Bc, use_pallas = cand_R, cand_B, bool(pw.enabled_mode())
                    break
            if use_pallas:
                break
    m = cp.m
    mp = ((m + Bc - 1) // Bc) * Bc
    order = jnp.concatenate(
        [jnp.arange(m, dtype=jnp.int32), jnp.full((mp - m,), m, jnp.int32)]
    )
    key = jax.random.key(0)
    x = jax.random.bernoulli(key, 0.5, (cp.n, R)).astype(jnp.int32)
    P = jnp.zeros((m, cp.Kr, R), jnp.float32)
    pi = jnp.zeros((m, R), jnp.float32)
    sched0 = jnp.ones((m, R), bool)
    S0 = jnp.zeros((cp.n, R), jnp.float32)

    @jax.jit
    def run(x, P, pi, key, nsteps):
        def cond(c):
            return c[-1] < nsteps

        def body(c):
            x, P, pi, S, key, acc, i = c
            key, k = jax.random.split(key)
            kap = jnp.full((R,), 0.1, jnp.float32)
            amp = jnp.zeros((R,), jnp.float32)
            if cp.has_z:
                x, P, pi, viol, rem = z_sweep(
                    cp, x, P, pi, cn, sched0, order, kap,
                    jnp.float32(0.01), jnp.float32(0.5), k, amp,
                    minimize=True, block_size=Bc, quad_fac=quad_fac,
                )
                S = S
            elif use_pallas:
                x, P, pi, S, viol, rem = pw.psweep(
                    cp, x, P, pi, cn, sched0, order, kap,
                    jnp.float32(0.01), jnp.float32(0.5), k, amp,
                    S=S, S_fresh=(i % 16) != 0, minimize=True,
                    quad_fac=quad_fac, quad_mat=quad_mat,
                )
            else:
                x, P, pi, S, viol, rem = sweep(
                    cp, x, P, pi, cn, sched0, order, kap,
                    jnp.float32(0.01), jnp.float32(0.5), k, amp,
                    None, True, Bc, False, quad_fac, S, (i % 16) != 0,
                )
            return (x, P, pi, S, key, acc + jnp.sum(rem), i + 1)

        c = jax.lax.while_loop(
            cond, body,
            (x, P, pi, S0, key, jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32)),
        )
        return c[-2]

    def fetch(nsteps):
        t0 = time.perf_counter()
        float(run(x, P, pi, key, jnp.asarray(nsteps, jnp.int32)))
        return time.perf_counter() - t0

    fetch(4)
    N1, N2 = 10, 60
    fetch(N1)
    t1 = fetch(N1)
    t2 = fetch(N2)
    rate = (N2 - N1) / max(t2 - t1, 1e-9)
    return {
        "replica_sweeps_per_s": round(rate * R, 1),
        "R": R,
        "kernel": ("z-jnp" if cp.has_z
                   else ("pallas" if use_pallas else "jnp")),
        "m": cp.m, "n": cp.n, "Kr": cp.Kr,
    }


def main():
    from baryonyx_tpu import runtime
    from baryonyx_tpu.generators import random_qsap_lp, random_set_cover_lp

    runtime.setup_cache()
    out = {}
    print("== big-table scpnrh1000x10000 ==", flush=True)
    out["big_scpnrh1000x10000"] = sweep_rate(
        random_set_cover_lp(1000, 10000, 0.05, seed=2)
    )
    print(json.dumps(out["big_scpnrh1000x10000"]), flush=True)
    print("== quad qsap500x10 ==", flush=True)
    out["quad_qsap500x10"] = sweep_rate(random_qsap_lp(500, 10, seed=3))
    print(json.dumps(out["quad_qsap500x10"]), flush=True)
    with open(os.path.join(REPO, "MULTIBENCH_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Z-class throughput head-to-head (VERDICT r4 item 4): our jnp z_sweep
on one TPU chip vs the reference's dedicated Z solver
(lib/src/itm-solver-inequalities-Z.cpp) on all host CPUs.

Protocol (mirrors scripts/head_to_head.py's treadmill): both solvers run
the contradiction_z treadmill (coefficient-2 conflicting rows — never
feasible, ~50% sustained violation) in solve mode with kappa-step:0.
  - reference: BX_SWEEP_COUNT shim counts processed rows; rate from the
    slope between two loop limits; scaled to all CPUs; divided by m for
    full-sweep-equivalents/s.
  - ours: z_sweep over all rows, R replica lanes, slope between two scan
    lengths through the axon tunnel (fetch synchronizes, not
    block_until_ready) -> replica-sweeps/s.

Writes ZBENCH_r05.json; bench.py attaches it to its JSON line.

Usage: python scripts/zbench.py
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_BIN = "/tmp/bxref/build/app/baryonyx-0.5"
GROUPS, GS = 50, 20  # 1000 vars, 100 Z rows


def ref_rate(lp: str):
    env = dict(os.environ, BX_SWEEP_COUNT="1")

    def run(limit):
        t0 = time.perf_counter()
        r = subprocess.run(
            [REF_BIN, "-p", "kappa-step:0", "-p", f"limit:{limit}", lp],
            capture_output=True, text=True, timeout=600, env=env,
            cwd="/tmp",
        )
        wall = time.perf_counter() - t0
        m = re.search(r"BX_SWEEPS (\d+) BX_ROWS (\d+)", r.stdout + r.stderr)
        return wall, (int(m.group(2)) if m else 0)

    run(300)  # warm
    w1, r1 = run(2000)
    w2, r2 = run(12000)
    rows_per_s = (r2 - r1) / max(w2 - w1, 1e-9)
    return rows_per_s


def main():
    from baryonyx_tpu.generators import contradiction_z_lp
    from baryonyx_tpu.io.lp_parse import parse_lp

    os.makedirs("/tmp/zbench", exist_ok=True)
    lp_text = contradiction_z_lp(GROUPS, GS, seed=7)
    lp = "/tmp/zbench/zcontra.lp"
    with open(lp, "w") as fh:
        fh.write(lp_text)

    out = {"instance": f"contradiction_z({GROUPS}x{GS})"}

    if os.path.exists(REF_BIN):
        rows_per_s = ref_rate(lp)
        ncpu = os.cpu_count()
        pb = parse_lp(lp_text)
        m = pb.n_constraints
        out["ref_rows_per_s_1t"] = round(rows_per_s, 1)
        out["ref_sweeps_per_s_allcpu"] = round(rows_per_s * ncpu / m, 1)
        print(json.dumps({k: out[k] for k in out}), flush=True)

    # ours: TPU z_sweep treadmill
    import jax
    import jax.numpy as jnp
    import numpy as np

    from baryonyx_tpu import runtime
    from baryonyx_tpu.core.context import make_context
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.ops.zsweep import z_sweep
    from baryonyx_tpu.preprocess import unpreprocess
    from baryonyx_tpu.preprocess.merge import make_merged_constraints
    from baryonyx_tpu.solver import common

    runtime.setup_cache()
    ctx = make_context(0)
    pb = unpreprocess(ctx, parse_lp(lp_text))
    csts = make_merged_constraints(ctx, pb)
    n = len(pb.vars.values)
    cp = compile_problem(csts, n)
    assert cp.has_z
    rng = np.random.default_rng(0)
    cost = np.pad(common.build_cost_vector(pb, n), (0, cp.n - n))
    cn = jnp.asarray(common.normalize_costs(cost, ctx.parameters.cost_norm, rng),
                     jnp.float32)
    R = 512
    B = 8
    m = cp.m
    mp = ((m + B - 1) // B) * B
    order = jnp.concatenate(
        [jnp.arange(m, dtype=jnp.int32), jnp.full((mp - m,), m, jnp.int32)]
    )
    key = jax.random.key(0)
    x = jax.random.bernoulli(key, 0.5, (cp.n, R)).astype(jnp.int32)
    P = jnp.zeros((m, cp.Kr, R), jnp.float32)
    pi = jnp.zeros((m, R), jnp.float32)
    sched = jnp.ones((m, R), bool)

    @jax.jit
    def run(x, P, pi, key, nsteps):
        def cond(c):
            return c[-1] < nsteps

        def body(c):
            x, P, pi, key, acc, i = c
            key, k = jax.random.split(key)
            kap = jnp.full((R,), 0.1, jnp.float32)
            amp = jnp.zeros((R,), jnp.float32)
            x, P, pi, viol, rem = z_sweep(
                cp, x, P, pi, cn, sched, order, kap,
                jnp.float32(0.01), jnp.float32(0.5), k, amp,
                minimize=True, block_size=B,
            )
            return (x, P, pi, key, acc + jnp.sum(rem), i + 1)

        c = jax.lax.while_loop(
            cond, body,
            (x, P, pi, key, jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32)),
        )
        return c[4]

    def fetch(nsteps):
        t0 = time.perf_counter()
        v = float(run(x, P, pi, key, jnp.asarray(nsteps, jnp.int32)))
        return time.perf_counter() - t0, v

    fetch(4)  # compile + warm
    N1, N2 = 20, 120
    t1, _ = fetch(N1)
    t1, _ = fetch(N1)
    t2, _ = fetch(N2)
    sweeps_per_s = (N2 - N1) / max(t2 - t1, 1e-9)
    out["ours_replica_sweeps_per_s"] = round(sweeps_per_s * R, 1)
    out["R"] = R
    if "ref_sweeps_per_s_allcpu" in out:
        out["vs_baseline"] = round(
            out["ours_replica_sweeps_per_s"] / out["ref_sweeps_per_s_allcpu"], 2
        )
    with open(os.path.join(REPO, "ZBENCH_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

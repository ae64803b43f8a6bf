"""Benchmark: batched-optimizer sweep throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json north star: "solver iterations/s/chip"):
replica-sweeps per second of the optimize-mode evolution step on an
scp41-sized set-covering instance (200 constraints x 1000 variables —
reference: benchmarks/scp.csv line scp41), R replicas on one chip.

vs_baseline divides by the reference C++ solver's measured sweep rate on
this instance class, produced by scripts/head_to_head.py: the reference
is built from /root/reference (scripts/build_reference.sh, with an
atomic rows-updated counter compiled into its sweep loop), run on the
contradiction_cover treadmill to measure sustained element-updates/s,
and converted to scp200x1000-equivalent full sweeps/s across all host
CPUs. The measured value is read from H2H.json when present; the
fallback constant is the round-3 measured value (which came out within
1.3% of round 1's instrumented estimate).
"""

import json
import os
import time

import numpy as np

# Round-3 head-to-head measurement (H2H.json overrides when present).
BASELINE_SWEEPS_PER_S = 22_284.0


def _baseline() -> float:
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "H2H.json")
    try:
        with open(p) as fh:
            return float(json.load(fh)["baseline_scp200x1000_sweeps_per_s"])
    except (OSError, KeyError, ValueError):
        return BASELINE_SWEEPS_PER_S


def main() -> None:
    import jax
    import jax.numpy as jnp

    from baryonyx_tpu.core.context import make_context
    from baryonyx_tpu.generators import random_set_cover_lp
    from baryonyx_tpu.io.lp_parse import parse_lp
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.ops.sweep import sweep, violated_mask
    from baryonyx_tpu.preprocess.fixing import preprocess
    from baryonyx_tpu.preprocess.merge import make_merged_constraints
    from baryonyx_tpu.solver import common

    ctx = make_context(0)
    pb = preprocess(ctx, parse_lp(random_set_cover_lp(200, 1000, 0.02, seed=41)))
    csts = make_merged_constraints(ctx, pb)
    n = len(pb.vars.values)
    cp = compile_problem(csts, n)
    cost = np.pad(common.build_cost_vector(pb, n), (0, cp.n - n))
    cost_norm = jnp.asarray(
        common.normalize_costs(cost, ctx.parameters.cost_norm, np.random.default_rng(0)),
        jnp.float32,
    )
    n = cp.n  # bucketed size; padded vars cost 0 and join no row

    # replica batch: largest (R, block) pair the fused Pallas kernel
    # supports on this instance (ops/psweep.py VMEM budget; the same
    # preference order optimize mode uses); jnp fallback otherwise
    from baryonyx_tpu.ops import psweep as _pw

    B = 8
    R = 512
    for cand_R, cand_B in ((2048, 4), (1024, 4), (1024, 8), (512, 8), (256, 8)):
        if _pw.supports(cp, cand_R, jnp.float32, cand_B):
            R, B = cand_R, cand_B
            break
    m = cp.m
    mp = ((m + B - 1) // B) * B
    order = jnp.concatenate(
        [jnp.arange(m, dtype=jnp.int32), jnp.full((mp - m,), m, jnp.int32)]
    )
    key = jax.random.key(0)
    x = jax.random.bernoulli(key, 0.5, (n, R)).astype(jnp.int32)
    P = jnp.zeros((m, cp.Kr, R), jnp.float32)
    pi = jnp.zeros((m, R), jnp.float32)

    S0 = jnp.zeros((cp.n, R), jnp.float32)

    pw = _pw
    pmode = pw.enabled_mode()
    use_pallas = bool(pmode) and pw.supports(cp, R, jnp.float32, B)

    # dynamic trip count: ONE compiled executable serves both scan lengths
    # (a static-length scan would compile twice; the G=8 kernel costs
    # minutes to compile through the tunnel)
    @jax.jit
    def run(x, P, pi, key, nsteps):
        def cond(c):
            return c[-1] < nsteps

        def body(c):
            # the violated mask is carried from the previous sweep's
            # return, exactly as the optimize driver carries rs.viol —
            # no per-step recompute
            x, P, pi, S, sched, key, rem_acc, i = c
            key, k = jax.random.split(key)
            kap = jnp.full((R,), 0.1, jnp.float32)
            amp = jnp.zeros((R,), jnp.float32)
            if use_pallas:
                x, P, pi, S, viol, rem = pw.psweep(
                    cp, x, P, pi, cost_norm, sched, order, kap,
                    jnp.float32(0.01), jnp.float32(0.5), k, amp,
                    S=S, S_fresh=(i % 16) != 0, minimize=True,
                )
            else:
                x, P, pi, S, viol, rem = sweep(
                    cp, x, P, pi, cost_norm, sched, order, kap,
                    jnp.float32(0.01), jnp.float32(0.5), k, amp,
                    None, True, B, False, None, S, (i % 16) != 0,
                )
            return (x, P, pi, S, viol, key, jnp.sum(rem), i + 1)

        c = jax.lax.while_loop(
            cond,
            body,
            (x, P, pi, S0, violated_mask(cp, x), key,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
        )
        return c[0], c[-2]

    # NOTE: on this image's axon TPU tunnel, block_until_ready does not
    # actually block — only a value fetch synchronizes. Timing therefore
    # fetches a reduction and uses the slope between two scan lengths to
    # cancel the fixed fetch/dispatch latency.
    def fetch(o) -> float:
        return float(jnp.sum(o[1]))

    N1, N2 = 20, 120
    n1 = jnp.asarray(N1, jnp.int32)
    n2 = jnp.asarray(N2, jnp.int32)
    fetch(run(x, P, pi, key, n1))
    fetch(run(x, P, pi, key, n2))

    t = time.perf_counter()
    fetch(run(x, P, pi, key, n1))
    t1 = time.perf_counter() - t
    t = time.perf_counter()
    fetch(run(x, P, pi, key, n2))
    t2 = time.perf_counter() - t

    per_sweep = max((t2 - t1) / (N2 - N1), 1e-9)
    sweeps_per_s = R / per_sweep
    line = {
        "metric": "optimize_replica_sweeps_per_s_scp200x1000",
        "value": round(sweeps_per_s, 1),
        "unit": "replica-sweeps/s/chip",
        "vs_baseline": round(sweeps_per_s / _baseline(), 3),
    }
    # per-path metrics (VERDICT r4 weak 8): the committed same-round
    # artifacts from scripts/zbench.py and scripts/multibench.py ride
    # along in the single JSON line so Z / big-table / quadratic
    # throughput is tracked per round alongside the headline
    here = os.path.dirname(os.path.abspath(__file__))
    for key_, fname in (("z", "ZBENCH_r05.json"),
                        ("paths", "MULTIBENCH_r05.json")):
        try:
            with open(os.path.join(here, fname)) as fh:
                line[key_] = json.load(fh)
        except (OSError, ValueError):
            pass
    print(json.dumps(line))


if __name__ == "__main__":
    main()

"""Diagnose the small4 (QAP eq-101) feasibility plateau.

Runs solve-mode sweeps on small4 and reports, per phase of the run,
the violated-row count and WHICH row families stay violated (the 8
assignment rows sum x = 1 vs the 128 y/x linking rows), plus how close
the best replica gets in optimize mode.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import baryonyx_tpu as bx
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.ops.layout import compile_problem
from baryonyx_tpu.ops.sweep import sweep, violated_mask
from baryonyx_tpu.solver import common


def main():
    ctx = bx.make_context(0)
    p = ctx.parameters
    p.theta, p.delta, p.kappa_step, p.kappa_max = 0.5, 0.2, 1e-3, 10.0
    p.alpha, p.w = 0.0, 20
    pb = preprocess(ctx, bx.parse_lp(open("/root/reference/lib/test/small4.lp").read()))
    csts = make_merged_constraints(ctx, pb)
    n0 = len(pb.vars.values)
    cp = compile_problem(csts, n0)
    cost = np.pad(common.build_cost_vector(pb, n0), (0, cp.n - n0))
    cn = jnp.asarray(
        common.normalize_costs(cost, p.cost_norm, np.random.default_rng(0)),
        jnp.float32,
    )
    # row families: assignment rows have no negative factor (exclude padding)
    real = np.asarray(cp.r_size > 0)
    neg = np.asarray(cp.row_factor.min(axis=1) < 0)
    print(f"m={cp.m} n={cp.n} assignment_rows={np.sum(~neg & real)} linking={np.sum(neg)}")

    R = 64
    B = 8
    m, n, Kr = cp.m, cp.n, cp.Kr
    mp = ((m + B - 1) // B) * B
    order = jnp.concatenate(
        [jnp.arange(m, dtype=jnp.int32), jnp.full((mp - m,), m, jnp.int32)]
    )
    key = jax.random.key(7)
    x = jax.random.bernoulli(key, 0.5, (n, R)).astype(jnp.int32)
    x = x.at[:, : R // 4].set(0)  # zero-start quarter
    P = jnp.zeros((m, Kr, R), jnp.float32)
    pi = jnp.zeros((m, R), jnp.float32)
    kappa = jnp.full((R,), p.kappa_min, jnp.float32)
    delta = jnp.float32(p.delta)
    theta = jnp.float32(p.theta)

    step = jax.jit(
        lambda x, P, pi, k, s: sweep(
            cp, x, P, pi, cn, violated_mask(cp, x), order,
            kappa=k, delta=delta, theta=theta, key=s,
            obj_amp=jnp.zeros((R,), jnp.float32),
            minimize=True, block_size=B,
        )
    )
    t0 = time.monotonic()
    best = np.full(R, m + 1)
    for it in range(3000):
        x, P, pi = step(x, P, pi, kappa, jax.random.fold_in(key, it))[:3]
        if it >= p.w:
            viol = np.asarray(violated_mask(cp, x))
            rem = viol.sum(axis=0)
            best = np.minimum(best, rem)
            kappa = jnp.minimum(
                kappa + p.kappa_step * (rem.astype(np.float32) / m) ** 0.0 * (rem > 0),
                10.0,
            )
        if it % 500 == 499:
            viol = np.asarray(violated_mask(cp, x))
            rem = viol.sum(axis=0)
            r0 = int(np.argmin(rem))
            fam_a = int(viol[~neg & real, r0].sum())
            fam_l = int(viol[neg, r0].sum())
            print(
                f"it={it+1:5d} best_now={rem.min()}/{int(np.median(rem))} "
                f"best_ever={best.min()} replica0: assign={fam_a} link={fam_l} "
                f"kappa={float(kappa[r0]):.3f} t={time.monotonic()-t0:.0f}s",
                flush=True,
            )
        if best.min() == 0:
            print(f"FEASIBLE at sweep {it}")
            break


if __name__ == "__main__":
    main()

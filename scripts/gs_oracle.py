"""Pure-numpy Gauss-Seidel oracle of the reference eq-01 inner loop.

Mirrors solver_equalities_01coeff + compute_order(none) + solver_functor's
kappa annealing exactly (reference: itm-solver-equalities-01.cpp:30-271,
itm-common.hpp:382-467,627-915, itm-solver-common.hpp:43-262) to measure
loops-to-feasibility independently of the JAX kernel. Diagnostic only.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import baryonyx_tpu as bx
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common


def run(path, seed=2, kappa_min=0.0, kappa_step=1e-3, kappa_max=0.6,
        theta=0.5, alpha=1.0, limit=5000, w=250):
    with open(path) as fh:
        pb = bx.parse_lp(fh.read())
    ctx = bx.make_context(0)
    csts = make_merged_constraints(ctx, pb)
    n = len(pb.vars.values)
    m = len(csts)
    rng = np.random.default_rng(seed)

    c = common.build_cost_vector(pb, n)
    cn = common.normalize_costs(c, ctx.parameters.cost_norm, rng)
    delta = common.compute_delta(cn, theta)

    rows = [
        [(el.variable_index, el.factor) for el in cst.elements] for cst in csts
    ]
    bmin = np.array([c_.min for c_ in csts])
    bmax = np.array([c_.max for c_ in csts])
    assert np.all(bmin == bmax), "oracle handles equalities only"

    # per-element P, keyed (row, slot)
    P = [np.zeros(len(r)) for r in rows]
    pi = np.zeros(m)
    x = np.zeros(n, np.int8)

    # column view: var j -> list of (row, slot)
    cols = [[] for _ in range(n)]
    for k, r in enumerate(rows):
        for s, (j, a) in enumerate(r):
            cols[j].append((k, s))

    def violated():
        out = []
        for k, r in enumerate(rows):
            s = sum(a * x[j] for j, a in r)
            if not (bmin[k] <= s <= bmax[k]):
                out.append(k)
        return out

    kappa = kappa_min
    R_list = violated()
    t0 = time.time()
    for i in range(limit):
        for k in R_list:
            r = rows[k]
            P[k] *= theta
            rc = []
            for s, (j, a) in enumerate(r):
                acc = 0.0
                for (k2, s2) in cols[j]:
                    acc += pi[k2] + P[k2][s2]
                rc.append(cn[j] - acc)
            rc = np.asarray(rc)
            order = np.argsort(rc + rng.uniform(-1e-12, 1e-12, len(rc)), kind="stable")
            bk = int(bmin[k])
            selected = min(bk, len(rc)) - 1
            if selected < 0:
                d = delta + (kappa / (1 - kappa)) * (rc[order[0]] / 2)
                for s, (j, a) in enumerate(r):
                    x[j] = 0
                    P[k][s] -= d
            elif selected + 1 >= len(rc):
                d = delta + (kappa / (1 - kappa)) * (rc[order[selected]] * 1.5)
                for s, (j, a) in enumerate(r):
                    x[j] = 1
                    P[k][s] += d
            else:
                pi[k] += (rc[order[selected]] + rc[order[selected + 1]]) / 2
                d = delta + (kappa / (1 - kappa)) * (
                    rc[order[selected + 1]] - rc[order[selected]]
                )
                chosen = set(order[: selected + 1].tolist())
                for s, (j, a) in enumerate(r):
                    if s in chosen:
                        x[j] = 1
                        P[k][s] += d
                    else:
                        x[j] = 0
                        P[k][s] -= d
        R_list = violated()
        if not R_list:
            print(f"feasible at loop {i} ({time.time()-t0:.1f}s) "
                  f"value={float(c @ x) + pb.objective.value}")
            return i
        if i > w:
            kappa += kappa_step * (len(R_list) / m) ** alpha
        if kappa > kappa_max:
            print(f"kappa_max at loop {i}, remaining {len(R_list)}")
            return -1
    print(f"limit reached, remaining {len(R_list)}")
    return -1


if __name__ == "__main__":
    for seed in (1, 2, 3):
        run("/tmp/spp100.lp", seed=seed, kappa_min=float(sys.argv[1]) if len(sys.argv) > 1 else 0.0)

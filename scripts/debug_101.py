"""Minimal repro: QAP-style linking structure (x assignment + y linking
rows with a -x coefficient). The reference solves these; watch our sweep
dynamics per iteration on CPU."""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.ops.layout import compile_problem
from baryonyx_tpu.ops.sweep import sweep, violated_mask
from baryonyx_tpu.preprocess.fixing import preprocess, unpreprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common

LP = """minimize
 obj: 5 y#0#0 + 2 y#0#1 + 3 y#1#0 + 7 y#1#1
subject to
 a0: x#0 + x#1 = 1
 l0: y#0#0 + y#0#1 - x#0 = 0
 l1: y#1#0 + y#1#1 - x#1 = 0
binary
 x#0
 x#1
 y#0#0
 y#0#1
 y#1#0
 y#1#1
end
"""


def main():
    ctx = make_context(0)
    raw = parse_lp(LP)
    pb = preprocess(ctx, raw)
    print("after preprocess: vars", len(pb.vars.values), pb.vars.names)
    print("affected:", list(zip(pb.affected_vars.names, pb.affected_vars.values)))
    csts = make_merged_constraints(ctx, pb)
    for c in csts:
        print("cst", c.id, [(e.variable_index, e.factor) for e in c.elements],
              c.min, c.max)
    n = len(pb.vars.values)
    if not csts:
        print("fully preprocessed away")
        return
    cp = compile_problem(csts, n)
    print("m,n,Kr:", cp.m, cp.n, cp.Kr, "J:", cp.J_bot, cp.J_top,
          "red-ok:", cp.sel_reduction_ok)
    cost = np.pad(common.build_cost_vector(pb, n), (0, cp.n - n))
    cn = jnp.asarray(
        common.normalize_costs(cost, ctx.parameters.cost_norm,
                               np.random.default_rng(0)), jnp.float32)

    R = 1
    x = jnp.zeros((cp.n, R), jnp.int32)
    P = jnp.zeros((cp.m, cp.Kr, R), jnp.float32)
    pi = jnp.zeros((cp.m, R), jnp.float32)
    order = jnp.arange(cp.m, dtype=jnp.int32)
    key = jax.random.key(3)
    kappa = jnp.full((R,), 0.1, jnp.float32)
    names = list(pb.vars.names) + [f"pad{i}" for i in range(cp.n - n)]
    for it in range(12):
        viol = violated_mask(cp, x)
        key, ks = jax.random.split(key)
        x, P, pi, S, nv, rem = sweep(
            cp, x, P, pi, cn, viol, order, kappa, jnp.float32(0.2),
            jnp.float32(0.5), ks, jnp.zeros((R,), jnp.float32),
            None, True, 8,
        )
        kappa = kappa + 0.02
        sel = [names[i] for i in range(n) if int(x[i, 0])]
        print(f"it {it}: rem={int(rem[0])} x={{{', '.join(sel)}}} "
              f"pi={np.asarray(pi[:cp.m, 0])[:4].round(3)}")


if __name__ == "__main__":
    main()

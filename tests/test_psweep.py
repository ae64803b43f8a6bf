"""Pallas sweep kernel invariants (TPU only — the kernel uses TPU Mosaic
primitives with no CPU interpreter; CPU CI covers the identical contract
through ops/sweep.py, and scripts/psweep_check.py runs this same battery
plus throughput on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.ops.layout import compile_problem
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common

tpu_only = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pallas kernel has no CPU path (jnp sweep covers the contract)",
)


@tpu_only
def test_psweep_invariants():
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.ops.sweep import column_sums, violated_mask

    ctx = make_context(0)
    pb = preprocess(ctx, parse_lp(random_set_cover_lp(60, 300, 0.05, seed=3)))
    csts = make_merged_constraints(ctx, pb)
    n0 = len(pb.vars.values)
    cp = compile_problem(csts, n0)
    cost = np.pad(common.build_cost_vector(pb, n0), (0, cp.n - n0))
    cost_norm = jnp.asarray(
        common.normalize_costs(
            cost, ctx.parameters.cost_norm, np.random.default_rng(0)
        ),
        jnp.float32,
    )
    R = 512  # supports() requires >= 4 full lanes of replicas
    assert pw.supports(cp, R, jnp.float32, 1)

    m, n = cp.m, cp.n
    key = jax.random.key(0)
    x = jax.random.bernoulli(key, 0.2, (n, R)).astype(jnp.int32)
    P = jax.random.normal(key, (m, cp.Kr, R), jnp.float32) * 0.01
    pi = jax.random.normal(key, (m, R), jnp.float32) * 0.01
    sched = violated_mask(cp, x)
    order = jnp.arange(m, dtype=jnp.int32)

    x2, P2, pi2, S2, viol2, rem2 = pw.psweep(
        cp, x, P, pi, cost_norm, sched, order,
        jnp.full((R,), 0.1, jnp.float32), jnp.float32(0.01),
        jnp.float32(0.5), jax.random.key(1), jnp.zeros((R,), jnp.float32),
        minimize=True,
    )

    # carried S must equal the exact recompute from the returned P, pi
    S_exact = column_sums(cp, P2, pi2)
    err = float(jnp.max(jnp.abs(S2 - S_exact)))
    scale = float(jnp.max(jnp.abs(S_exact))) + 1e-9
    assert err <= 1e-3 * (1 + scale)

    # unscheduled (row, lane) pairs keep P and pi bitwise
    unsched = ~np.asarray(sched)
    assert np.abs(np.asarray(P2 - P)).max(axis=1)[unsched].max() == 0.0
    assert np.abs(np.asarray(pi2 - pi))[unsched].max() == 0.0

    # a handful of annealed sweeps reaches feasibility on this easy SCP
    xx, PP, pp, S = x, P * 0, pi * 0, None
    kk = jax.random.key(2)
    for it in range(30):
        kk, ks = jax.random.split(kk)
        xx, PP, pp, S, viol, rem = pw.psweep(
            cp, xx, PP, pp, cost_norm, violated_mask(cp, xx), order,
            jnp.full((R,), min(0.05 + it * 0.02, 0.5), jnp.float32),
            jnp.float32(0.01), jnp.float32(0.5), ks,
            jnp.zeros((R,), jnp.float32),
            S=S, S_fresh=jnp.asarray(it % 16 != 0), minimize=True,
        )
    assert int(jnp.sum((rem == 0).astype(jnp.int32))) > 0

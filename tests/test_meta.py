"""Meta-optimizer and checkpoint tests (reference: manual/nlopt/branch
optimizers, lib/src/*-optimizer.cpp; branch smoke modeled on
lib/test/optimize.cpp:40-53)."""

import numpy as np
import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.validate import is_valid_solution


def make_ctx(**kw):
    ctx = bx.make_context(0)
    ctx.parameters.seed = 42
    ctx.parameters.time_limit = 0.5
    ctx.parameters.limit = 50
    ctx.parameters.thread = 4
    ctx.parameters.init_population_size = 8
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    return ctx


PB = bx.parse_lp(random_set_cover_lp(10, 30, 0.2, seed=21))


def test_branch_mode_smoke():
    ctx = make_ctx(mode=bx.ModeType.branch)
    r = bx.optimize(ctx, PB)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(PB, r)


def test_nelder_mead_runs(monkeypatch):
    import baryonyx_tpu.solver.meta as meta

    monkeypatch.setattr(meta, "NM_BUDGET_EVALS", 7)
    ctx = make_ctx(mode=bx.ModeType.nlopt)
    r = bx.optimize(ctx, PB)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(PB, r)


def test_manual_grid_small():
    import baryonyx_tpu.solver.meta as meta

    ctx = make_ctx()
    r = meta.manual_optimize(ctx, PB, grid_len=1)
    assert r.status == bx.ResultStatus.success
    assert is_valid_solution(PB, r)


def test_checkpoint_roundtrip(tmp_path):
    from baryonyx_tpu.checkpoint import load_population, save_population
    from baryonyx_tpu.solver.population import Population
    import jax.numpy as jnp

    pop = Population(
        x=jnp.asarray(np.random.randint(0, 2, (5, 7)), jnp.int32),
        value=jnp.asarray(np.arange(5.0), jnp.float32),
        remaining=jnp.zeros(5, jnp.int32),
        hash=jnp.asarray(np.arange(5), jnp.uint32),
    )
    path = str(tmp_path / "pop.npz")
    save_population(path, pop)
    back = load_population(path)
    assert np.array_equal(np.asarray(back.x), np.asarray(pop.x))
    assert np.array_equal(np.asarray(back.value), np.asarray(pop.value))


def test_optimize_resumes_from_checkpoint(tmp_path):
    path = str(tmp_path / "pop.npz")
    ctx = make_ctx(checkpoint_path=path, checkpoint_every=0.0)
    r1 = bx.optimize(ctx, PB)
    assert r1.status == bx.ResultStatus.success
    import os

    assert os.path.exists(path)

    # resume: population loads and the run still produces a valid result
    ctx2 = make_ctx(checkpoint_path=path, checkpoint_every=1000.0)
    r2 = bx.optimize(ctx2, PB)
    assert is_valid_solution(PB, r2)
    # the resumed run can only match or improve the incumbent
    assert r2.solutions[-1].value <= r1.solutions[-1].value

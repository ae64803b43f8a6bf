"""Attribute the evolve step's non-kernel overhead by monkeypatching
components to no-ops: population insert, order construction, reinit
machinery (via kappa_improve_stop=0 making the ladder trivial is NOT a
no-op, so reinit is left in; the two patchable pieces bracket it)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.solver import common, optimize as O


def timed_run(label):
    # O.evolve is jit-wrapped: monkeypatched internals (batch_insert,
    # make_order) are only re-traced after clearing the jit cache —
    # otherwise every configuration re-runs the 'full' executable and the
    # ablation measures nothing (ADVICE r3).
    import jax

    jax.clear_caches()
    ctx = make_context(0)
    ctx.parameters.seed = 123
    pb = preprocess(ctx, parse_lp(open("/tmp/vtest/scp.lp").read()))
    orig_evolve = O.evolve
    done = {}

    def spy(*args, **kw):
        kw2 = {k: v for k, v in kw.items() if k != "n_steps"}
        state = args[-1]
        args = args[:-1]
        times = []
        for n_steps in (10, 110):
            state = orig_evolve(*args, state, n_steps=n_steps, **kw2)
            float(jnp.sum(state.pop.value))
        for n_steps in (10, 110):
            t = time.perf_counter()
            state = orig_evolve(*args, state, n_steps=n_steps, **kw2)
            float(jnp.sum(state.pop.value))
            times.append(time.perf_counter() - t)
        done["per"] = (times[1] - times[0]) / 100
        return state

    O.evolve = spy
    ctx.parameters.time_limit = 1e-9
    O.optimize_compiled(ctx, pb)
    O.evolve = orig_evolve
    print(f"{label}: {done['per']*1e3:.3f} ms/step", flush=True)


def main():
    timed_run("full")

    # --- no population insert ---
    orig_insert = O.batch_insert
    O.batch_insert = (
        lambda pop, x, v, r, m, k, hw, mini: pop
    )
    timed_run("insert=noop")
    O.batch_insert = orig_insert

    # --- static order (no per-step permutation / compaction input) ---
    orig_order = common.make_order
    O.common.make_order = lambda cp, code, x, pi, key, mp, static_policy=None: (
        jnp.arange(mp, dtype=jnp.int32)
        % jnp.asarray(max(cp.m, 1), jnp.int32)
    ).astype(jnp.int32)
    timed_run("order=static")
    O.common.make_order = orig_order

    # --- both ---
    O.batch_insert = lambda pop, x, v, r, m, k, hw, mini: pop
    O.common.make_order = lambda cp, code, x, pi, key, mp, static_policy=None: (
        jnp.arange(mp, dtype=jnp.int32)
        % jnp.asarray(max(cp.m, 1), jnp.int32)
    ).astype(jnp.int32)
    timed_run("insert+order=noop")
    O.batch_insert = orig_insert
    O.common.make_order = orig_order


if __name__ == "__main__":
    main()

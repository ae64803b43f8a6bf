"""Instrument optimize-mode evolve on small4: restart rate, remaining
histogram, population state — why don't thousands of restarts reach
feasibility when the reference test machine's thread pool does?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import baryonyx_tpu as bx
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.solver import optimize as O


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    ctx = bx.make_context(3)
    p = ctx.parameters
    p.seed = 123456789
    p.time_limit = budget
    p.theta, p.delta = 0.5, 0.2
    p.kappa_step, p.kappa_max = 1e-3, 0.6
    p.alpha, p.w = 0.0, 20
    p.pushing_k_factor, p.pushes_limit = 0.9, 50
    p.pushing_objective_amplifier, p.pushing_iteration_limit = 10, 50
    pb = preprocess(ctx, bx.parse_lp(
        open("/root/reference/lib/test/small4.lp").read()))

    orig_evolve = O.evolve
    t0 = time.monotonic()
    tick = {"i": 0}

    def spy_evolve(*args, **kw):
        state = orig_evolve(*args, **kw)
        tick["i"] += 1
        if tick["i"] % 10 == 0:
            rs = state.replicas
            rem = np.asarray(rs.viol).sum(axis=0)
            ph = np.asarray(rs.phase)
            pop_rem = np.asarray(state.pop.remaining)
            print(
                f"t={time.monotonic()-t0:5.1f}s sweeps={int(state.sweeps)} "
                f"restarts={int(np.sum(np.asarray(rs.restarts)))} "
                f"rem now min/med={rem.min()}/{int(np.median(rem))} "
                f"bestrem min/med={np.asarray(rs.best_remaining).min()}/{int(np.median(np.asarray(rs.best_remaining)))} "
                f"phases={np.bincount(ph, minlength=3)[:3]} "
                f"kappa med={float(np.median(np.asarray(rs.kappa))):.3f} "
                f"pop rem[:8]={pop_rem[:8]} ",
                flush=True,
            )
        return state

    O.evolve = spy_evolve
    r = O.optimize_compiled(ctx, pb)
    print("status", r.status.name, "remaining", r.remaining_constraints,
          "value", r.solutions[-1].value if r.solutions else None)


if __name__ == "__main__":
    main()

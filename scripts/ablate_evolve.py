"""Time evolve steps with components ablated (BARYONYX_ABLATE hooks)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.solver import optimize as O


def main():
    abl = os.environ.get("BARYONYX_ABLATE", "")
    ctx = make_context(0)
    ctx.parameters.seed = 123
    pb = preprocess(ctx, parse_lp(open("/tmp/vtest/scp.lp").read()))

    orig_evolve = O.evolve
    times = []

    def spy(cp, cn, co, cc, bastert, hw, hp, state, **kw):
        kw2 = {k: v for k, v in kw.items() if k != "n_steps"}
        # warm both scan lengths (separate executables)
        for n_steps in (10, 110):
            state = orig_evolve(cp, cn, co, cc, bastert, hw, hp, state,
                                n_steps=n_steps, **kw2)
            float(jnp.sum(state.pop.value))
        for n_steps in (10, 110):
            t = time.perf_counter()
            state = orig_evolve(cp, cn, co, cc, bastert, hw, hp, state,
                                n_steps=n_steps, **kw2)
            float(jnp.sum(state.pop.value))
            times.append(time.perf_counter() - t)
        per = (times[1] - times[0]) / 100
        print(f"ablate=[{abl}] per-step {per*1e3:.3f} ms", flush=True)
        return state

    O.evolve = spy
    ctx.parameters.time_limit = 1e-9
    O.optimize_compiled(ctx, pb)


if __name__ == "__main__":
    main()

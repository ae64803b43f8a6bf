"""Instrument the evolve state machine: phase/push_idx/restart stats."""

import numpy as np
import jax
import jax.numpy as jnp

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.solver import optimize as O


def main():
    ctx = make_context(0)
    ctx.parameters.seed = 123
    pb = preprocess(ctx, parse_lp(open("/tmp/vtest/scp.lp").read()))
    # reuse optimize_compiled's setup by monkeypatching evolve to capture
    captured = {}
    orig_evolve = O.evolve

    def spy_evolve(cp, cn, co, cc, bastert, hw, hp, state, **kw):
        for i in range(12):
            state = orig_evolve(cp, cn, co, cc, bastert, hw, hp, state,
                                n_steps=25, **{k: v for k, v in kw.items()
                                               if k != "n_steps"})
            rs = state.replicas
            ph = np.asarray(rs.phase)
            print(
                f"sweeps={int(state.sweeps):4d} "
                f"phases A/P/PI={np.sum(ph==0)}/{np.sum(ph==1)}/{np.sum(ph==2)} "
                f"restarts={int(jnp.sum(rs.restarts))} "
                f"push_idx mean={float(jnp.mean(rs.push_idx)):.1f} "
                f"iter_i mean={float(jnp.mean(rs.iter_i)):.1f} "
                f"kappa mean={float(jnp.mean(rs.kappa)):.3f} "
                f"best={float(state.pop.value[0]):.0f}",
                flush=True,
            )
        captured["state"] = state
        return state

    O.evolve = spy_evolve
    ctx.parameters.time_limit = 1e-9  # one do-while pass of the spy
    res = O.optimize_compiled(ctx, pb)
    print("final:", res.status, res.solutions[-1].value if res.solutions else None)


if __name__ == "__main__":
    main()

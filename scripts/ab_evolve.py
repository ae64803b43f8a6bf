"""A/B the evolutionary optimizer trajectory: jnp sweep vs pallas psweep.
Run with BARYONYX_PALLAS=off|auto. Prints population-best and restarts."""

import os
import sys

import baryonyx_tpu as bx
from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.solver.optimize import optimize_compiled

mode = os.environ.get("BARYONYX_PALLAS", "auto")
ctx = make_context(4)
ctx.parameters.seed = int(sys.argv[3]) if len(sys.argv) > 3 else 123
ctx.parameters.time_limit = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
ctx.parameters.chunk_size = 20
if len(sys.argv) > 2:
    ctx.parameters.block_size = int(sys.argv[2])


def upd(rem, val, sweeps, dur, restarts):
    print(f"[{mode}/B{ctx.parameters.block_size}] t={dur:6.1f}s sweeps={sweeps:5d} restarts={restarts:6d} "
          f"best_rem={rem} best_val={val:.1f}", flush=True)


ctx.update_cb = upd
import os as _os
pb = preprocess(ctx, parse_lp(open(_os.environ.get("AB_LP", "/tmp/vtest/scp.lp")).read()))
res = optimize_compiled(ctx, pb)
print(f"[{mode}] FINAL {res.status} value={res.solutions[-1].value if res.solutions else None} "
      f"sweeps={res.loop}")

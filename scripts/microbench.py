"""Per-component timing on the real chip: psweep kernel, violated_mask,
full evolve step machinery."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from baryonyx_tpu.core.context import make_context
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.io.lp_parse import parse_lp
from baryonyx_tpu.ops.layout import compile_problem
from baryonyx_tpu.ops.sweep import violated_mask
from baryonyx_tpu.preprocess.fixing import preprocess
from baryonyx_tpu.preprocess.merge import make_merged_constraints
from baryonyx_tpu.solver import common
from baryonyx_tpu.ops import psweep as pw

ctx = make_context(0)
pb = preprocess(ctx, parse_lp(random_set_cover_lp(200, 1000, 0.02, seed=41)))
csts = make_merged_constraints(ctx, pb)
n = len(pb.vars.values)
cp = compile_problem(csts, n)
cost = np.pad(common.build_cost_vector(pb, n), (0, cp.n - n))
cost_norm = jnp.asarray(
    common.normalize_costs(cost, ctx.parameters.cost_norm, np.random.default_rng(0)),
    jnp.float32,
)
n = cp.n
print("cp: m", cp.m, "n", cp.n, "Kr", cp.Kr, "J_bot", cp.J_bot, "J_top", cp.J_top)

R, B = 1024, 4
assert pw.supports(cp, R, jnp.float32, B)
m = cp.m
mp = ((m + B - 1) // B) * B
order = jnp.concatenate([jnp.arange(m, dtype=jnp.int32), jnp.full((mp - m,), m, jnp.int32)])
key = jax.random.key(0)
x = jax.random.bernoulli(key, 0.5, (n, R)).astype(jnp.int32)
P = jnp.zeros((m, cp.Kr, R), jnp.float32)
pi = jnp.zeros((m, R), jnp.float32)
S0 = jnp.zeros((n, R), jnp.float32)
kap = jnp.full((R,), 0.1, jnp.float32)
amp = jnp.zeros((R,), jnp.float32)


def timeit(fn, label, iters_pair=(20, 120)):
    N1, N2 = iters_pair
    n1 = jnp.asarray(N1, jnp.int32)
    n2 = jnp.asarray(N2, jnp.int32)
    float(fn(n1))
    float(fn(n2))
    t = time.perf_counter(); float(fn(n1)); t1 = time.perf_counter() - t
    t = time.perf_counter(); float(fn(n2)); t2 = time.perf_counter() - t
    per = (t2 - t1) / (N2 - N1)
    print(f"{label}: {per*1e6:.1f} us/iter")
    return per


# 1. violated_mask alone (chained: viol feeds a sum that feeds nothing real,
#    but chain x through a trivial mutation to prevent CSE)
@jax.jit
def vm_loop(nsteps):
    def body(c):
        x, acc, i = c
        v = violated_mask(cp, x)
        s = jnp.sum(v.astype(jnp.int32))
        x = x.at[0, 0].set((x[0, 0] + 1) % 2)
        return (x, acc + s, i + 1)
    c = jax.lax.while_loop(lambda c: c[-1] < nsteps, body, (x, jnp.int32(0), jnp.int32(0)))
    return jnp.sum(c[1])


timeit(vm_loop, "violated_mask")


# 2. psweep alone, viol carried (no external violated_mask)
@jax.jit
def ps_loop(nsteps):
    def body(c):
        x, P, pi, S, sched, key, acc, i = c
        key, k = jax.random.split(key)
        x, P, pi, S, viol, rem = pw.psweep(
            cp, x, P, pi, cost_norm, sched, order, kap,
            jnp.float32(0.01), jnp.float32(0.5), k, amp,
            S=S, S_fresh=(i % 16) != 0, minimize=True,
        )
        return (x, P, pi, S, viol, key, acc + jnp.sum(rem), i + 1)
    sched0 = violated_mask(cp, x)
    c = jax.lax.while_loop(
        lambda c: c[-1] < nsteps, body,
        (x, P, pi, S0, sched0, key, jnp.int32(0), jnp.int32(0)))
    return jnp.sum(c[-2])


per_ps = timeit(ps_loop, "psweep(viol carried)")


# 3. psweep + fresh violated_mask each step (current bench behavior)
@jax.jit
def ps_vm_loop(nsteps):
    def body(c):
        x, P, pi, S, key, acc, i = c
        key, k = jax.random.split(key)
        sched = violated_mask(cp, x)
        x, P, pi, S, viol, rem = pw.psweep(
            cp, x, P, pi, cost_norm, sched, order, kap,
            jnp.float32(0.01), jnp.float32(0.5), k, amp,
            S=S, S_fresh=(i % 16) != 0, minimize=True,
        )
        return (x, P, pi, S, key, acc + jnp.sum(rem), i + 1)
    c = jax.lax.while_loop(
        lambda c: c[-1] < nsteps, body,
        (x, P, pi, S0, key, jnp.int32(0), jnp.int32(0)))
    return jnp.sum(c[-2])


per_psvm = timeit(ps_vm_loop, "psweep+violated_mask")
print("R =", R, "-> sweeps/s carried:", R / per_ps, "fresh:", R / per_psvm)


# 4. full optimize machinery (population insert, restart state machine,
#    order policies) via the public API — sweeps/s from Result.loop
import baryonyx_tpu as bx

lp_text = random_set_cover_lp(200, 1000, 0.02, seed=41)
pb_full = bx.parse_lp(lp_text)
ctx2 = bx.make_context(0)
ctx2.parameters.time_limit = 12.0
ctx2.parameters.seed = 7
res = bx.optimize(ctx2, pb_full)
print(
    "full optimize:", res.status, "obj",
    res.solutions[-1].value if res.solutions else None,
    "sweeps", res.loop, "->", res.loop / 12.0, "sweeps/s (x R replicas)",
)

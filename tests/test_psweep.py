"""Pallas sweep kernel coverage.

CPU CI runs the kernel through the Pallas interpreter (hash tie-noise
path) and checks parity against the jnp sweep (ops/sweep.py) on fixtures
whose reduced-cost gaps dwarf the tie noise, so both implementations must
make identical selections; P/pi/S then agree to noise tolerance and x
bit-exactly. Hardware mode (hw PRNG, real DMA pipelining) runs the same
battery plus throughput via scripts/psweep_check.py and
test_psweep_invariants below.
"""

import functools
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
    reason="compiled kernel needs TPU (interpret parity runs on CPU)",
)

R = 512  # plan() requires >= 4 full lanes of replicas


def _compiled_scp(m, n, density, seed):
    ctx = make_context(0)
    pb = preprocess(ctx, parse_lp(random_set_cover_lp(m, n, density, seed=seed)))
    csts = make_merged_constraints(ctx, pb)
    n0 = len(pb.vars.values)
    cp = compile_problem(csts, n0)
    # distinct, irregularly spaced costs -> reduced-cost gaps >= ~0.01
    # between any two slots of a row, dwarfing both implementations' tie
    # noise (jnp: ~1e-6*(1+max|r|); pallas: relative 2e-6 + delta*1e-3
    # dither), so selections must agree exactly
    cost = 1.0 + np.arange(cp.n) + 0.01 * ((np.arange(cp.n) * 37) % 61)
    cost_norm = jnp.asarray(cost, jnp.float32)
    return cp, cost_norm


def _state(cp, seed=0):
    from baryonyx_tpu.ops.sweep import violated_mask

    key = jax.random.key(seed)
    x = jax.random.bernoulli(key, 0.2, (cp.n, R)).astype(jnp.int32)
    P = jnp.zeros((cp.m, cp.Kr, R), jnp.float32)
    pi = jnp.zeros((cp.m, R), jnp.float32)
    sched = violated_mask(cp, x)
    order = jnp.arange(cp.m, dtype=jnp.int32)
    return x, P, pi, sched, order


def _run_pair(cp, cost_norm, block_size=8, sweeps=3):
    """Run the jnp sweep and the interpreted Pallas kernel from the same
    state; returns both end states."""
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.ops.sweep import sweep, violated_mask

    kplan = pw.plan(cp, R, jnp.float32, block_size)
    assert kplan is not None
    # the planner may shrink the row-block below the request (SMEM/VMEM
    # budgets); parity needs both implementations on the same Jacobi
    # block boundaries
    block_size = kplan.Bb
    kappa = jnp.full((R,), 0.15, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)
    delta, theta = jnp.float32(0.01), jnp.float32(0.5)

    outs = []
    for impl in ("jnp", "pallas"):
        x, P, pi, sched, order = _state(cp)
        S = None
        for it in range(sweeps):
            kw = dict(
                n_rows=None, minimize=True, block_size=block_size,
                S=S, S_fresh=jnp.asarray(it != 0),
            )
            if impl == "jnp":
                x, P, pi, S, viol, rem = sweep(
                    cp, x, P, pi, cost_norm, sched, order, kappa, delta,
                    theta, jax.random.key(it + 1), amp, **kw,
                )
            else:
                x, P, pi, S, viol, rem = pw.psweep(
                    cp, x, P, pi, cost_norm, sched, order, kappa, delta,
                    theta, jax.random.key(it + 1), amp, interpret=True, **kw,
                )
            sched = viol
        outs.append((np.asarray(x), np.asarray(P), np.asarray(pi),
                     np.asarray(S), np.asarray(rem)))
    return outs, kplan


def _assert_parity(a, b):
    xa, Pa, pia, Sa, rema = a
    xb, Pb, pib, Sb, remb = b
    assert (xa == xb).all(), f"x mismatch on {np.sum(xa != xb)} entries"
    np.testing.assert_allclose(pia, pib, rtol=0, atol=2e-4)
    np.testing.assert_allclose(Pa, Pb, rtol=0, atol=2e-4)
    np.testing.assert_allclose(Sa, Sb, rtol=0, atol=2e-3)
    assert (rema == remb).all()


def test_psweep_interpret_parity_small_tables():
    """Small mode: tables in SMEM scalar-prefetch (one grid step)."""
    from baryonyx_tpu.ops import psweep as pw

    cp, cost = _compiled_scp(40, 160, 0.06, seed=5)
    (a, b), kplan = _run_pair(cp, cost)
    assert not kplan.big
    _assert_parity(a, b)


def test_psweep_interpret_parity_big_tables(monkeypatch):
    """Big mode: tables chunked in HBM, DMA'd per block."""
    from baryonyx_tpu.ops import psweep as pw

    monkeypatch.setattr(pw, "SMEM_BUDGET", 8 * 1024)
    cp, cost = _compiled_scp(40, 160, 0.06, seed=5)
    (a, b), kplan = _run_pair(cp, cost)
    assert kplan.big
    _assert_parity(a, b)


def test_psweep_interpret_parity_multigroup(monkeypatch):
    """Gg > 1: the replica axis splits over grid steps."""
    from baryonyx_tpu.ops import psweep as pw

    # squeeze VMEM so plan() picks Gc=2 (grid over replica groups)
    cp, cost = _compiled_scp(40, 160, 0.06, seed=5)
    monkeypatch.setattr(pw, "VMEM_BUDGET", pw._vmem_bytes(cp, 2, 8, False))
    kplan = pw.plan(cp, R, jnp.float32, 8)
    assert kplan is not None and kplan.Gc == 2
    (a, b), _ = _run_pair(cp, cost)
    _assert_parity(a, b)


def test_plan_covers_benchmark_class():
    """The Pallas path must cover the benchmark-suite instance sizes
    (VERDICT round 2 item 1): the scp 1000x10000 generator class and an
    SPP-like long-row shape."""
    from baryonyx_tpu.core.model import FunctionElement as CE
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.preprocess.merge import MergedConstraint

    # synthetic compile at the scp1000x10000 scale (building the real LP
    # takes minutes; the plan depends only on (m, n, Kr, flags))
    rng = np.random.default_rng(0)
    csts = []
    n = 10_000
    for k in range(1000):
        sz = 180 + int(rng.integers(0, 60))
        vs = rng.choice(n, size=sz, replace=False)
        csts.append(
            MergedConstraint(
                elements=[CE(1, int(j)) for j in vs], min=1, max=sz, id=k
            )
        )
    cp = compile_problem(csts, n)
    kplan = pw.plan(cp, 512, jnp.float32, 8)
    assert kplan is not None, "scp1000x10000 class must be Pallas-eligible"
    assert kplan.big  # tables cannot fit SMEM at this size

    # SPP-like: long equality rows (Kr ~ 300) over many columns
    csts = []
    nspp = 8000
    for k in range(800):
        sz = 250 + int(rng.integers(0, 50))
        vs = rng.choice(nspp, size=sz, replace=False)
        csts.append(
            MergedConstraint(
                elements=[CE(1, int(j)) for j in vs], min=1, max=1, id=k
            )
        )
    cp = compile_problem(csts, nspp)
    kplan = pw.plan(cp, 512, jnp.float32, 8)
    assert kplan is not None, "SPP long-row class must be Pallas-eligible"


def test_plan_covers_kr_above_1024():
    """Rows longer than 1024 slots (sppkl-class) plan onto the fused
    kernel when the VMEM/SMEM budgets allow it — the old hard MAX_KR
    gate silently dropped them to the jnp sweep (VERDICT r4 item 2).
    Kr=1408 at Gc=1 validated on hardware (S-invariant exact)."""
    from baryonyx_tpu.core.model import FunctionElement as CE
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.preprocess.merge import MergedConstraint

    rng = np.random.default_rng(0)
    n = 4096
    csts = []
    for k in range(64):
        sz = 1200 + int(rng.integers(0, 200))
        vs = rng.choice(n, size=sz, replace=False)
        csts.append(
            MergedConstraint(
                elements=[CE(1, int(j)) for j in vs], min=1, max=sz, id=k
            )
        )
    cp = compile_problem(csts, n)
    assert cp.Kr > 1024
    kplan = pw.plan(cp, 512, jnp.float32, 8)
    assert kplan is not None, "Kr in (1024, 2048] must be Pallas-eligible"
    assert kplan.big


def test_plan_covers_small_upper_bound_long_rows():
    """Rows with a small upper bound but a long body (n-queens ≤1
    diagonals, packing rows) must stay on the order-statistic selection
    path: rank coverage may pick the CHEAP side per rank (rank hi-1/hi
    from the bottom when hi is small), not clip-lo→bottom /
    clip-hi→top unconditionally (reference walk: select_variables,
    itm-solver-inequalities-01.cpp:193-206 touches only ranks adjacent
    to the clip point, wherever it lies)."""
    from baryonyx_tpu.core.model import FunctionElement as CE
    from baryonyx_tpu.io.lp_parse import parse_lp
    from baryonyx_tpu.generators import n_queens_lp
    from baryonyx_tpu.core.context import Context
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.preprocess.merge import (
        MergedConstraint,
        make_merged_constraints,
    )

    # sum ≤ 2 over 120 variables: old analysis charged J_top = 119
    csts = [
        MergedConstraint(
            elements=[CE(1, j) for j in range(120)], min=0, max=2, id=0
        )
    ]
    cp = compile_problem(csts, 128)
    assert cp.sel_reduction_ok
    assert cp.J_bot >= 3  # ranks 1, 2 read from the bottom

    # full n-queens (equality rows + ≤1 diagonals) plans onto Pallas
    pb = parse_lp(n_queens_lp(75))
    cons = make_merged_constraints(Context(), pb)
    cp = compile_problem(cons, len(pb.vars.values))
    assert cp.sel_reduction_ok and (cp.J_bot, cp.J_top) == (2, 1)
    assert pw.plan(cp, 512, jnp.float32, 8) is not None


def _compiled_nqueens(N):
    from baryonyx_tpu.generators import n_queens_lp

    ctx = make_context(0)
    pb = parse_lp(n_queens_lp(N))
    csts = make_merged_constraints(ctx, pb)
    cp = compile_problem(csts, len(pb.vars.values))
    n = cp.n
    cost = 1.0 + np.arange(n) + 0.01 * ((np.arange(n) * 37) % 61)
    return cp, jnp.asarray(cost, jnp.float32)


def test_order_statistics_match_sort_on_new_coverage():
    """The per-rank side dispatch must read the same keys the full sort
    would, on the class the round-5 analysis newly admits (equality rows
    + small-hi long inequality rows)."""
    import dataclasses

    from baryonyx_tpu.ops.sweep import sweep

    cp, cost = _compiled_nqueens(12)
    assert cp.sel_reduction_ok
    cp_sort = dataclasses.replace(cp, sel_reduction_ok=False)

    kappa = jnp.full((R,), 0.15, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)
    outs = []
    for c in (cp, cp_sort):
        x, P, pi, sched, order = _state(c)
        S = None
        for it in range(3):
            x, P, pi, S, viol, rem = sweep(
                c, x, P, pi, cost, sched, order, kappa, jnp.float32(0.01),
                jnp.float32(0.5), jax.random.key(it + 1), amp,
                n_rows=None, minimize=True, block_size=8,
                S=S, S_fresh=jnp.asarray(it != 0),
            )
            sched = viol
        outs.append((np.asarray(x), np.asarray(P), np.asarray(pi),
                     np.asarray(S), np.asarray(rem)))
    _assert_parity(outs[0], outs[1])


def test_psweep_interpret_parity_nqueens():
    """Pallas parity on the newly admitted class: equality rows plus
    ≤1 diagonal rows whose clip-hi ranks resolve from the bottom regs.

    n-queens is tie-dominated: columns sit in 4 rows each, so dual
    prices equilibrate (S_j → c_j - const) and reduced-cost gaps
    collapse into the tie noise — selections become noise-stream-
    defined (the reference shuffles ties for exactly this reason,
    itm-common.hpp:117-132). Bit parity across the two streams cannot
    hold; the right bar is that pallas-vs-jnp disagreement is no larger
    than the jnp path's OWN disagreement across two tie-noise seeds.
    Mixed-sign costs force cnt ≥ 2 on diagonal rows so clip-hi binds
    and the bottom-register reads of the new rank coverage run."""
    from baryonyx_tpu.ops.sweep import sweep

    cp, _ = _compiled_nqueens(12)
    n = cp.n
    cost = jnp.asarray(
        (np.arange(n) - n / 2) + 0.01 * ((np.arange(n) * 37) % 61),
        jnp.float32,
    )
    (a, b), kplan = _run_pair(cp, cost, sweeps=1)

    # jnp-vs-jnp flips across tie-noise seeds: the noise floor
    kappa = jnp.full((R,), 0.15, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)
    xs = []
    for seed in (1, 2):
        x, P, pi, sched, order = _state(cp)
        x, P, pi, S, viol, rem = sweep(
            cp, x, P, pi, cost, sched, order, kappa, jnp.float32(0.01),
            jnp.float32(0.5), jax.random.key(seed), amp,
            n_rows=None, minimize=True, block_size=kplan.Bb,
            S=None, S_fresh=jnp.asarray(False),
        )
        xs.append(np.asarray(x))
    noise_floor = max(int(np.sum(xs[0] != xs[1])), 1)

    mism = int(np.sum(a[0] != b[0]))
    assert mism <= 2 * noise_floor, (
        f"pallas-vs-jnp x disagreement {mism} exceeds 2x the tie-noise "
        f"floor {noise_floor}: semantic divergence, not tie noise"
    )


@tpu_only
def test_psweep_invariants():
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.ops.sweep import column_sums, violated_mask

    cp, cost_norm = _compiled_scp(60, 300, 0.05, seed=3)
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


def test_per_replica_hp_routing():
    """delta/theta accept per-replica [R] vectors (the on-device
    hyperparameter-sweep axis, VERDICT r2 item 5): lanes of a mixed run
    must bit-match the corresponding scalar runs, in both the jnp sweep
    and the interpreted Pallas kernel."""
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.ops.sweep import sweep

    cp, cost = _compiled_scp(30, 120, 0.07, seed=9)
    kplan = pw.plan(cp, R, jnp.float32, 8)
    Bb = kplan.Bb
    kappa = jnp.full((R,), 0.12, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)
    half = R // 2
    mix_d = jnp.where(jnp.arange(R) < half, 0.02, 0.005).astype(jnp.float32)
    mix_t = jnp.where(jnp.arange(R) < half, 0.6, 0.3).astype(jnp.float32)

    for impl in ("jnp", "pallas"):
        def run(delta, theta):
            x, P, pi, sched, order = _state(cp, seed=4)
            fn = (
                functools.partial(pw.psweep, interpret=True)
                if impl == "pallas"
                else sweep
            )
            out = fn(
                cp, x, P, pi, cost, sched, order, kappa,
                jnp.asarray(delta), jnp.asarray(theta),
                jax.random.key(3), amp, minimize=True, block_size=Bb,
                S=None, S_fresh=jnp.asarray(False),
            )
            return [np.asarray(o) for o in out[:4]]  # x, P, pi, S

        a = run(jnp.float32(0.02), jnp.float32(0.6))
        b = run(jnp.float32(0.005), jnp.float32(0.3))
        mixed = run(mix_d, mix_t)
        # x (selections) must match lane-exactly; float state to ~1 ulp
        # (XLA fuses broadcast [R] operands differently than scalars)
        np.testing.assert_array_equal(mixed[0][..., :half], a[0][..., :half])
        np.testing.assert_array_equal(mixed[0][..., half:], b[0][..., half:])
        for oa, ob, om in zip(a[1:], b[1:], mixed[1:]):
            np.testing.assert_allclose(om[..., :half], oa[..., :half], atol=1e-5)
            np.testing.assert_allclose(om[..., half:], ob[..., half:], atol=1e-5)


def test_psweep_interpret_parity_quadratic():
    """Quadratic-cost path: the kernel's sweep-entry CQ matmul must match
    the jnp sweep exactly on an instance where the two staleness
    granularities coincide — disjoint rows with intra-row quadratic pairs
    (a variable's quad neighbors change only when its own row processes,
    so block-entry x == sweep-entry x for every read)."""
    from baryonyx_tpu.core.model import ObjectiveQuadraticTerm
    from baryonyx_tpu.ops import psweep as pw
    from baryonyx_tpu.ops.sweep import sweep

    m_rows, row_len = 16, 8
    n0 = m_rows * row_len
    lines = ["minimize"]
    lines.append(
        " + ".join(f"{1 + j} x{j}" for j in range(n0))
    )
    lines.append("subject to")
    for k in range(m_rows):
        lines.append(
            " + ".join(f"x{8 * k + i}" for i in range(row_len)) + " >= 2"
        )
    lines.append("binary")
    lines.append(" ".join(f"x{j}" for j in range(n0)))
    lines.append("end")

    ctx = make_context(0)
    pb = parse_lp("\n".join(lines))
    csts = make_merged_constraints(ctx, pb)
    qelements = []
    for k in range(m_rows):
        qelements.append(
            ObjectiveQuadraticTerm(3.0 + k, 8 * k, 8 * k + 1)
        )
        qelements.append(
            ObjectiveQuadraticTerm(-2.0 - k, 8 * k + 2, 8 * k + 3)
        )
    cp = compile_problem(csts, n0, qelements=qelements)
    assert cp.has_quad
    cost = jnp.asarray(
        1.0 + np.arange(cp.n) + 0.01 * ((np.arange(cp.n) * 37) % 61),
        jnp.float32,
    )
    kplan = pw.plan(cp, R, jnp.float32, 8)
    assert kplan is not None
    block_size = kplan.Bb

    # dense neighbor matrix from the compiled tables (what optimize builds)
    qm = np.asarray(cp.quad_mask)
    qv = np.asarray(cp.quad_var)
    qf = np.asarray(cp.quad_fac, np.float64)
    dq = np.zeros((cp.n, cp.n))
    jj = np.repeat(np.arange(cp.n), qm.shape[1]).reshape(qm.shape)
    np.add.at(dq, (jj[qm], qv[qm]), qf[qm])
    quad_mat = jnp.asarray(dq, jnp.float32)

    kappa = jnp.full((R,), 0.15, jnp.float32)
    amp = jnp.zeros((R,), jnp.float32)
    delta, theta = jnp.float32(0.01), jnp.float32(0.5)

    outs = []
    for impl in ("jnp", "pallas"):
        x, P, pi, sched, order = _state(cp)
        S = None
        for it in range(3):
            kw = dict(
                n_rows=None, minimize=True, block_size=block_size,
                S=S, S_fresh=jnp.asarray(it != 0),
            )
            if impl == "jnp":
                x, P, pi, S, viol, rem = sweep(
                    cp, x, P, pi, cost, sched, order, kappa, delta,
                    theta, jax.random.key(it + 1), amp,
                    quad_fac=cp.quad_fac.astype(jnp.float32), **kw,
                )
            else:
                x, P, pi, S, viol, rem = pw.psweep(
                    cp, x, P, pi, cost, sched, order, kappa, delta,
                    theta, jax.random.key(it + 1), amp, interpret=True,
                    quad_mat=quad_mat, **kw,
                )
            sched = viol
        outs.append((np.asarray(x), np.asarray(P), np.asarray(pi),
                     np.asarray(S), np.asarray(rem)))
    _assert_parity(*outs)

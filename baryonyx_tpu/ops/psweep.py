"""Pallas TPU kernel for the Wedelin sweep — the hot loop, fused.

The jnp sweep (ops/sweep.py) is bounded by HBM traffic: every block makes
~15 passes over [B, Kr, R] temporaries plus one-hot matmuls against the
[n, R] column sums. This kernel keeps the whole solver state resident in
VMEM for the duration of a sweep, so per-row work is a handful of
VMEM-local tile ops.

Semantics match the jnp sweep exactly: rows are processed in blocks of
``block_size`` — decisions for all rows of a block are computed against
the column sums as they stood at block entry (Jacobi within the block),
then applied row-by-row (later rows win conflicting x writes), with
strict sequencing across blocks. Block-Jacobi is not an implementation
compromise: A/B runs show it finds strictly better objectives than the
reference's pure row-sequential Gauss-Seidel (itm-solver-inequalities-
01.cpp:258-296) on SCP-class instances — the stale within-block prices
decorrelate row decisions the way the reference relies on randomized
constraint ordering to do.

Layout: the replica axis R is folded to [G, 128] (G = R // 128) so a
"row" of any per-variable array is exactly one native (8, 128) f32 tile
per G/8 — every dynamic gather/scatter moves full VPU tiles instead of
strided lane-vectors. State in VMEM: merged column sums S [n, G, 128]
(f32), assignment x [n, G, 128] (int8), multipliers pi [m, G, 128]. The
preference matrix P [m, Kr, G, 128] stays in HBM; each block DMAs its
rows into a VMEM block buffer and back.

Per block (reference affect(), itm-common.hpp:382-467):
  phase A, per row (slot loop bounded by the row's true length): gather
    S[j], reduced cost r_s, multiplicative tie-noise, running order
    statistics (count of nonpositives, J_bot smallest, J_top largest,
    max-nonpositive, min-positive); selection selected+1 = clip(cnt, lo,
    hi) (inequalities) or the equality constant — the sort-free scheme
    of ops/sweep.py; store the noised keys, the selection threshold
    (key of the selected rank), d, dpi
  phase B, per row: chosen = key <= threshold; P row update,
    S[j] += a*(dpi + dP), x[j] masked write, pi[k] += dpi. On pure-0/1
    problems (cp.all_unit_pos) all factor-sign handling drops out.

Tie-breaking: the reference shuffles equal reduced costs
(itm-common.hpp:117-132) and coin-flips at exactly zero. Here sv gets
multiplicative noise sv*(1 + u*2e-6) plus an absolute delta-scaled dither
— relative noise breaks equal-value ties at any magnitude, the absolute
term breaks ties at zero.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baryonyx_tpu.ops.layout import CompiledProblem
from baryonyx_tpu.ops.sweep import column_sums, violated_mask

LANE = 128
MAX_KR = 64  # unrolled slot loops; larger rows fall back to the jnp sweep
MAX_B = 16  # block buffer rows held in VMEM


def enabled_mode() -> Optional[str]:
    """How the Pallas path should run here: "compiled" on TPU backends,
    "interpret" when BARYONYX_PALLAS=interpret (CPU tests), None when off
    or on a CPU backend."""
    import os

    v = os.environ.get("BARYONYX_PALLAS", "auto")
    if v == "off":
        return None
    if v == "interpret":
        return "interpret"
    if v == "force":
        return "compiled"
    return "compiled" if jax.default_backend() != "cpu" else None


def supports(cp: CompiledProblem, R: int, dtype, block_size: int) -> bool:
    """Static eligibility for the Pallas path (callers fall back to
    ops/sweep.py otherwise)."""
    if dtype != jnp.float32:
        return False
    # below G=4 the [G, 128] tiles waste most VPU sublanes and the
    # boundary relayouts dominate — the jnp sweep is faster there
    if R % LANE != 0 or R < 4 * LANE:
        return False
    if cp.has_z or cp.has_quad:
        return False
    if cp.Kr > MAX_KR or block_size > MAX_B:
        return False
    if not cp.sel_reduction_ok:
        return False
    G = R // LANE
    bpr = G * LANE * 4  # bytes per int32/f32 row-tile
    vmem = (
        cp.n * bpr  # S f32
        + cp.n * bpr  # x int32
        + cp.m * bpr  # pi f32
        + cp.m * bpr  # sched int32
        + 2 * block_size * cp.Kr * bpr  # P block buffer + noised keys
    )
    # 16 MB physical VMEM per core; leave ~2 MB for Mosaic temporaries
    # (measured: the scp 200x1000 class compiles and runs at 13.3 MB)
    return vmem <= 14 * 1024 * 1024


def _insert_min(regs, v):
    """Running ascending top-J insert: regs sorted; returns new regs."""
    out = []
    for t in range(len(regs) - 1, 0, -1):
        out.append(jnp.where(v < regs[t - 1], regs[t - 1], jnp.minimum(regs[t], v)))
    out.append(jnp.minimum(regs[0], v))
    return out[::-1]


def _insert_max(regs, v):
    out = []
    for t in range(len(regs) - 1, 0, -1):
        out.append(jnp.where(v > regs[t - 1], regs[t - 1], jnp.maximum(regs[t], v)))
    out.append(jnp.maximum(regs[0], v))
    return out[::-1]


def _pick(regs, idx):
    acc = regs[-1]
    for j in range(len(regs) - 2, -1, -1):
        acc = jnp.where(idx == j, regs[j], acc)
    return acc


def _make_kernel(cp: CompiledProblem, G: int, minimize: bool, Bb: int):
    m, n, Kr = cp.m, cp.n, cp.Kr
    J_bot, J_top = cp.J_bot, cp.J_top
    unit = cp.all_unit_pos  # pure 0/1 class: drop all factor-sign handling
    f32 = jnp.float32

    def kernel(
        # scalar-prefetch (SMEM)
        seed_ref,  # int32[2]
        order_ref,  # int32[mp]
        nrows_ref,  # int32[1]
        rowvars_ref,  # int32[m, Kr]
        rowfac_ref,  # int32[m, Kr] (0 = padded slot)
        rowmeta_ref,  # int32[m, 5]: bmin, bmax, c_size, r_size, is_eq
        cost_ref,  # f32[n]
        scal_ref,  # f32[2]: delta, theta
        # VMEM operands
        S_ref,  # f32[n, G, 128]   (aliased out 0)
        x_ref,  # int32[n, G, 128] (aliased out 1)
        pi_ref,  # f32[m, G, 128]  (aliased out 2)
        kappa_ref,  # f32[G, 128]
        amp_ref,  # f32[G, 128]
        sched_ref,  # int32[m, G, 128]
        # HBM operand
        P_hbm,  # f32[m, Kr, G, 128] (aliased out 3)
        # outputs (aliases of S, x, pi, P)
        S_out,
        x_out,
        pi_out,
        P_out,
        # scratch
        p_blk,  # f32[Bb, Kr, G, 128]
        keys_blk,  # f32[Bb, Kr, G, 128] — noised selection keys
        thr_blk,  # f32[Bb, G, 128] — selection threshold per row
        d_blk,  # f32[Bb, G, 128]
        dpi_blk,  # f32[Bb, G, 128]
        sem_in,  # DMA[Bb]
        sem_out,  # DMA[Bb]
    ):
        pltpu.prng_seed(seed_ref[0], seed_ref[1])
        # Work on the (input-aliased) output refs: Pallas input refs are
        # read-only; with aliasing these copies compile to no-ops.
        S_out[:] = S_ref[:]
        x_out[:] = x_ref[:]
        pi_out[:] = pi_ref[:]
        delta = scal_ref[0]
        theta = scal_ref[1]
        kap = kappa_ref[:]
        kp = kap / (1.0 - kap)  # [G, 128]
        amp = amp_ref[:]
        inf = jnp.float32(jnp.inf)

        def block_body(blk, _):
            base = blk * Bb

            # start all row DMAs for the block
            for b in range(Bb):
                k = order_ref[base + b]

                @pl.when(k < m)
                def _():
                    pltpu.make_async_copy(
                        P_hbm.at[k], p_blk.at[b], sem_in.at[b]
                    ).start()

            # ---- phase A: decisions against block-entry S
            for b in range(Bb):
                k = order_ref[base + b]

                @pl.when(k < m)
                def _():
                    bmin = rowmeta_ref[k, 0]
                    bmax = rowmeta_ref[k, 1]
                    csz = rowmeta_ref[k, 2]
                    rsz = rowmeta_ref[k, 3]
                    iseq = rowmeta_ref[k, 4]
                    valid = sched_ref[k] > 0  # [G, 128]

                    pltpu.make_async_copy(
                        P_hbm.at[k], p_blk.at[b], sem_in.at[b]
                    ).wait()

                    # slot loop runs only the row's real length (rows
                    # average well under Kr); stats carried through the
                    # loop, keys written to VMEM for phase B's threshold
                    # test
                    def slot_stats(s, carry):
                        cnt, bots, tops, mx_np, mn_p = carry
                        j = rowvars_ref[k, s]
                        cj = cost_ref[j]
                        Sj = S_out[j]  # [G, 128]
                        pr = p_blk[b, s]
                        if unit:
                            r = cj - (Sj + (theta - 1.0) * pr)
                        else:
                            af = rowfac_ref[k, s].astype(f32)
                            r = cj - (Sj + af * (theta - 1.0) * pr)
                            r = jnp.where(af < 0, -r, r)
                        r = r + amp * cj
                        sv = r if minimize else -r
                        bits = pltpu.prng_random_bits((G, LANE))
                        u = (bits >> 8).astype(f32) * jnp.float32(2**-24)
                        sv = sv * (1.0 + (u - 0.5) * 2e-6) + (u - 0.5) * (
                            delta * 1e-3
                        )
                        keys_blk[b, s] = sv
                        cnt = cnt + (sv <= 0).astype(jnp.int32)
                        bots = _insert_min(bots, sv)
                        tops = _insert_max(tops, sv)
                        mx_np = jnp.maximum(mx_np, jnp.where(sv <= 0, sv, -inf))
                        mn_p = jnp.minimum(mn_p, jnp.where(sv > 0, sv, inf))
                        return cnt, bots, tops, mx_np, mn_p

                    cnt, bots, tops, mx_np, mn_p = jax.lax.fori_loop(
                        0,
                        rsz,
                        slot_stats,
                        (
                            jnp.zeros((G, LANE), jnp.int32),
                            [jnp.full((G, LANE), inf, f32) for _ in range(J_bot)],
                            [jnp.full((G, LANE), -inf, f32) for _ in range(J_top)],
                            jnp.full((G, LANE), -inf, f32),
                            jnp.full((G, LANE), inf, f32),
                        ),
                    )

                    # selection (see ops/sweep.py)
                    lo = bmin + csz
                    hi = jnp.minimum(bmax + csz, rsz)
                    sel_eq = jnp.minimum(bmin + csz, rsz) - 1
                    sel_ineq = jnp.clip(cnt, lo, hi) - 1
                    selected = jnp.where(iseq > 0, sel_eq, sel_ineq)
                    unclipped = (iseq == 0) & (selected + 1 == cnt)
                    bot_ok = (selected >= 0) & (selected < J_bot)
                    sv_sel = jnp.where(
                        unclipped,
                        mx_np,
                        jnp.where(
                            bot_ok,
                            _pick(bots, selected),
                            _pick(tops, rsz - 1 - selected),
                        ),
                    )
                    sv_sel1 = jnp.where(
                        unclipped,
                        mn_p,
                        jnp.where(
                            selected + 1 < J_bot,
                            _pick(bots, selected + 1),
                            _pick(tops, rsz - 2 - selected),
                        ),
                    )
                    if minimize:
                        Rs_sel, Rs_sel1, Rs0 = sv_sel, sv_sel1, bots[0]
                    else:
                        Rs_sel, Rs_sel1, Rs0 = -sv_sel, -sv_sel1, -bots[0]
                    case_none = selected < 0
                    case_all = selected + 1 >= rsz
                    d = delta + kp * jnp.where(
                        case_none,
                        Rs0 * 0.5,
                        jnp.where(case_all, Rs_sel * 1.5, Rs_sel1 - Rs_sel),
                    )
                    dpi = jnp.where(
                        case_none | case_all, 0.0, (Rs_sel + Rs_sel1) * 0.5
                    )
                    d_blk[b] = d
                    dpi_blk[b] = jnp.where(valid, dpi, 0.0)
                    thr_blk[b] = jnp.where(case_none, -inf, sv_sel)

            # ---- phase B: apply row-by-row (later rows win x conflicts)
            for b in range(Bb):
                k = order_ref[base + b]

                @pl.when(k < m)
                def _():
                    rsz = rowmeta_ref[k, 3]
                    valid = sched_ref[k] > 0
                    d = d_blk[b]
                    dpi = dpi_blk[b]
                    thr = thr_blk[b]

                    def slot_apply(s, _):
                        j = rowvars_ref[k, s]
                        chosen = keys_blk[b, s] <= thr
                        sgn = jnp.where(chosen, 1.0, -1.0)
                        pr = p_blk[b, s]
                        if unit:
                            new_p = theta * pr + sgn * d
                            new_p = jnp.where(valid, new_p, pr)
                            p_blk[b, s] = new_p
                            S_out[j] = S_out[j] + (dpi + new_p - pr)
                            bit = chosen.astype(jnp.int32)
                        else:
                            af = rowfac_ref[k, s].astype(f32)
                            new_p = (
                                theta * pr
                                + sgn * jnp.where(af < 0, -1.0, 1.0) * d
                            )
                            new_p = jnp.where(valid, new_p, pr)
                            p_blk[b, s] = new_p
                            S_out[j] = S_out[j] + af * (dpi + new_p - pr)
                            bit = (sgn * af > 0).astype(jnp.int32)
                        x_out[j] = jnp.where(valid, bit, x_out[j])
                        return 0

                    jax.lax.fori_loop(0, rsz, slot_apply, 0)
                    pi_out[k] = pi_out[k] + dpi
                    pltpu.make_async_copy(
                        p_blk.at[b], P_out.at[k], sem_out.at[b]
                    ).start()

            for b in range(Bb):
                k = order_ref[base + b]

                @pl.when(k < m)
                def _():
                    pltpu.make_async_copy(
                        p_blk.at[b], P_out.at[k], sem_out.at[b]
                    ).wait()

            return 0

        n_blocks = (nrows_ref[0] + Bb - 1) // Bb
        jax.lax.fori_loop(0, n_blocks, block_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("minimize", "block_size", "interpret"))
def _psweep_call(
    cp: CompiledProblem,
    x: jax.Array,  # int32[n, R]
    P: jax.Array,  # f32[m, Kr, R]
    pi: jax.Array,  # f32[m, R]
    cost: jax.Array,  # f32[n]
    sched: jax.Array,  # bool[m, R]
    order: jax.Array,  # int32[mp]
    n_rows: jax.Array,  # int32
    kappa: jax.Array,  # f32[R]
    delta: jax.Array,
    theta: jax.Array,
    key: jax.Array,
    obj_amp: jax.Array,  # f32[R]
    S: jax.Array,  # f32[n, R]
    minimize: bool,
    block_size: int,
    interpret: bool = False,
):
    m, n, Kr = cp.m, cp.n, cp.Kr
    R = pi.shape[-1]
    G = R // LANE
    Bb = block_size
    f32 = jnp.float32

    S3 = S.reshape(n, G, LANE)
    x3 = x.reshape(n, G, LANE)
    pi3 = pi.reshape(m, G, LANE)
    P4 = P.reshape(m, Kr, G, LANE)
    sched3 = sched.astype(jnp.int32).reshape(m, G, LANE)
    kap = kappa.astype(f32).reshape(G, LANE)
    ampv = obj_amp.astype(f32).reshape(G, LANE)

    seed = jax.random.key_data(jax.random.fold_in(key, 7)).astype(jnp.uint32)
    seed = seed.reshape(-1)[:2].astype(jnp.int32)
    rowmeta = jnp.stack(
        [cp.bmin, cp.bmax, cp.neg_count, cp.r_size, cp.is_eq.astype(jnp.int32)],
        axis=1,
    )
    scal = jnp.stack([delta.astype(f32), theta.astype(f32)])

    # pad the order so every block has Bb entries (sentinel m = skip)
    mp = order.shape[0]
    mp_pad = ((mp + Bb - 1) // Bb) * Bb
    if mp_pad != mp:
        order = jnp.concatenate(
            [order, jnp.full((mp_pad - mp,), m, jnp.int32)]
        )

    kernel = _make_kernel(cp, G, minimize, Bb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kappa
            pl.BlockSpec(memory_space=pltpu.VMEM),  # amp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sched
            pl.BlockSpec(memory_space=pltpu.ANY),  # P (HBM)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bb, Kr, G, LANE), f32),  # p_blk
            pltpu.VMEM((Bb, Kr, G, LANE), f32),  # keys_blk
            pltpu.VMEM((Bb, G, LANE), f32),  # thr_blk
            pltpu.VMEM((Bb, G, LANE), f32),  # d_blk
            pltpu.VMEM((Bb, G, LANE), f32),  # dpi_blk
            pltpu.SemaphoreType.DMA((Bb,)),
            pltpu.SemaphoreType.DMA((Bb,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, G, LANE), f32),
        jax.ShapeDtypeStruct((n, G, LANE), jnp.int32),
        jax.ShapeDtypeStruct((m, G, LANE), f32),
        jax.ShapeDtypeStruct((m, Kr, G, LANE), f32),
    ]
    nrows_arr = jnp.asarray(n_rows, jnp.int32).reshape(1)
    S3, x3, pi3, P4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # operand index after the 8 scalar-prefetch args: S=8, x=9, pi=10,
        # kappa=11, amp=12, sched=13, P=14
        input_output_aliases={8: 0, 9: 1, 10: 2, 14: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        seed,
        order.astype(jnp.int32),
        nrows_arr,
        cp.row_vars,
        cp.row_factor.astype(jnp.int32),
        rowmeta,
        cost.astype(f32),
        scal,
        S3,
        x3,
        pi3,
        kap,
        ampv,
        sched3,
        P4,
    )
    return (
        x3.reshape(n, R),
        P4.reshape(m, Kr, R),
        pi3.reshape(m, R),
        S3.reshape(n, R),
    )


def psweep(
    cp: CompiledProblem,
    x: jax.Array,
    P: jax.Array,
    pi: jax.Array,
    cost: jax.Array,
    sched: jax.Array,
    order: jax.Array,
    kappa: jax.Array,
    delta: jax.Array,
    theta: jax.Array,
    key: jax.Array,
    obj_amp: jax.Array,
    n_rows: Optional[jax.Array] = None,
    minimize: bool = True,
    block_size: int = 8,
    random_solver: bool = False,
    quad_fac: Optional[jax.Array] = None,
    S: Optional[jax.Array] = None,
    S_fresh: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple:
    """Drop-in replacement for ops.sweep:sweep on supported problems.

    Same contract: returns (x, P, pi, S, new_violated, remaining)."""
    assert not random_solver and quad_fac is None
    dtype = P.dtype
    delta = jnp.asarray(delta, dtype)
    theta = jnp.asarray(theta, dtype)
    if S is None:
        S = column_sums(cp, P, pi)
    else:
        S = jax.lax.cond(S_fresh, lambda: S, lambda: column_sums(cp, P, pi))
    if n_rows is None:
        n_rows = jnp.asarray(order.shape[0], jnp.int32)
    x, P, pi, S = _psweep_call(
        cp, x, P, pi, cost, sched, order, n_rows, kappa, delta, theta,
        key, obj_amp, S, minimize, block_size=min(block_size, MAX_B),
        interpret=interpret,
    )
    new_viol = violated_mask(cp, x)
    return x, P, pi, S, new_viol, jnp.sum(new_viol.astype(jnp.int32), axis=0)

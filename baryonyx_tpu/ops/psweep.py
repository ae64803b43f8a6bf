"""Pallas TPU kernel for the Wedelin sweep — the hot loop, fused.

The jnp sweep (ops/sweep.py) is bounded by HBM traffic: every block makes
~15 passes over [B, Kr, R] temporaries plus one-hot matmuls against the
[n, R] column sums. This kernel keeps the solver state for one replica
group resident in VMEM for the duration of a sweep, so per-row work is a
handful of VMEM-local tile ops.

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
"row" of any per-variable array is whole (sublane, 128-lane) f32 tiles —
every dynamic gather/scatter moves full VPU tiles instead of strided
lane-vectors. The kernel runs on a grid over replica *groups* of
``Gc <= G`` lane-rows each: replicas are fully independent, so each grid
step solves its own [*, Gc, 128] slice with zero cross-step traffic.
Per step, the group's slices of the merged column sums S [n, Gc, 128]
(f32), assignment x (int32), multipliers pi [m, Gc, 128] and schedule
mask are DMA'd HBM -> VMEM once, all row updates run in VMEM, and the
slices stream back out. The preference matrix P [m, Kr, G, 128] never
fits VMEM and stays in HBM; each row block DMAs its rows' group slices
into a VMEM block buffer and back. Choosing Gc is a VMEM-budget problem
solved by ``plan()``: big instances (n ~ 10^4, Kr ~ 300: the benchmark-
suite class) run at Gc = 1-2, small ones at Gc = 8-16 (full native
tiles).

Row tables come in two flavors (``plan().big``): small instances
prefetch row_vars/row_factor/cost into SMEM (scalar-prefetch); large
ones keep them in HBM — chunked to [m, C, 128] rows so the slices are
DMA-tile-aligned — and DMA each block's rows into *SMEM* scratch
alongside the P rows (costs are pre-gathered per (row, slot) so no
[n]-indexed table is ever needed). SMEM, not VMEM: the slot loop reads
single table entries at dynamic indices, and Mosaic only allows dynamic
lane addressing in scalar memory (a VMEM vector.load requires
128-aligned lane indices — found the hard way on hardware).

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
term breaks ties at zero. Compiled kernels draw u from the hardware PRNG;
interpret mode (CPU CI) uses a splitmix-style counter hash of
(seed, group, row, slot, replica) since the interpreter lacks
pltpu.prng_* (same distribution, different stream).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baryonyx_tpu.ops.layout import CompiledProblem
from baryonyx_tpu.ops.sweep import column_sums, violated_mask

LANE = 128
MAX_B = 16  # block buffer rows held in VMEM
# Hard ceiling on padded row length: the real gates are the VMEM/SMEM
# budget checks in plan() (p_blk/keys_blk scale with Bb*Kr; table chunks
# with Kr/128). Kr=1408 validated on hardware at Gc=1/Bb=4 (S-invariant
# exact, jnp parity at the tie-noise floor); 2048 is the largest padded
# bucket whose Bb=2 block buffers can still fit beside an n~8k state.
MAX_KR = 2048
# quadratic costs ride a dense [n, n] neighbor matrix; past this the
# matmul + VMEM cost flips and the jnp sweep with per-slot gathers wins
QUAD_DENSE_MAX_N = 8192
# 16 MB physical VMEM per core; leave headroom for Mosaic temporaries
VMEM_BUDGET = 13 * 1024 * 1024
# SMEM is small; measured headroom for the scalar-prefetch tables at the
# scp 200x1000 class (~135 KB) — anything bigger streams tables from HBM
SMEM_BUDGET = 160 * 1024


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


class PsweepPlan(NamedTuple):
    Gc: int  # replica lane-rows per grid step
    Bb: int  # row-block size actually used (<= requested block_size)
    big: bool  # row tables streamed from HBM instead of SMEM prefetch


def _table_chunks(Kr: int) -> int:
    """Row tables DMA as [C, 128] chunks (the DMA path rejects other row
    shapes)."""
    return (Kr + LANE - 1) // LANE


def _vmem_bytes(cp: CompiledProblem, Gc: int, Bb: int, big: bool) -> int:
    tile = Gc * LANE * 4
    v = (
        cp.n * tile  # S_v f32
        + cp.n * tile  # x_v int32
        + cp.m * tile  # pi_v f32
        + cp.m * tile  # sched_v int32
        + 2 * Bb * cp.Kr * tile  # p_blk + keys_blk
        + 5 * Bb * tile  # thr/d/dpi block scratch (+ slack)
        + 4 * tile  # kappa/amp/delta/theta
        # batched phase-A loop carry: per-row running stats live across
        # the whole slot loop (cnt, J_bot mins, J_top maxes, mx_np, mn_p)
        + Bb * (3 + cp.J_bot + cp.J_top) * tile
    )
    if cp.has_quad:
        v += cp.n * tile  # cq_v f32 — quadratic cost sums
    return v


def _smem_table_bytes(cp: CompiledProblem, Bb: int) -> int:
    """Big-mode streamed table scratch lives in SMEM: int chunks (vars
    [+ factors]) + f32 costs per block row."""
    ti = 1 if cp.all_unit_pos else 2
    return Bb * (ti + 1) * _table_chunks(cp.Kr) * LANE * 4


def plan(
    cp: CompiledProblem, R: int, dtype, block_size: int
) -> Optional[PsweepPlan]:
    """Pick (Gc, Bb, big) for this instance, or None when the Pallas path
    cannot run it (callers fall back to ops/sweep.py)."""
    if dtype != jnp.float32:
        return None
    # below G=4 the [G, 128] tiles waste most VPU sublanes and the
    # boundary relayouts dominate — the jnp sweep is faster there
    if R % LANE != 0 or R < 4 * LANE:
        return None
    if cp.has_z:
        return None
    # quadratic costs ride a dense [n, n] neighbor matrix (see psweep());
    # cap the instance size so that matmul and the extra VMEM stay sane
    if cp.has_quad and cp.n > QUAD_DENSE_MAX_N:
        return None
    if not cp.sel_reduction_ok:
        return None
    if cp.Kr > MAX_KR:
        return None
    G = R // LANE
    m, n = cp.m, cp.n
    mp = ((m + block_size - 1) // block_size) * block_size + block_size
    smem_base = 4 * mp + 5 * 4 * m + 64  # order + rowmeta + seed/scal/nrows
    if smem_base > SMEM_BUDGET:
        return None
    small_tables = 2 * m * cp.Kr * 4 + n * 4
    big = smem_base + small_tables > SMEM_BUDGET
    bb_req = min(block_size, MAX_B)
    for Gc in (16, 8, 4, 2, 1):
        if Gc > G or G % Gc:
            continue
        for Bb in (bb_req, 8, 4, 2):
            if Bb > bb_req:
                continue
            if big and smem_base + _smem_table_bytes(cp, Bb) > SMEM_BUDGET:
                continue
            if _vmem_bytes(cp, Gc, Bb, big) <= VMEM_BUDGET:
                return PsweepPlan(Gc=Gc, Bb=Bb, big=big)
    return None


def supports(cp: CompiledProblem, R: int, dtype, block_size: int) -> bool:
    """Static eligibility for the Pallas path."""
    return plan(cp, R, dtype, block_size) is not None


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


def _make_kernel(
    cp: CompiledProblem,
    Gc: int,
    minimize: bool,
    Bb: int,
    big: bool,
    hash_noise: bool,
):
    m, n, Kr = cp.m, cp.n, cp.Kr
    J_bot, J_top = cp.J_bot, cp.J_top
    unit = cp.all_unit_pos  # pure 0/1 class: drop all factor-sign handling
    quad = cp.has_quad  # c(j, x) adds the CQ quadratic-sum tile (see psweep)
    f32 = jnp.float32
    u32 = jnp.uint32

    def kernel(*refs):
        it = iter(refs)
        # scalar-prefetch (SMEM)
        seed_ref = next(it)  # int32[2]
        order_ref = next(it)  # int32[mp]
        nrows_ref = next(it)  # int32[1]
        rowmeta_ref = next(it)  # int32[m, 5]: bmin, bmax, c_size, r_size, is_eq
        if not big:
            rowvars_ref = next(it)  # int32[m, Kr]
            rowfac_ref = next(it)  # int32[m, Kr] (0 = padded slot)
            cost_ref = next(it)  # f32[n]
        # HBM operands
        S_hbm = next(it)  # f32[n, G, 128]   (aliased out 0)
        x_hbm = next(it)  # int32[n, G, 128] (aliased out 1)
        pi_hbm = next(it)  # f32[m, G, 128]  (aliased out 2)
        kappa_hbm = next(it)  # f32[G, 128]
        amp_hbm = next(it)  # f32[G, 128]
        # per-replica hyperparameters (the on-device sweep axis,
        # SURVEY.md §2.9: "the sweep axis is just another vmap dimension")
        delta_hbm = next(it)  # f32[G, 128]
        theta_hbm = next(it)  # f32[G, 128]
        sched_hbm = next(it)  # int32[m, G, 128]
        P_hbm = next(it)  # f32[m, Kr, G, 128] (aliased out 3)
        if quad:
            CQ_hbm = next(it)  # f32[n, G, 128] — sweep-entry quad sums
        if big:
            # chunked tables: [m, ti*C, 128] int32 (vars, then factors
            # unless unit) and [m, C, 128] f32 (pre-gathered slot costs)
            ti_hbm = next(it)
            tf_hbm = next(it)
        # outputs (aliases of S, x, pi, P)
        S_out = next(it)
        x_out = next(it)
        pi_out = next(it)
        P_out = next(it)
        # VMEM scratch
        S_v = next(it)  # f32[n, Gc, 128]
        x_v = next(it)  # int32[n, Gc, 128]
        if quad:
            cq_v = next(it)  # f32[n, Gc, 128]
        pi_v = next(it)  # f32[m, Gc, 128]
        sched_v = next(it)  # int32[m, Gc, 128]
        kap_v = next(it)  # f32[Gc, 128]
        amp_v = next(it)  # f32[Gc, 128]
        del_v = next(it)  # f32[Gc, 128]
        the_v = next(it)  # f32[Gc, 128]
        p_blk = next(it)  # f32[Bb, Kr, Gc, 128]
        keys_blk = next(it)  # f32[Bb, Kr, Gc, 128] — noised selection keys
        thr_blk = next(it)  # f32[Bb, Gc, 128] — selection threshold per row
        d_blk = next(it)  # f32[Bb, Gc, 128]
        dpi_blk = next(it)  # f32[Bb, Gc, 128]
        sem_st = next(it)  # DMA[8] — state in/out
        sem_in = next(it)  # DMA[Bb]
        sem_out = next(it)  # DMA[Bb]
        if big:
            ti_blk = next(it)  # int32[Bb, ti*C, 128]
            tf_blk = next(it)  # f32[Bb, C, 128]
            sem_tab = next(it)  # DMA[Bb, 2]
            C = _table_chunks(Kr)

        g = pl.program_id(0)
        gofs = g * Gc
        gsl = pl.ds(gofs, Gc)

        if not hash_noise:
            pltpu.prng_seed(seed_ref[0], seed_ref[1] + g)
        else:
            # per-replica counter tile for the splitmix hash
            rep_iota = (
                jax.lax.broadcasted_iota(u32, (Gc, LANE), 0) * LANE
                + jax.lax.broadcasted_iota(u32, (Gc, LANE), 1)
                + jnp.uint32(gofs * LANE)
            )
            seed_u = seed_ref[0].astype(u32) * jnp.uint32(0x9E3779B9) + seed_ref[
                1
            ].astype(u32)

        def draw_u(k, s):
            """Uniform (Gc, 128) tile in [0, 1)."""
            if not hash_noise:
                bits = pltpu.prng_random_bits((Gc, LANE))
                return (bits >> 8).astype(f32) * jnp.float32(2**-24)
            h = (
                rep_iota * jnp.uint32(0x85EBCA6B)
                + seed_u
                + k.astype(u32) * jnp.uint32(0xC2B2AE35)
                + s.astype(u32) * jnp.uint32(0x27D4EB2F)
            )
            h = h ^ (h >> 15)
            h = h * jnp.uint32(0x2C1B3C6D)
            h = h ^ (h >> 12)
            h = h * jnp.uint32(0x297A2D39)
            h = h ^ (h >> 15)
            return (h >> 8).astype(f32) * jnp.float32(2**-24)

        # ---- stream this group's state slices into VMEM
        cps = [
            pltpu.make_async_copy(S_hbm.at[:, gsl], S_v, sem_st.at[0]),
            pltpu.make_async_copy(x_hbm.at[:, gsl], x_v, sem_st.at[1]),
            pltpu.make_async_copy(pi_hbm.at[:, gsl], pi_v, sem_st.at[2]),
            pltpu.make_async_copy(sched_hbm.at[:, gsl], sched_v, sem_st.at[3]),
            pltpu.make_async_copy(kappa_hbm.at[gsl], kap_v, sem_st.at[4]),
            pltpu.make_async_copy(amp_hbm.at[gsl], amp_v, sem_st.at[5]),
            pltpu.make_async_copy(delta_hbm.at[gsl], del_v, sem_st.at[6]),
            pltpu.make_async_copy(theta_hbm.at[gsl], the_v, sem_st.at[7]),
        ]
        if quad:
            cps.append(
                pltpu.make_async_copy(CQ_hbm.at[:, gsl], cq_v, sem_st.at[8])
            )
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

        delta = del_v[:]  # [Gc, 128] — per-replica
        theta = the_v[:]
        kap = kap_v[:]
        kp = kap / (1.0 - kap)  # [Gc, 128]
        amp = amp_v[:]
        inf = jnp.float32(jnp.inf)

        def block_body(blk, _):
            base = blk * Bb

            # start all row DMAs for the block
            for b in range(Bb):
                k = order_ref[base + b]

                @pl.when(k < m)
                def _():
                    pltpu.make_async_copy(
                        P_hbm.at[k, :, gsl], p_blk.at[b], sem_in.at[b]
                    ).start()
                    if big:
                        pltpu.make_async_copy(
                            ti_hbm.at[k], ti_blk.at[b], sem_tab.at[b, 0]
                        ).start()
                        pltpu.make_async_copy(
                            tf_hbm.at[k], tf_blk.at[b], sem_tab.at[b, 1]
                        ).start()

            # ---- phase A: decisions against block-entry S.
            # All Bb rows are interleaved in ONE slot loop: each iteration
            # advances every row's running statistics by one slot. The
            # per-row chains are independent, so the VPU pipelines Bb
            # loads/FMAs per iteration instead of stalling on one row's
            # serial dependency — the win that matters at Gc=1 (big
            # instances), where each op touches a single (1, 128) tile and
            # per-op latency dominates a row-sequential loop. Per-row math
            # is unchanged (Jacobi-within-block semantics identical).
            ks = [order_ref[base + b] for b in range(Bb)]
            kc = [jnp.minimum(k, m - 1) for k in ks]  # clamped meta reads
            for b in range(Bb):
                @pl.when(ks[b] < m)
                def _(b=b):
                    pltpu.make_async_copy(
                        P_hbm.at[ks[b], :, gsl], p_blk.at[b], sem_in.at[b]
                    ).wait()
                    if big:
                        pltpu.make_async_copy(
                            ti_hbm.at[ks[b]], ti_blk.at[b], sem_tab.at[b, 0]
                        ).wait()
                        pltpu.make_async_copy(
                            tf_hbm.at[ks[b]], tf_blk.at[b], sem_tab.at[b, 1]
                        ).wait()

            # rsz = 0 disables padding rows (k >= m): their slots never
            # run and their scratch writes are ignored by phase B
            rszs = [
                jnp.where(ks[b] < m, rowmeta_ref[kc[b], 3], 0)
                for b in range(Bb)
            ]
            max_rsz = rszs[0]
            for b in range(1, Bb):
                max_rsz = jnp.maximum(max_rsz, rszs[b])

            def slot_vf(b, s):
                if big:
                    sc, sl = s // LANE, s % LANE
                    # clamp: dead slots / stale scratch may hold garbage
                    j = jnp.clip(ti_blk[b, sc, sl], 0, n - 1)
                    cj = tf_blk[b, sc, sl]
                    af = None if unit else ti_blk[b, C + sc, sl].astype(f32)
                else:
                    j = rowvars_ref[kc[b], s]
                    cj = cost_ref[j]
                    af = None if unit else rowfac_ref[kc[b], s].astype(f32)
                if quad:
                    # c(j, x) = c_j + quadratic neighbor sum, with x as of
                    # sweep entry (reference: quadratic_cost_type,
                    # itm-common.hpp:1404-1416; staleness note in psweep())
                    cj = cj + cq_v[j]
                return j, cj, af

            def slot_stats(s, carry):
                out = []
                for b in range(Bb):
                    cnt, bots, tops, mx_np, mn_p = carry[b]
                    live = s < rszs[b]  # scalar: this row still has slots
                    j, cj, af = slot_vf(b, s)
                    Sj = S_v[j]  # [Gc, 128]
                    pr = p_blk[b, s]
                    if unit:
                        r = cj - (Sj + (theta - 1.0) * pr)
                    else:
                        r = cj - (Sj + af * (theta - 1.0) * pr)
                        r = jnp.where(af < 0, -r, r)
                    r = r + amp * cj
                    sv = r if minimize else -r
                    u = draw_u(ks[b], s)
                    sv = sv * (1.0 + (u - 0.5) * 2e-6) + (u - 0.5) * (
                        delta * 1e-3
                    )
                    keys_blk[b, s] = sv  # dead-slot writes never read back
                    out.append((
                        jnp.where(live, cnt + (sv <= 0).astype(jnp.int32), cnt),
                        [jnp.where(live, nb, ob)
                         for nb, ob in zip(_insert_min(bots, sv), bots)],
                        [jnp.where(live, nt, ot)
                         for nt, ot in zip(_insert_max(tops, sv), tops)],
                        jnp.where(
                            live,
                            jnp.maximum(mx_np, jnp.where(sv <= 0, sv, -inf)),
                            mx_np,
                        ),
                        jnp.where(
                            live,
                            jnp.minimum(mn_p, jnp.where(sv > 0, sv, inf)),
                            mn_p,
                        ),
                    ))
                return tuple(out)

            init_row = (
                jnp.zeros((Gc, LANE), jnp.int32),
                [jnp.full((Gc, LANE), inf, f32) for _ in range(J_bot)],
                [jnp.full((Gc, LANE), -inf, f32) for _ in range(J_top)],
                jnp.full((Gc, LANE), -inf, f32),
                jnp.full((Gc, LANE), inf, f32),
            )
            carry = jax.lax.fori_loop(
                0, max_rsz, slot_stats, tuple(init_row for _ in range(Bb))
            )

            # selection per row (see ops/sweep.py); padding rows write
            # garbage scratch that phase B never applies
            for b in range(Bb):
                cnt, bots, tops, mx_np, mn_p = carry[b]
                bmin = rowmeta_ref[kc[b], 0]
                bmax = rowmeta_ref[kc[b], 1]
                csz = rowmeta_ref[kc[b], 2]
                rsz = rszs[b]
                iseq = rowmeta_ref[kc[b], 4]
                valid = sched_v[kc[b]] > 0  # [Gc, 128]

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
                    valid = sched_v[k] > 0
                    d = d_blk[b]
                    dpi = dpi_blk[b]
                    thr = thr_blk[b]

                    def slot_apply(s, _):
                        if big:
                            sc, sl = s // LANE, s % LANE
                            j = ti_blk[b, sc, sl]
                            af = None if unit else ti_blk[b, C + sc, sl].astype(f32)
                        else:
                            j = rowvars_ref[k, s]
                            af = None if unit else rowfac_ref[k, s].astype(f32)
                        chosen = keys_blk[b, s] <= thr
                        sgn = jnp.where(chosen, 1.0, -1.0)
                        pr = p_blk[b, s]
                        if unit:
                            new_p = theta * pr + sgn * d
                            new_p = jnp.where(valid, new_p, pr)
                            p_blk[b, s] = new_p
                            S_v[j] = S_v[j] + (dpi + new_p - pr)
                            bit = chosen.astype(jnp.int32)
                        else:
                            new_p = (
                                theta * pr
                                + sgn * jnp.where(af < 0, -1.0, 1.0) * d
                            )
                            new_p = jnp.where(valid, new_p, pr)
                            p_blk[b, s] = new_p
                            S_v[j] = S_v[j] + af * (dpi + new_p - pr)
                            bit = (sgn * af > 0).astype(jnp.int32)
                        x_v[j] = jnp.where(valid, bit, x_v[j])
                        return 0

                    jax.lax.fori_loop(0, rsz, slot_apply, 0)
                    pi_v[k] = pi_v[k] + dpi
                    pltpu.make_async_copy(
                        p_blk.at[b], P_out.at[k, :, gsl], sem_out.at[b]
                    ).start()

            for b in range(Bb):
                k = order_ref[base + b]

                @pl.when(k < m)
                def _():
                    pltpu.make_async_copy(
                        p_blk.at[b], P_out.at[k, :, gsl], sem_out.at[b]
                    ).wait()

            return 0

        n_blocks = (nrows_ref[0] + Bb - 1) // Bb
        jax.lax.fori_loop(0, n_blocks, block_body, 0)

        # ---- stream the state slices back out
        cpo = [
            pltpu.make_async_copy(S_v, S_out.at[:, gsl], sem_st.at[0]),
            pltpu.make_async_copy(x_v, x_out.at[:, gsl], sem_st.at[1]),
            pltpu.make_async_copy(pi_v, pi_out.at[:, gsl], sem_st.at[2]),
        ]
        for c in cpo:
            c.start()
        for c in cpo:
            c.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("minimize", "kplan", "interpret")
)
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
    CQ: Optional[jax.Array],  # f32[n, R] — quadratic cost sums (has_quad)
    minimize: bool,
    kplan: PsweepPlan,
    interpret: bool = False,
):
    m, n, Kr = cp.m, cp.n, cp.Kr
    R = pi.shape[-1]
    G = R // LANE
    Gc, Bb, big = kplan.Gc, kplan.Bb, kplan.big
    Gg = G // Gc
    f32 = jnp.float32
    unit = cp.all_unit_pos

    S3 = S.reshape(n, G, LANE)
    x3 = x.reshape(n, G, LANE)
    pi3 = pi.reshape(m, G, LANE)
    P4 = P.reshape(m, Kr, G, LANE)
    sched3 = sched.astype(jnp.int32).reshape(m, G, LANE)
    kap = kappa.astype(f32).reshape(G, LANE)
    ampv = obj_amp.astype(f32).reshape(G, LANE)
    # delta/theta accept scalars or per-replica [R] (the on-device
    # hyperparameter-sweep axis); either becomes a [G, 128] lane tile
    deltav = jnp.broadcast_to(delta.astype(f32), (R,)).reshape(G, LANE)
    thetav = jnp.broadcast_to(theta.astype(f32), (R,)).reshape(G, LANE)

    seed = jax.random.key_data(jax.random.fold_in(key, 7)).astype(jnp.uint32)
    seed = seed.reshape(-1)[:2].astype(jnp.int32)
    rowmeta = jnp.stack(
        [cp.bmin, cp.bmax, cp.neg_count, cp.r_size, cp.is_eq.astype(jnp.int32)],
        axis=1,
    )

    # pad the order so every block has Bb entries (sentinel m = skip)
    mp = order.shape[0]
    mp_pad = ((mp + Bb - 1) // Bb) * Bb
    if mp_pad != mp:
        order = jnp.concatenate(
            [order, jnp.full((mp_pad - mp,), m, jnp.int32)]
        )

    kernel = _make_kernel(
        cp, Gc, minimize, Bb, big, hash_noise=interpret
    )
    scalar_inputs = [seed, order.astype(jnp.int32), jnp.asarray(
        n_rows, jnp.int32
    ).reshape(1), rowmeta]
    tensor_inputs = [S3, x3, pi3, kap, ampv, deltav, thetav, sched3, P4]
    if cp.has_quad:
        tensor_inputs.append(CQ.astype(f32).reshape(n, G, LANE))
    rv = cp.row_vars
    rf = cp.row_factor.astype(jnp.int32)
    C = _table_chunks(Kr)
    if not big:
        scalar_inputs += [rv, rf, cost.astype(f32)]
    else:
        pad = C * LANE - Kr
        def chunked(t):
            return jnp.pad(t, ((0, 0), (0, pad))).reshape(m, C, LANE)
        ti_parts = [chunked(rv)]
        if not unit:
            ti_parts.append(chunked(rf))
        tab_i = jnp.concatenate(ti_parts, axis=1)  # [m, ti*C, 128]
        rcost = jnp.where(cp.row_mask, cost.astype(f32)[rv], 0.0)  # [m, Kr]
        tab_f = chunked(rcost)
        tensor_inputs += [tab_i, tab_f]

    n_scalar = len(scalar_inputs)
    n_tensor = len(tensor_inputs)
    # operand index of S after the scalar-prefetch args is n_scalar; the
    # aliased inputs are S, x, pi (first three tensors) and P (ninth)
    aliases = {
        n_scalar + 0: 0,
        n_scalar + 1: 1,
        n_scalar + 2: 2,
        n_scalar + 8: 3,
    }

    scratch = [
        pltpu.VMEM((n, Gc, LANE), f32),  # S_v
        pltpu.VMEM((n, Gc, LANE), jnp.int32),  # x_v
    ]
    if cp.has_quad:
        scratch.append(pltpu.VMEM((n, Gc, LANE), f32))  # cq_v
    scratch += [
        pltpu.VMEM((m, Gc, LANE), f32),  # pi_v
        pltpu.VMEM((m, Gc, LANE), jnp.int32),  # sched_v
        pltpu.VMEM((Gc, LANE), f32),  # kap_v
        pltpu.VMEM((Gc, LANE), f32),  # amp_v
        pltpu.VMEM((Gc, LANE), f32),  # del_v
        pltpu.VMEM((Gc, LANE), f32),  # the_v
        pltpu.VMEM((Bb, Kr, Gc, LANE), f32),  # p_blk
        pltpu.VMEM((Bb, Kr, Gc, LANE), f32),  # keys_blk
        pltpu.VMEM((Bb, Gc, LANE), f32),  # thr_blk
        pltpu.VMEM((Bb, Gc, LANE), f32),  # d_blk
        pltpu.VMEM((Bb, Gc, LANE), f32),  # dpi_blk
        pltpu.SemaphoreType.DMA((9,)),  # sem_st (slot 8: CQ when has_quad)
        pltpu.SemaphoreType.DMA((Bb,)),  # sem_in
        pltpu.SemaphoreType.DMA((Bb,)),  # sem_out
    ]
    if big:
        ti = 1 if unit else 2
        scratch += [
            pltpu.SMEM((Bb, ti * C, LANE), jnp.int32),  # ti_blk
            pltpu.SMEM((Bb, C, LANE), f32),  # tf_blk
            pltpu.SemaphoreType.DMA((Bb, 2)),  # sem_tab
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(Gg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_tensor,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        scratch_shapes=scratch,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, G, LANE), f32),
        jax.ShapeDtypeStruct((n, G, LANE), jnp.int32),
        jax.ShapeDtypeStruct((m, G, LANE), f32),
        jax.ShapeDtypeStruct((m, Kr, G, LANE), f32),
    ]
    S3, x3, pi3, P4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*scalar_inputs, *tensor_inputs)
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
    quad_fac: Optional[jax.Array] = None,  # unused (kept for signature parity)
    quad_mat: Optional[jax.Array] = None,  # f[n, n] dense normalized factors
    S: Optional[jax.Array] = None,
    S_fresh: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple:
    """Drop-in replacement for ops.sweep:sweep on supported problems.

    Same contract: returns (x, P, pi, S, new_violated, remaining).

    Quadratic costs: callers pass ``quad_mat`` (dense [n, n] of normalized
    quadratic factors, diagonal = square terms). The kernel reads
    c(j, x) = c_j + CQ[j] with CQ = quad_mat @ x computed once at sweep
    ENTRY — one MXU matmul instead of per-slot neighbor gathers. The jnp
    sweep refreshes c(j, x) at block granularity instead; both are stale
    relative to the reference's row-sequential walk, and the coarser
    sweep-level staleness follows the same block-Jacobi argument as the
    module docstring (prices decorrelate decisions; parity on fixtures is
    asserted where the two granularities coincide, tests/test_psweep.py)."""
    assert not random_solver
    assert (quad_mat is not None) == cp.has_quad
    kplan = plan(cp, pi.shape[-1], P.dtype, block_size)
    assert kplan is not None, "psweep called on an unsupported instance"
    dtype = P.dtype
    delta = jnp.asarray(delta, dtype)
    theta = jnp.asarray(theta, dtype)
    if S is None:
        S = column_sums(cp, P, pi)
    else:
        S = jax.lax.cond(S_fresh, lambda: S, lambda: column_sums(cp, P, pi))
    if n_rows is None:
        n_rows = jnp.asarray(order.shape[0], jnp.int32)
    CQ = None
    if cp.has_quad:
        CQ = jnp.dot(
            quad_mat, x.astype(quad_mat.dtype),
            preferred_element_type=quad_mat.dtype,
        )
    x, P, pi, S = _psweep_call(
        cp, x, P, pi, cost, sched, order, n_rows, kappa, delta, theta,
        key, obj_amp, S, CQ, minimize, kplan=kplan, interpret=interpret,
    )
    new_viol = violated_mask(cp, x)
    return x, P, pi, S, new_viol, jnp.sum(new_viol.astype(jnp.int32), axis=0)

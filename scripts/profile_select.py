"""Benchmark sort-free selection alternatives for the sweep on TPU.

The sweep needs, per (row, lane): rank-based selection quantities.
Candidates:
  A) lax.sort along axis 1 (current)
  B) fused all-pairs rank counting (broadcast compare + reduce)
  C) transpose -> sort minor axis -> transpose
  D) transpose -> top_k minor axis
"""

import functools
import time

import jax
import jax.numpy as jnp


def timeit(step, init, n1=20, n2=120):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(c0, steps):
        c, _ = jax.lax.scan(lambda c, _: (step(c), None), c0, None, length=steps)
        return jnp.sum(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32).ravel()[:8])

    def fetch(steps):
        return float(run(init, steps=steps))

    fetch(n1); fetch(n2)
    t = time.perf_counter(); fetch(n1); t1 = time.perf_counter() - t
    t = time.perf_counter(); fetch(n2); t2 = time.perf_counter() - t
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    B, Kr, R = 50, 48, 1024
    key = jax.random.key(0)
    r0 = jax.random.normal(key, (B, Kr, R), jnp.float32)
    damp = jnp.float32(0.999)

    def a_sort(v):
        sv = jax.lax.sort(v, dimension=1)
        return v * damp + 1e-7 * sv

    def b_rank(v):
        # rank_e = #{e' : v_e' < v_e}; keys pre-noised distinct.
        lt = (v[:, None, :, :] < v[:, :, None, :]).astype(jnp.float32)
        ranks = jnp.sum(lt, axis=2)  # [B, Kr, R]
        # selection quantities from ranks (sel row-constant toy: 3)
        sel = jnp.int32(3)
        rsel = jnp.sum(jnp.where(ranks == sel, v, 0), axis=1)
        chosen = ranks <= sel
        return v * damp + 1e-7 * (rsel[:, None, :] + chosen)

    def b_rank_int(v):
        lt = v[:, None, :, :] < v[:, :, None, :]
        ranks = jnp.sum(lt, axis=2, dtype=jnp.int32)
        sel = jnp.int32(3)
        rsel = jnp.sum(jnp.where(ranks == sel, v, 0), axis=1)
        chosen = ranks <= sel
        return v * damp + 1e-7 * (rsel[:, None, :] + chosen)

    def c_transpose_sort(v):
        vt = jnp.swapaxes(v, 1, 2)  # [B, R, Kr]
        sv = jax.lax.sort(vt, dimension=2)
        return v * damp + 1e-7 * jnp.swapaxes(sv, 1, 2)

    def d_topk(v):
        vt = jnp.swapaxes(v, 1, 2)
        sv, _ = jax.lax.top_k(-vt, Kr)
        return v * damp + 1e-7 * jnp.swapaxes(-sv, 1, 2)

    # E) cheap reductions only (lower bound for any selection impl)
    def e_reductions(v):
        cnt = jnp.sum((v <= 0).astype(jnp.int32), axis=1)
        mx = jnp.max(jnp.where(v <= 0, v, -jnp.inf), axis=1)
        mn = jnp.min(jnp.where(v > 0, v, jnp.inf), axis=1)
        return v * damp + 1e-7 * (cnt + mx + mn)[:, None, :]

    for name, f in [
        ("A lax.sort axis1", a_sort),
        ("B all-pairs rank f32", b_rank),
        ("B all-pairs rank int32", b_rank_int),
        ("C transpose+sort", c_transpose_sort),
        ("D transpose+top_k", d_topk),
        ("E reductions only", e_reductions),
    ]:
        t = timeit(f, r0)
        print(f"{name:26s} {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()

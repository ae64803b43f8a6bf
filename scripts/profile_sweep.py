"""Ablation microbenchmarks for the sweep's component costs on the real
TPU. Every op's output feeds the scan carry so XLA cannot hoist it."""

import functools
import time

import jax
import jax.numpy as jnp


def timeit(step, init, n1=20, n2=120):
    """step: carry -> carry. Returns seconds/iteration via scan slope."""

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(c0, steps):
        def body(c, _):
            c = step(c)
            return c, None

        c, _ = jax.lax.scan(body, c0, None, length=steps)
        return jnp.sum(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32).ravel()[:8])

    def fetch(steps):
        return float(run(init, steps=steps))

    fetch(n1)
    fetch(n2)
    t = time.perf_counter()
    fetch(n1)
    t1 = time.perf_counter() - t
    t = time.perf_counter()
    fetch(n2)
    t2 = time.perf_counter() - t
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    B, Kr, R, n, m = 50, 48, 1024, 1024, 256
    E = B * Kr
    key = jax.random.key(0)
    r0 = jax.random.normal(key, (B, Kr, R), jnp.float32)
    S0 = jax.random.normal(key, (n, R), jnp.float32)
    idx0 = jax.random.randint(key, (E,), 0, n)
    A = jax.random.normal(key, (m, n), jnp.float32) * 0.01
    damp = jnp.float32(0.999)

    res = []

    # sort: carry the array, perturb so each iteration sorts fresh data
    res.append((
        "lax.sort dim=1",
        timeit(lambda v: jax.lax.sort(v * damp + 1e-6, dimension=1), r0),
        6,
    ))

    def rank_fn(v):
        rk = jnp.zeros(v.shape, jnp.int32)
        for s in range(1, Kr):
            rk = rk + (jnp.roll(v, s, axis=1) < v)
        return v * damp + rk.astype(v.dtype) * 1e-9

    res.append(("rank-count rolls", timeit(rank_fn, r0), 6))

    # gather: idx depends on carry (cheap recompute), result folds into S
    def oh_gather(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1]) * 0)) % n
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (E, n), 1) == idx[:, None]
        ).astype(S.dtype)
        g = jnp.dot(oh, S, preferred_element_type=S.dtype)  # [E, R]
        return S * damp + 1e-6 * g[:n]

    res.append(("one-hot gather+dot", timeit(oh_gather, S0), 12))

    def oh_scatter(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1]) * 0)) % n
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (n, E), 0) == idx[None, :]
        ).astype(S.dtype)
        u = S[idx] * 1e-6  # also a gather! isolate below
        return S * damp + jnp.dot(oh, u, preferred_element_type=S.dtype)

    res.append(("one-hot gather+scatter", timeit(oh_scatter, S0), 12))

    def xla_gather(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1]) * 0)) % n
        return S * damp + 1e-6 * S[idx][:n]

    res.append(("xla gather S[idx]", timeit(xla_gather, S0), 12))

    def xla_scatter(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1]) * 0)) % n
        return (S * damp).at[idx].add(S[idx] * 1e-6, mode="drop")

    res.append(("xla gather+scatter", timeit(xla_scatter, S0), 12))

    S3 = S0.reshape(n, 8, 128)

    def xla_gather3(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1, 0]) * 0)) % n
        return S * damp + 1e-6 * S[idx][:n]

    res.append(("xla gather tiled[n,8,128]", timeit(xla_gather3, S3), 12))

    def xla_scatter3(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1, 0]) * 0)) % n
        return (S * damp).at[idx].add(S[idx] * 1e-6, mode="drop")

    res.append(("xla gather+scatter tiled", timeit(xla_scatter3, S3), 12))

    def scatter_max(S):
        idx = (idx0 + jnp.int32(jnp.sum(S[0, :1]) * 0)) % n
        enc = (S[idx] * 1e3).astype(jnp.int32)
        t = jnp.full((n, R), -1, jnp.int32).at[idx].max(enc, mode="drop")
        return S * damp + 1e-9 * t.astype(jnp.float32)

    res.append(("x gather+scatter-max", timeit(scatter_max, S0), 6))

    def act(x):
        a = jnp.dot(A, x, preferred_element_type=jnp.float32)  # [m, R]
        return x * damp + 1e-6 * jnp.pad(a, ((0, n - m), (0, 0)))

    res.append(("dense act [m,n]@[n,R]", timeit(act, S0), 1))

    total = 0.0
    for name, t, per in res:
        total += t * per
        print(f"{name:28s} {t*1e6:9.1f} us  x{per}/sweep = {t*per*1e3:7.3f} ms")
    print(f"(sum of parts ~{total*1e3:.2f} ms/sweep; measured full sweep ~4.9 ms)")


if __name__ == "__main__":
    main()

"""Runtime configuration for the TPU toolchain.

``setup_cache`` points JAX's persistent compilation cache at a repo-local
directory so the expensive first compile of the sweep/evolve executables
(minutes through the remote-compile tunnel) is paid once per problem
shape, not once per process.
"""

from __future__ import annotations

import os


_done = False


def setup_cache(path: str | None = None) -> None:
    global _done
    if _done and path is None:
        return
    _done = True
    import jax

    # scope by the RESOLVED backend, not the JAX_PLATFORMS env var:
    # executables cached through the remote-compile tunnel carry that
    # machine's CPU features and must not be loaded by local CPU
    # processes (SIGILL risk) — and the env var lies when jax was
    # imported before it was set (e.g. an interpreter-level preimport),
    # which is exactly when the two would get mixed into one directory.
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "default"
    # repo-local by default: /tmp is wiped between sessions on shared
    # machines, silently discarding every compiled executable and making
    # each fresh process pay minutes of tunnel-compile latency again
    # (measured: 275-735 s wall for 20 s solves). A directory next to the
    # package survives with the checkout.
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f".jax_cache_{platform}",
    )
    cache_dir = path or os.environ.get("BARYONYX_TPU_CACHE", default_dir)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERY executable: through the remote-compile tunnel even
        # sub-second compiles cost multi-second round trips, and a solve
        # dispatches dozens of small jits (population init, hashing,
        # violated-mask) before the big evolve/sweep ones — filtering them
        # out made every fresh process pay minutes of latency again
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the persistent cache knobs

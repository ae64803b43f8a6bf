"""Multi-host (multi-process) initialization — the DCN story.

The reference's only parallelism is one process of std::threads
(SURVEY.md §2.9: no MPI/NCCL anywhere); its TPU-native equivalent spans
hosts: ``jax.distributed.initialize`` connects the processes, every
process runs the same optimize program over the GLOBAL device mesh, and
the existing shard_map collectives (the per-chunk top-K population
exchange, the cycle pmax, the flip-counter psum — solver/optimize.py)
ride ICI within a slice and DCN across hosts with no code change: the
mesh is simply built from ``jax.devices()`` (all processes' devices).

Host-side orchestration differences under multi-process SPMD are handled
in solver/optimize.py: chunk statistics are fetched through a jitted
function with replicated output sharding (a raw index into a sharded
global array is not addressable from every process), and final
extraction gathers the population shards with
``multihost_utils.process_allgather``.

Validated by scripts/multihost_dryrun.py: N CPU processes x M virtual
devices each run the full optimize end-to-end on one global mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the fleet (idempotent).

    Arguments fall back to the BARYONYX_COORDINATOR / BARYONYX_NUM_PROCS /
    BARYONYX_PROC_ID environment variables, then to JAX's own cluster
    auto-detection (TPU pods set the cluster env automatically, so on a
    real pod calling ``init_distributed()`` with no arguments or env is
    correct)."""
    # NOTE: jax.process_count() would itself initialize the XLA backend,
    # which must not happen before jax.distributed.initialize — probe the
    # distributed client state instead
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "BARYONYX_COORDINATOR"
    )
    if num_processes is None and "BARYONYX_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["BARYONYX_NUM_PROCS"])
    if process_id is None and "BARYONYX_PROC_ID" in os.environ:
        process_id = int(os.environ["BARYONYX_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def gather_to_host(x, tiled: bool = True):
    """Fetch a (possibly non-fully-addressable) global array as a numpy
    array present on every process."""
    import numpy as np

    if not is_multiprocess() or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=tiled))

"""Device mesh + sharding layout for the batched optimizer.

The multi-start replica axis R (trailing axis of every replica-state
array) shards across the mesh axis ``r``; the population and problem
arrays replicate. Under jit, the per-step population insert then induces
one all-gather of the candidate solutions (a [R, n] int32 tensor) over
ICI, after which every device computes an identical population update —
the TPU-native equivalent of the reference's mutex-shared ``storage``
(reference: itm-optimizer-common.hpp:97-99,240-300; SURVEY.md
section 2.9). The exchange is per-step, tighter than the reference's
1 Hz polling loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``r``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("r",))


def shard_opt_state(state, mesh: Mesh):
    """Place an OptState so replica-state arrays shard on their trailing
    R axis and everything else replicates."""
    from baryonyx_tpu.solver.optimize import OptState, ReplicaState

    def last_axis_sharded(x: jax.Array) -> jax.Array:
        spec = P(*([None] * (x.ndim - 1) + ["r"]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def replicated(x: jax.Array) -> jax.Array:
        return jax.device_put(x, NamedSharding(mesh, P()))

    rs = state.replicas
    new_rs = ReplicaState(*[last_axis_sharded(a) for a in rs])
    pop = jax.tree_util.tree_map(replicated, state.pop)
    return OptState(
        new_rs,
        pop,
        replicated(state.key),
        replicated(state.order_code),
        replicated(state.sweeps),
    )

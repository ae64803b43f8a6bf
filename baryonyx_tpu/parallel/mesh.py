"""Device mesh + sharding layout for the batched optimizer.

The multi-start replica axis R (trailing axis of every replica-state
array) shards across the mesh axis ``r``; each device also owns a full
local population shard (dim 0 of the [D*P, n] global population) that
evolves independently within a host chunk. The only in-chunk collective
is the cycle-policy pmax; once per chunk, every device's top-K
(x, value, remaining) tuples all-gather over ICI and insert into every
shard (optimize.py: _evolve_impl tail) — the TPU-native equivalent of
the reference's mutex-shared ``storage`` polled at ~1 Hz (reference:
itm-optimizer-common.hpp:97-99,240-300,836-857; SURVEY.md section 2.9).
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
    R axis, the population (pre-tiled to [D*P, ...]) shards on dim 0, and
    everything else replicates."""
    from baryonyx_tpu.solver.optimize import OptState, ReplicaState

    def last_axis_sharded(x: jax.Array) -> jax.Array:
        spec = P(*([None] * (x.ndim - 1) + ["r"]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def first_axis_sharded(x: jax.Array) -> jax.Array:
        spec = P(*(["r"] + [None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def replicated(x: jax.Array) -> jax.Array:
        return jax.device_put(x, NamedSharding(mesh, P()))

    rs = state.replicas
    new_rs = ReplicaState(*[last_axis_sharded(a) for a in rs])
    pop = jax.tree_util.tree_map(first_axis_sharded, state.pop)
    return OptState(
        new_rs,
        pop,
        replicated(state.key),
        replicated(state.order_code),
        replicated(state.sweeps),
        replicated(state.flips),
    )

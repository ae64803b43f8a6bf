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
import jax.numpy as jnp
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

    # multi-process: device_put to a global (non-fully-addressable)
    # sharding only accepts HOST data — every process materializes its
    # local shards from the (identical) host value. Committed device
    # arrays would need cross-process transfers, which device_put refuses.
    multiproc = jax.process_count() > 1

    def stage(x):
        if multiproc and not isinstance(x, np.ndarray):
            if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                return jax.random.key_data(x), True
            return np.asarray(x), False
        return x, False

    def put(x, spec):
        x, was_key = stage(x)
        out = jax.device_put(x, NamedSharding(mesh, spec))
        if was_key:
            out = jax.random.wrap_key_data(out)
        return out

    def last_axis_sharded(x: jax.Array) -> jax.Array:
        return put(x, P(*([None] * (x.ndim - 1) + ["r"])))

    def first_axis_sharded(x: jax.Array) -> jax.Array:
        return put(x, P(*(["r"] + [None] * (x.ndim - 1))))

    def replicated(x: jax.Array) -> jax.Array:
        return put(x, P())

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

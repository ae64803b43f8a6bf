"""Checkpoint/resume for the optimize-mode population.

The reference has no mid-run checkpointing; its persistence is the .sol
result file (SURVEY.md section 5 "Checkpoint / resume" — flags preemption
recovery as new TPU-native scope). Here the population (the evolutionary
state that matters across restarts) round-trips through a .npz file, so a
preempted optimize resumes from its incumbents instead of from scratch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from baryonyx_tpu.solver.population import Population


def save_population(path: str, pop: Population, meta: Optional[dict] = None) -> None:
    np.savez_compressed(
        path,
        x=np.asarray(pop.x),
        value=np.asarray(pop.value),
        remaining=np.asarray(pop.remaining),
        hash=np.asarray(pop.hash),
        **{f"meta_{k}": v for k, v in (meta or {}).items()},
    )


def load_population(path: str) -> Population:
    import jax.numpy as jnp

    data = np.load(path)
    return Population(
        x=jnp.asarray(data["x"]),
        value=jnp.asarray(data["value"]),
        remaining=jnp.asarray(data["remaining"]),
        hash=jnp.asarray(data["hash"]),
    )

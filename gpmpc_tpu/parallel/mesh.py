"""Device-mesh helpers for scenario fan-out.

The reference is strictly single-process single-device (SURVEY.md §2.2 — no
collectives, no torch.distributed anywhere); scaling here is a new capability:
thousands of independent GP-MPC solves (initial states x gamma sweeps x
hyperparameter draws) are data-parallel across a `Mesh` 'batch' axis, with an
optional 'model' axis reserved for sharded kernel-matrix linear algebra at
large N. Collectives are XLA's (psum etc.) over ICI — inserted automatically by
SPMD partitioning from NamedSharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = 'batch'
MODEL_AXIS = 'model'


def make_mesh(n_batch: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over (batch, model). Defaults to all devices on the batch axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_batch is None:
        n_batch = len(devices) // n_model
    dev_array = np.asarray(devices[:n_batch * n_model]).reshape(n_batch, n_model)
    return Mesh(dev_array, (BATCH_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for per-scenario arrays."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of (B, ...) arrays with B sharded over the batch axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)

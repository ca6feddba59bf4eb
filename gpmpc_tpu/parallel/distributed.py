"""Multi-process / multi-host execution layer (VERDICT r1 item 3).

The reference is strictly single-process (SURVEY.md §2.2 — no distributed
backend anywhere); this module is the TPU-native equivalent mandated by
BASELINE.json's north star: scenario fan-out data-parallel across hosts, ICI
within a slice and DCN across hosts, with solves/s efficiency measured at
1 chip / 1 host / >= 2 hosts.

Design: one `jax.distributed.initialize` entry point, a global mesh over all
devices of all processes, and a multihost solve wrapper that assembles a
GLOBAL batch from per-process local scenario shards
(jax.make_array_from_process_local_data) and runs the same
`solve_batch_sharded` shard_map program every process traces identically.
Solves are independent, so cross-host traffic is zero during the solve — the
scaling ceiling is pure DP and the measured efficiency (benchmarks/scaling.py)
is the dispatch/compile overhead story, not a collective story.

Tested by tests/test_multiprocess.py: two local CPU processes, each with 4
virtual devices, against the single-process answer.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, defers to the standard cluster auto-detection
    (TPU pod metadata / SLURM / GKE). Explicit arguments support manual
    launches: a coordinator 'host:port', the world size, and this process's
    rank — exactly `jax.distributed.initialize`'s contract.
    """
    import jax
    state = getattr(jax._src.distributed, 'global_state', None)
    if state is not None and getattr(state, 'client', None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_batch_mesh():
    """One-axis 'batch' mesh over every device of every process, ordered so
    each process's devices are contiguous (scenario shards stay host-local;
    inter-host traffic only happens if a result gather crosses hosts)."""
    import jax
    from jax.sharding import Mesh
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), ('batch',))


def make_global_batch(mesh, local_tree):
    """Assemble global device arrays from each process's LOCAL scenario
    shard: a pytree of (B_local, ...) host arrays -> global (B_local * P, ...)
    jax.Arrays sharded over the mesh 'batch' axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P('batch'))

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, local_tree)


def replicate_global(mesh, tree):
    """Replicate host-identical values (the GP posterior, cost params) across
    every device of the mesh. All processes must pass the same values."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def one(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(one, tree)


def solve_batch_multihost(gp, state_dim: int, action_dim: int,
                          x0s_local, params, horizon: int, lb, ub,
                          solver=None, gammas_local=None,
                          full_cov: bool = False, delta: bool = False):
    """Run `solve_batch_sharded` across every process's devices.

    x0s_local: (B_local, ds) — THIS process's scenario shard; every process
    contributes B_local scenarios and receives back the (addressable shards
    of the) global result. gammas_local optionally shards a per-scenario
    gamma sweep the same way; other params are replicated.
    """
    import jax.numpy as jnp
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel.batch import solve_batch_sharded

    solver = solver or SolverConfig()
    mesh = global_batch_mesh()
    gp_g = replicate_global(mesh, gp)
    x0s_g = make_global_batch(mesh, jnp.asarray(x0s_local))
    if gammas_local is not None:
        params = params._replace(
            gamma=make_global_batch(mesh, jnp.asarray(gammas_local)))
        rep = params._replace(gamma=None)
        rep_g = replicate_global(mesh, rep)
        params = rep_g._replace(gamma=params.gamma)
    else:
        params = replicate_global(mesh, params)
    return solve_batch_sharded(mesh, gp_g, state_dim, action_dim, x0s_g,
                               params, horizon, lb, ub, solver,
                               full_cov=full_cov, delta=delta)

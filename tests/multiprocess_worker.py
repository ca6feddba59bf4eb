"""Worker for tests/test_multiprocess.py — one rank of a 2-process CPU run.

Each process owns 4 virtual CPU devices and contributes a distinct local
scenario shard; the multihost solve runs the same shard_map program on the
global 8-device mesh. Every rank independently recomputes its OWN shard's
answer with the plain single-process `solve_batch` and asserts its
addressable shards of the global result match — proving the multi-process
path computes exactly what the single-process path does.

Usage: python multiprocess_worker.py <rank> <world> <port>
"""

import os
import sys

rank, world, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpmpc_tpu.gp import state as gs  # noqa: E402
from gpmpc_tpu.mpc.cost import CostParams  # noqa: E402
from gpmpc_tpu.mpc.solver import SolverConfig  # noqa: E402
from gpmpc_tpu.parallel import batch as pbatch  # noqa: E402
from gpmpc_tpu.parallel import distributed as pdist  # noqa: E402


def main():
    pdist.initialize(coordinator_address=f'localhost:{port}',
                     num_processes=world, process_id=rank)
    assert jax.process_count() == world, jax.process_count()
    assert len(jax.devices()) == 4 * world

    dtype = jnp.float32
    ds, da = 2, 1
    rng = np.random.default_rng(0)              # identical GP on every rank
    n = 24
    states = rng.uniform(-1, 1, (n, ds))
    actions = rng.uniform(-1, 1, (n, da))
    next_states = states + 0.1 * actions + 0.05 * np.sin(states)
    cfg = gs.GPConfig(capacity=32, x_dim=ds + da, out_dim=ds)
    gp = gs.make_gp(cfg, np.concatenate([states, actions], 1), next_states,
                    log_lambdas=np.log([2.0] * (ds + da)), log_sigma_f=0.0,
                    log_sigma_n=np.log(1e-1), dtype=dtype)

    b_local, horizon = 8, 4
    rng_local = np.random.default_rng(100 + rank)   # distinct shard per rank
    x0s_local = rng_local.uniform(-1, 1, (b_local, ds)).astype(np.float32)
    gammas_local = np.linspace(-0.1, 0.1, b_local).astype(np.float32) + rank * 0.01
    params = CostParams(Q=2.0 * jnp.eye(ds, dtype=dtype),
                        R=0.01 * jnp.eye(da, dtype=dtype),
                        gamma=jnp.zeros((), dtype),
                        x_ref=jnp.zeros(ds, dtype), u_ref=jnp.zeros(da, dtype))
    solver = SolverConfig(max_iters=15, tol=1e-4)

    res = pdist.solve_batch_multihost(gp, ds, da, x0s_local, params, horizon,
                                      -1.0, 1.0, solver,
                                      gammas_local=gammas_local)

    # Addressable (this-process) shard of the global result, in order.
    shards = sorted(res.u.addressable_shards, key=lambda s: s.index[0].start)
    u_mine = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    assert u_mine.shape == (b_local, horizon, da), u_mine.shape

    # Single-process oracle, solved in the SAME per-device chunking the
    # shard_map uses (2 scenarios per device here): identical operand shapes
    # give identical f32 reduction orders, so the comparison is tight. (One
    # B=8 solve is mathematically equal but its differently-shaped einsums
    # accumulate f32 noise that the nonconvex solve amplifies.)
    chunk = b_local // 4                        # 4 local devices
    refs = []
    for c in range(0, b_local, chunk):
        ref = pbatch.solve_batch(
            gp, ds, da, jnp.asarray(x0s_local[c:c + chunk]),
            params._replace(gamma=jnp.asarray(gammas_local[c:c + chunk])),
            horizon, -1.0, 1.0, solver)
        refs.append(np.asarray(ref.u))
    np.testing.assert_allclose(u_mine, np.concatenate(refs, axis=0),
                               rtol=2e-5, atol=2e-6)
    print(f'RANK{rank} OK')


if __name__ == '__main__':
    main()

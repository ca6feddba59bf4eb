"""Scenario fan-out tests: batched solves vs per-sample loop, gamma sweeps,
per-scenario GP draws, and mesh-sharded execution on the 8-virtual-device CPU
mesh (conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.mpc.cost import CostParams
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch
from gpmpc_tpu.parallel import mesh as pmesh

RNG = np.random.default_rng(91)
DS, DA, H = 2, 1, 4


def _gp(n=24, cap=32, seed=0):
    rng = np.random.default_rng(seed)
    states = rng.uniform(-1, 1, (n, DS))
    actions = rng.uniform(-1, 1, (n, DA))
    nxt = 0.9 * states + 0.1 * np.concatenate([actions, actions], axis=1)
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=cap, x_dim=DS + DA, out_dim=DS)
    return gs.make_gp(cfg, x, nxt, log_lambdas=np.log(3.0),
                      log_sigma_f=np.log(0.5), log_sigma_n=np.log(0.05),
                      dtype=jnp.float64)


def _params(gamma):
    return CostParams(Q=jnp.eye(DS) * 2.0, R=jnp.eye(DA) * 0.1,
                      gamma=jnp.asarray(gamma),
                      x_ref=jnp.zeros(DS), u_ref=jnp.zeros(DA))


SOLVER = SolverConfig(max_iters=60, tol=1e-6, history=4)  # history=4 halves the unrolled two-loop (compile time)


class TestBatch:
    def test_batch_equals_loop(self):
        gp = _gp()
        x0s = jnp.asarray(RNG.uniform(-1, 1, (5, DS)))
        res = pbatch.solve_batch(gp, DS, DA, x0s, _params(0.0), H,
                                 -1.0, 1.0, SOLVER)
        assert res.u.shape == (5, H, DA)
        for i in range(5):
            ri = pbatch.solve_batch(gp, DS, DA, x0s[i:i + 1], _params(0.0), H,
                                    -1.0, 1.0, SOLVER)
            # The fused lockstep program and the B=1 program fuse reductions
            # differently; f64-noise differences can flip a line-search
            # accept/reject branch, so agreement is to solver-trajectory
            # tolerance, not bitwise.
            np.testing.assert_allclose(np.asarray(res.u[i]),
                                       np.asarray(ri.u[0]), atol=2e-5)

    def test_gamma_sweep_axis(self):
        gp = _gp()
        x0s = jnp.broadcast_to(jnp.asarray([0.5, -0.5]), (3, DS))
        gammas = jnp.asarray([-0.5, 0.0, 0.5])
        res = pbatch.solve_batch(gp, DS, DA, x0s, _params(gammas), H,
                                 -1.0, 1.0, SOLVER)
        u = np.asarray(res.u)
        # Distinct risk preferences must give distinct controls.
        assert not np.allclose(u[0], u[2], atol=1e-6)

    def test_batch_gp_draws(self):
        gps = pbatch.stack_gps([_gp(seed=s) for s in range(3)])
        x0s = jnp.broadcast_to(jnp.asarray([0.5, -0.5]), (3, DS))
        res = pbatch.solve_batch_gp(gps, DS, DA, x0s, _params(0.0), H,
                                    -1.0, 1.0, SOLVER)
        assert res.u.shape == (3, H, DA)
        u = np.asarray(res.u)
        assert not np.allclose(u[0], u[1], atol=1e-8)   # different datasets

    def test_sharded_matches_unsharded(self):
        assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
        gp = _gp()
        b = 8
        x0s = jnp.asarray(RNG.uniform(-1, 1, (b, DS)))
        gammas = jnp.asarray(np.linspace(-0.5, 0.5, b))

        def run(gp, x0s, gammas):
            return pbatch.solve_batch(gp, DS, DA, x0s, _params(gammas), H,
                                      -1.0, 1.0, SOLVER).u

        u_ref = jax.jit(run)(gp, x0s, gammas)

        mesh = pmesh.make_mesh()
        bsh = pmesh.batch_sharding(mesh)
        repl = pmesh.replicated(mesh)
        run_sh = jax.jit(run, in_shardings=(repl, bsh, bsh), out_shardings=bsh)
        u_sh = run_sh(jax.device_put(gp, repl), jax.device_put(x0s, bsh),
                      jax.device_put(gammas, bsh))
        # Partitioning changes XLA fusion/reduction order; f64-noise-level
        # differences can flip a line-search accept/reject branch, so the
        # solves agree to solver-trajectory tolerance, not bitwise.
        np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                                   atol=2e-5)
        # The result really is distributed over the batch axis.
        assert len(u_sh.sharding.device_set) == 8


class TestShardMap:
    def test_shard_map_solve_matches_unsharded(self):
        """solve_batch_sharded (the multi-chip production path: explicit
        shard_map split, per-device Pallas-capable local solves) == the
        single-device solve, on the 8-virtual-device CPU mesh."""
        gp = _gp()
        b = 8
        x0s = jnp.asarray(RNG.uniform(-1, 1, (b, DS)))
        gammas = jnp.asarray(np.linspace(-0.5, 0.5, b))
        mesh = pmesh.make_mesh()
        res_ref = pbatch.solve_batch(gp, DS, DA, x0s, _params(gammas), H,
                                     -1.0, 1.0, SOLVER)
        res_sh = pbatch.solve_batch_sharded(mesh, gp, DS, DA, x0s,
                                            _params(gammas), H, -1.0, 1.0,
                                            SOLVER)
        np.testing.assert_allclose(np.asarray(res_sh.u), np.asarray(res_ref.u),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_sh.cost),
                                   np.asarray(res_ref.cost),
                                   rtol=1e-8, atol=1e-10)

    def test_shard_map_rejects_indivisible_batch(self):
        gp = _gp()
        mesh = pmesh.make_mesh()
        x0s = jnp.asarray(RNG.uniform(-1, 1, (6, DS)))
        try:
            pbatch.solve_batch_sharded(mesh, gp, DS, DA, x0s, _params(0.0), H,
                                       -1.0, 1.0, SOLVER)
            assert False, "expected ValueError"
        except ValueError:
            pass

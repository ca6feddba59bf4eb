"""Model-axis sharded solves (tests on the 8-virtual-device CPU mesh).

Checks that sharding the kernel-matrix contraction over the 'model' axis
(psum-reduced row blocks, parallel/model_sharded.py) is numerically
equivalent to the unsharded solve, across mesh shapes — the same-seed
determinism-across-shardings guard VERDICT r1 asked for alongside
check_vma=False.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.mpc.cost import CostParams
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.ops import moments
from gpmpc_tpu.parallel import batch as pbatch
from gpmpc_tpu.parallel import mesh as pmesh
from gpmpc_tpu.parallel.model_sharded import (
    _variance_multi_batched_diag_rows, solve_batch_2d)

RNG = np.random.default_rng(31)


def _gp(n=48, cap=64, e=2, d=3, tied=False):
    x = RNG.uniform(-2, 2, (n, d))
    y = np.stack([np.sin(x[:, 0]) + 0.3 * x[:, 2],
                  np.cos(x[:, 1])], axis=1)
    ll = np.log([1.5] * d) if tied else np.log(RNG.uniform(1.0, 2.0, (e, d)))
    cfg = gs.GPConfig(capacity=cap, x_dim=d, out_dim=e)
    return gs.make_gp(cfg, x, y, log_lambdas=ll, log_sigma_f=np.log(0.8),
                      log_sigma_n=np.log(0.1), dtype=jnp.float64)


class TestShardedVarianceOp:
    def test_rows_op_matches_full(self):
        """The row-sharded variance op, summed over manual shards, equals the
        replicated op (no mesh needed — psum over a size-1 axis via vmap)."""
        gp = _gp()
        from gpmpc_tpu.dynamics import build_rollout_cache
        cache = build_rollout_cache(gp, 2, 1)
        b, d = 5, 3
        u = jnp.asarray(RNG.uniform(-1, 1, (b, d)))
        s_diag = jnp.asarray(RNG.uniform(0.01, 0.1, (b, d)))
        means = jnp.zeros((b, 2))

        ref = moments.variance_prop_multi_batched_diag(
            u, s_diag, cache.x, cache.b_lam, cache.log_lambdas,
            cache.log_sigma_f, means)

        # emulate 4 shards: each computes its block; psum == plain sum here,
        # realized by running under shard_map on a (1, 4) mesh
        mesh = pmesh.make_mesh(n_batch=1, n_model=4,
                               devices=jax.devices()[:4])
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        n_loc = cache.b_lam.shape[1] // 4

        def local(b_lam_rows):
            off = jax.lax.axis_index('model') * n_loc
            return _variance_multi_batched_diag_rows(
                u, s_diag, cache.x, b_lam_rows, off, cache.log_lambdas,
                cache.log_sigma_f, means, 'model')

        out = shard_map(local, mesh=mesh, in_specs=P(None, 'model', None),
                        out_specs=P(), check_vma=False)(cache.b_lam)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)


class TestShardedVarianceKernel:
    def test_block_kernel_matches_einsum(self, monkeypatch):
        """The rectangular streamed Pallas kernel (tied f32 block partial,
        interpret mode on CPU) matches the XLA einsum row form in value AND
        in the psum'd gradient (the block op's backward is only exact after
        the model-axis psum — exercised here through shard_map)."""
        monkeypatch.setenv('GPMPC_FORCE_PALLAS', '1')
        e, d, n, cap = 2, 3, 200, 256
        x = RNG.uniform(-2, 2, (n, d))
        y = np.stack([np.sin(x[:, 0]) + 0.3 * x[:, 2],
                      np.cos(x[:, 1])], axis=1)
        cfg = gs.GPConfig(capacity=cap, x_dim=d, out_dim=e)
        gp = gs.make_gp(cfg, x, y, log_lambdas=np.log([1.5] * d),
                        log_sigma_f=np.log(0.8), log_sigma_n=np.log(0.1),
                        dtype=jnp.float32)
        assert gp.config.tied_lambdas
        from gpmpc_tpu.dynamics import build_rollout_cache
        cache = build_rollout_cache(gp, 2, 1)
        b = 4
        u = jnp.asarray(RNG.uniform(-1, 1, (b, d)), jnp.float32)
        s_diag = jnp.asarray(RNG.uniform(0.01, 0.1, (b, d)), jnp.float32)
        means = jnp.zeros((b, e), jnp.float32)
        w = jnp.asarray(RNG.uniform(0.5, 1.5, (b, e)), jnp.float32)

        mesh = pmesh.make_mesh(n_batch=1, n_model=2,
                               devices=jax.devices()[:2])
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        n_loc = cache.b_lam.shape[1] // 2

        def make_fn(tied):
            def local(u, b_lam_rows):
                off = jax.lax.axis_index('model') * n_loc
                v = _variance_multi_batched_diag_rows(
                    u, s_diag, cache.x, b_lam_rows, off, cache.log_lambdas,
                    cache.log_sigma_f, means, 'model', tied=tied)
                return jnp.sum(v * w)

            sm = shard_map(local, mesh=mesh,
                           in_specs=(P(), P(None, 'model', None)),
                           out_specs=P(), check_vma=False)
            return lambda u: sm(u, cache.b_lam)

        f_kernel, f_einsum = make_fn(True), make_fn(False)
        v_k, g_k = jax.value_and_grad(f_kernel)(u)
        v_e, g_e = jax.value_and_grad(f_einsum)(u)
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_e),
                                   rtol=2e-5)
        # f32 summation-order noise between the two forms is ~3e-5 absolute
        # on gradient entries of O(1); the collapsed-VJP algebra itself is
        # exact after the psum (see variance_trace_tied_block).
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_e),
                                   rtol=1e-3, atol=1e-4)


def _problem(b=8):
    gp = _gp(n=48, cap=64, e=2, d=3, tied=True)
    params = CostParams(Q=2.0 * jnp.eye(2, dtype=jnp.float64),
                        R=0.01 * jnp.eye(1, dtype=jnp.float64),
                        gamma=jnp.asarray(np.linspace(-0.3, 0.3, b)),
                        x_ref=jnp.zeros(2, jnp.float64),
                        u_ref=jnp.zeros(1, jnp.float64))
    x0s = jnp.asarray(RNG.uniform(-1, 1, (b, 2)))
    return gp, x0s, params


class TestSolveBatch2D:
    # One mesh shape stays in the default loop; the other two are slow-
    # marked (each costs ~2 min of XLA CPU compile; same code path).
    @pytest.mark.parametrize('shape', [
        (2, 4),
        pytest.param((4, 2), marks=pytest.mark.slow),
        pytest.param((8, 1), marks=pytest.mark.slow),
    ])
    def test_matches_unsharded_across_mesh_shapes(self, shape):
        gp, x0s, params = _problem()
        solver = SolverConfig(max_iters=15, tol=1e-6, history=4)
        ref = pbatch.solve_batch(gp, 2, 1, x0s, params, horizon=5,
                                 lb=-1.0, ub=1.0, solver=solver)
        mesh = pmesh.make_mesh(n_batch=shape[0], n_model=shape[1])
        out = solve_batch_2d(mesh, gp, 2, 1, x0s, params, horizon=5,
                             lb=-1.0, ub=1.0, solver=solver)
        # rtol 1e-6, not 1e-7: the compared object is an ITERATIVE solver
        # output — a last-bit difference in one iterate (XLA fusion choices
        # vary with compile-cache state) amplifies over the 15 iterations;
        # observed flaking at 7e-7 relative depending on test order.
        np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                                   rtol=1e-8, atol=1e-11)

    @pytest.mark.slow
    def test_delta_mode(self):
        gp, x0s, params = _problem()
        solver = SolverConfig(max_iters=15, tol=1e-6, history=4)
        ref = pbatch.solve_batch(gp, 2, 1, x0s, params, horizon=4,
                                 lb=-1.0, ub=1.0, solver=solver, delta=True)
        mesh = pmesh.make_mesh(n_batch=2, n_model=4)
        out = solve_batch_2d(mesh, gp, 2, 1, x0s, params, horizon=4,
                             lb=-1.0, ub=1.0, solver=solver, delta=True)
        np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                                   rtol=1e-7, atol=1e-9)

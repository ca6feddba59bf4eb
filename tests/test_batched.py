"""Explicit-batch path == vmapped path.

The fused production path (dynamics.rollout_batched +
mpc.solver.solve_trajectory_batched + the batched Pallas variance-trace
kernel) must be numerically identical to vmap of the single-scenario code —
same rollout moments, same gradients, same solver trajectory. These tests pin
that equivalence on CPU (Pallas kernels run interpreted when forced via
GPMPC_FORCE_PALLAS; default CPU dispatch uses the jnp twin).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import build_rollout_cache, rollout, rollout_batched
from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
from gpmpc_tpu.mpc.solver import (SolverConfig, solve_trajectory,
                                  solve_trajectory_batched)
from gpmpc_tpu.ops.pallas import variance_trace as vt
from gpmpc_tpu.parallel import batch as pbatch


def _make_gp(n=24, cap=32, ds=2, da=1, dtype=jnp.float64, seed=0):
    rng = np.random.default_rng(seed)
    states = rng.uniform(-1, 1, (n, ds))
    actions = rng.uniform(-1, 1, (n, da))
    next_states = states + 0.1 * actions + 0.05 * np.sin(states)
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=cap, x_dim=ds + da, out_dim=ds)
    gp = gs.make_gp(cfg, x, next_states, log_lambdas=np.log([2.0] * (ds + da)),
                    log_sigma_f=0.0, log_sigma_n=np.log(1e-2), dtype=dtype)
    return gp, ds, da


class TestBatchedRollout:
    def test_matches_vmap_rollout(self):
        gp, ds, da = _make_gp()
        cache = build_rollout_cache(gp, ds, da)
        b, h = 5, 6
        rng = np.random.default_rng(1)
        x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)))
        us = jnp.asarray(rng.uniform(-1, 1, (b, h, da)))

        m_ref, c_ref = jax.vmap(lambda x0, u: rollout(cache, x0, u))(x0s, us)
        m_b, c_b = rollout_batched(cache, x0s, us)
        np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(c_b), np.asarray(c_ref),
                                   rtol=1e-8, atol=1e-10)

    def test_matches_vmap_rollout_delta(self):
        gp, ds, da = _make_gp(seed=3)
        cache = build_rollout_cache(gp, ds, da)
        b, h = 4, 5
        rng = np.random.default_rng(2)
        x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)))
        us = jnp.asarray(rng.uniform(-1, 1, (b, h, da)))

        m_ref, c_ref = jax.vmap(
            lambda x0, u: rollout(cache, x0, u, delta=True))(x0s, us)
        m_b, c_b = rollout_batched(cache, x0s, us, delta=True)
        np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(c_b), np.asarray(c_ref),
                                   rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize('tied', [True, False])
    @pytest.mark.parametrize('delta', [False, True])
    def test_matches_vmap_rollout_full_cov(self, tied, delta):
        """Batched full-covariance rollout == vmap of the single-scenario
        full-covariance rollout (which pins the eq.-A14 pair terms), for both
        the tied-lambdas shared-chain path and the per-pair untied path."""
        gp, ds, da = _make_gp(seed=7)
        if not tied:
            # Break the tie with distinct per-output lengthscales.
            gp = gs.set_hyperparams(gp, lambdas=np.array([[2.0, 2.2, 1.8],
                                                          [1.5, 2.5, 2.0]]))
            assert not gp.config.tied_lambdas
        cache = build_rollout_cache(gp, ds, da)
        b, h = 4, 5
        rng = np.random.default_rng(8)
        x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)))
        us = jnp.asarray(rng.uniform(-1, 1, (b, h, da)))

        m_ref, c_ref = jax.vmap(
            lambda x0, u: rollout(cache, x0, u, full_cov=True, delta=delta))(
                x0s, us)
        m_b, c_b = rollout_batched(cache, x0s, us, full_cov=True, delta=delta)
        np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(c_b), np.asarray(c_ref),
                                   rtol=1e-7, atol=1e-10)

    @pytest.mark.slow
    def test_full_cov_gradients_match_vmap(self):
        gp, ds, da = _make_gp(seed=9)
        cache = build_rollout_cache(gp, ds, da)
        b, h = 3, 4
        rng = np.random.default_rng(10)
        x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)))
        us = jnp.asarray(rng.uniform(-0.5, 0.5, (b, h, da)))

        def loss_vmap(u):
            m, c = jax.vmap(lambda x0, uu: rollout(cache, x0, uu,
                                                   full_cov=True))(x0s, u)
            return jnp.sum(m ** 2) + jnp.sum(c ** 2)

        def loss_batched(u):
            m, c = rollout_batched(cache, x0s, u, full_cov=True)
            return jnp.sum(m ** 2) + jnp.sum(c ** 2)

        g_ref = jax.grad(loss_vmap)(us)
        g_b = jax.grad(loss_batched)(us)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_ref),
                                   rtol=1e-8, atol=1e-10)

    def test_gradients_match_vmap(self):
        gp, ds, da = _make_gp(seed=5)
        cache = build_rollout_cache(gp, ds, da)
        b, h = 3, 4
        rng = np.random.default_rng(4)
        x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)))
        us = jnp.asarray(rng.uniform(-0.5, 0.5, (b, h, da)))

        def loss_vmap(u):
            m, c = jax.vmap(lambda x0, uu: rollout(cache, x0, uu))(x0s, u)
            return jnp.sum(m ** 2) + jnp.sum(jnp.diagonal(c, axis1=2, axis2=3))

        def loss_batched(u):
            m, c = rollout_batched(cache, x0s, u)
            return jnp.sum(m ** 2) + jnp.sum(jnp.diagonal(c, axis1=2, axis2=3))

        g_ref = jax.grad(loss_vmap)(us)
        g_b = jax.grad(loss_batched)(us)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_ref),
                                   rtol=1e-9, atol=1e-11)


class TestBatchedSolver:
    def _setup(self):
        gp, ds, da = _make_gp()
        cache = build_rollout_cache(gp, ds, da)
        b, h = 4, 5
        rng = np.random.default_rng(7)
        x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)))
        gammas = jnp.asarray(np.linspace(-0.5, 0.5, b))
        params = CostParams(Q=2.0 * jnp.eye(ds), R=0.1 * jnp.eye(da),
                            gamma=gammas, x_ref=jnp.zeros(ds),
                            u_ref=jnp.zeros(da))
        return gp, cache, ds, da, b, h, x0s, params

    def test_fused_solve_matches_vmap_solve(self):
        # The two paths are the same algorithm but not bitwise identical
        # (batched einsum vs per-lane dot reassociates floating point), so a
        # lane can cross the convergence threshold an iteration apart. Compare
        # the optima they reach, not the iteration-by-iteration trajectory.
        gp, cache, ds, da, b, h, x0s, params = self._setup()
        solver = SolverConfig(method='lbfgs', max_iters=100, tol=1e-8)
        res_v = pbatch.solve_batch(gp, ds, da, x0s, params, h, -1.0, 1.0,
                                   solver, impl='vmap')
        res_f = pbatch.solve_batch(gp, ds, da, x0s, params, h, -1.0, 1.0,
                                   solver, impl='fused')
        np.testing.assert_allclose(np.asarray(res_f.u), np.asarray(res_v.u),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_f.cost),
                                   np.asarray(res_v.cost),
                                   rtol=1e-8, atol=1e-10)

    def test_fused_objective_matches_vmap_objective(self):
        # Bitwise-level check at the objective level: batched rollout + batched
        # cost vs vmap of the single-scenario objective, values and gradients.
        gp, cache, ds, da, b, h, x0s, params = self._setup()
        rng = np.random.default_rng(13)
        u = jnp.asarray(rng.uniform(-1, 1, (b, h, da)))
        gammas = params.gamma

        from gpmpc_tpu.dynamics import rollout, rollout_batched

        def obj_vmap(u):
            def one(x0, uu, gam):
                m, c = rollout(cache, x0, uu)
                return risk_sensitive_cost(params._replace(gamma=gam), m, c, uu)
            return jax.vmap(one)(x0s, u, gammas)

        cost_b = jax.vmap(risk_sensitive_cost,
                          in_axes=(CostParams(Q=None, R=None, gamma=0,
                                              x_ref=None, u_ref=None), 0, 0, 0))

        def obj_fused(u):
            m, c = rollout_batched(cache, x0s, u)
            return cost_b(params, m, c, u)

        np.testing.assert_allclose(np.asarray(obj_fused(u)),
                                   np.asarray(obj_vmap(u)),
                                   rtol=1e-10, atol=1e-12)
        gv = jax.grad(lambda u: jnp.sum(obj_vmap(u)))(u)
        gf = jax.grad(lambda u: jnp.sum(obj_fused(u)))(u)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gv),
                                   rtol=1e-8, atol=1e-10)

    def test_lockstep_lbfgs_on_quadratics(self):
        # B independent strongly-convex quadratics with known box-constrained
        # minimizers: x* = clip(target, lb, ub).
        b, n = 6, 3
        rng = np.random.default_rng(11)
        targets = jnp.asarray(rng.uniform(-2, 2, (b, n, 1)))

        def obj_b(x):
            return jnp.sum((x - targets) ** 2, axis=(1, 2))

        res = solve_trajectory_batched(
            obj_b, jnp.zeros((b, n, 1)), -1.0, 1.0,
            SolverConfig(max_iters=100, tol=1e-10))
        expect = np.clip(np.asarray(targets), -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(res.u), expect, atol=1e-7)


@pytest.mark.skipif(os.environ.get('GPMPC_FORCE_PALLAS') != '1'
                    and jax.default_backend() != 'tpu',
                    reason='interpreted Pallas is slow; opt in via '
                           'GPMPC_FORCE_PALLAS=1')
class TestBatchedPallasKernel:
    def test_forward_matches_reference(self):
        rng = np.random.default_rng(0)
        b, e, n, d = 3, 2, 128, 3
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        m2r = rng.normal(size=(b, e, d, d))
        m2 = jnp.asarray(m2r @ np.swapaxes(m2r, -1, -2) * 0.1
                         + np.eye(d), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        br = rng.normal(size=(e, n, n)) * 0.01
        blam = jnp.asarray(br + np.swapaxes(br, -1, -2), jnp.float32)

        ref = vt.variance_trace_batched_reference(u, m2, x, blam)
        out = vt.variance_trace_batched(u, m2, x, blam)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_backward_matches_reference(self):
        rng = np.random.default_rng(1)
        b, e, n, d = 2, 2, 128, 3
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        m2r = rng.normal(size=(b, e, d, d))
        m2 = jnp.asarray(m2r @ np.swapaxes(m2r, -1, -2) * 0.1
                         + np.eye(d), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        # the analytic VJP assumes symmetric blam (b_lam always is: it is
        # (Kinv - beta beta^T) times symmetric elementwise factors)
        br = rng.normal(size=(e, n, n)) * 0.01
        blam = jnp.asarray(br + np.swapaxes(br, -1, -2), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)

        def loss_k(u, m2):
            return jnp.sum(vt.variance_trace_batched(u, m2, x, blam) * ct)

        def loss_r(u, m2):
            return jnp.sum(
                vt.variance_trace_batched_reference(u, m2, x, blam) * ct)

        gu_k, gm_k = jax.grad(loss_k, argnums=(0, 1))(u, m2)
        gu_r, gm_r = jax.grad(loss_r, argnums=(0, 1))(u, m2)
        np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_r),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gm_k), np.asarray(gm_r),
                                   rtol=2e-4, atol=2e-5)

    def test_tiled_large_n_matches_reference(self):
        # N > 512 dispatches the j-tiled kernels (inner fori over blam
        # column slices); verify forward and gradients against the jnp twin.
        rng = np.random.default_rng(2)
        b, e, n, d = 2, 2, 768, 3
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        m2r = rng.normal(size=(b, e, d, d))
        m2 = jnp.asarray(m2r @ np.swapaxes(m2r, -1, -2) * 0.1
                         + np.eye(d), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        br = rng.normal(size=(e, n, n)) * 0.01
        blam = jnp.asarray(br + np.swapaxes(br, -1, -2), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)

        ref = vt.variance_trace_batched_reference(u, m2, x, blam)
        out = vt.variance_trace_batched(u, m2, x, blam)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

        def loss_k(u, m2):
            return jnp.sum(vt.variance_trace_batched(u, m2, x, blam) * ct)

        def loss_r(u, m2):
            return jnp.sum(
                vt.variance_trace_batched_reference(u, m2, x, blam) * ct)

        gu_k, gm_k = jax.grad(loss_k, argnums=(0, 1))(u, m2)
        gu_r, gm_r = jax.grad(loss_r, argnums=(0, 1))(u, m2)
        np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_r),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gm_k), np.asarray(gm_r),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.skipif(os.environ.get('GPMPC_FORCE_PALLAS') != '1'
                    and jax.default_backend() != 'tpu',
                    reason='interpreted Pallas is slow; opt in via '
                           'GPMPC_FORCE_PALLAS=1')
class TestTiedLambdasKernel:
    """Shared-lengthscale fast path: m2 (B, d, d) shared across outputs."""

    def _problem(self, seed=5, b=3, e=2, n=128, d=3):
        rng = np.random.default_rng(seed)
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        m2r = rng.normal(size=(b, d, d))
        m2 = jnp.asarray(m2r @ np.swapaxes(m2r, -1, -2) * 0.1
                         + np.eye(d), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        br = rng.normal(size=(e, n, n)) * 0.01
        blam = jnp.asarray(br + np.swapaxes(br, -1, -2), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)
        return u, m2, x, blam, ct

    def test_forward_matches_reference(self):
        u, m2, x, blam, _ = self._problem()
        ref = vt.variance_trace_batched_tied_reference(u, m2, x, blam)
        out = vt.variance_trace_batched_tied(u, m2, x, blam)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_backward_matches_reference(self):
        u, m2, x, blam, ct = self._problem(seed=6)

        def loss_k(u, m2):
            return jnp.sum(vt.variance_trace_batched_tied(u, m2, x, blam) * ct)

        def loss_r(u, m2):
            return jnp.sum(
                vt.variance_trace_batched_tied_reference(u, m2, x, blam) * ct)

        gu_k, gm_k = jax.grad(loss_k, argnums=(0, 1))(u, m2)
        gu_r, gm_r = jax.grad(loss_r, argnums=(0, 1))(u, m2)
        np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_r),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gm_k), np.asarray(gm_r),
                                   rtol=2e-4, atol=2e-5)

    def test_tied_dispatch_equals_untied(self):
        """variance_prop_multi_batched_diag(tied=True) must equal the untied
        path when the lengthscale rows are in fact equal."""
        from gpmpc_tpu.ops import moments
        rng = np.random.default_rng(7)
        b, e, n, d = 3, 2, 128, 3
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        s_diag = jnp.asarray(rng.uniform(0.01, 0.2, (b, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        br = rng.normal(size=(e, n, n)) * 0.01
        blam = jnp.asarray(br + np.swapaxes(br, -1, -2), jnp.float32)
        log_lam = jnp.broadcast_to(
            jnp.asarray(np.log([2.0, 1.5, 3.0]), jnp.float32), (e, d))
        log_sf = jnp.zeros((e,), jnp.float32)
        means = jnp.asarray(rng.normal(size=(b, e)) * 0.1, jnp.float32)

        v_tied = moments.variance_prop_multi_batched_diag(
            u, s_diag, x, blam, log_lam, log_sf, means, tied=True)
        v_untied = moments.variance_prop_multi_batched_diag(
            u, s_diag, x, blam, log_lam, log_sf, means, tied=False)
        np.testing.assert_allclose(np.asarray(v_tied), np.asarray(v_untied),
                                   rtol=2e-4, atol=2e-5)


class TestTiedLambdasFlag:
    """GPConfig.tied_lambdas bookkeeping (host-side auto-detection)."""

    def test_make_gp_detects_tie(self):
        from gpmpc_tpu.gp import state as gs
        cfg = gs.GPConfig(capacity=16, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, log_lambdas=np.log([2.0, 2.0, 2.0]))
        assert gp.config.tied_lambdas
        gp2 = gs.make_gp(cfg, log_lambdas=np.log([[1.0, 2.0, 3.0],
                                                  [4.0, 5.0, 6.0]]))
        assert not gp2.config.tied_lambdas
        gp3 = gs.make_gp(cfg)                     # default log(1): tied
        assert gp3.config.tied_lambdas

    def test_set_hyperparams_updates_flag(self):
        from gpmpc_tpu.gp import state as gs
        rng = np.random.default_rng(0)
        cfg = gs.GPConfig(capacity=16, x_dim=2, out_dim=2)
        gp = gs.make_gp(cfg, rng.normal(size=(8, 2)), rng.normal(size=(8, 2)))
        gp = gs.set_hyperparams(gp, lambdas=[[1.0, 2.0], [3.0, 4.0]])
        assert not gp.config.tied_lambdas
        gp = gs.set_hyperparams(gp, lambdas=[2.0, 2.0])
        assert gp.config.tied_lambdas

    def test_training_clears_flag(self):
        from gpmpc_tpu.gp import state as gs
        from gpmpc_tpu.gp import train as gt
        rng = np.random.default_rng(1)
        cfg = gs.GPConfig(capacity=16, x_dim=2, out_dim=2)
        x = rng.normal(size=(12, 2))
        y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1])], axis=1)
        gp = gs.make_gp(cfg, x, y, log_lambdas=np.zeros(2))
        assert gp.config.tied_lambdas
        res = gt.train_hyperparams(gp, num_iters=2)
        assert not res.state.config.tied_lambdas

    def test_tied_mean_prop_equals_untied(self):
        from gpmpc_tpu.ops import moments
        rng = np.random.default_rng(8)
        b, e, n, d = 4, 3, 64, 3
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        s_diag = jnp.asarray(rng.uniform(0.01, 0.2, (b, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        beta = jnp.asarray(rng.normal(size=(e, n)), jnp.float32)
        log_lam = jnp.broadcast_to(
            jnp.asarray(np.log([2.0, 1.5, 3.0]), jnp.float32), (e, d))
        log_sf = jnp.asarray(rng.normal(size=(e,)) * 0.3, jnp.float32)
        mask = jnp.asarray(np.arange(n) < 50)

        m_t, l_t = moments.mean_prop_batched_diag(
            u, s_diag, x, beta, log_lam, log_sf, mask, tied=True)
        m_u, l_u = moments.mean_prop_batched_diag(
            u, s_diag, x, beta, log_lam, log_sf, mask, tied=False)
        np.testing.assert_allclose(np.asarray(m_t), np.asarray(m_u),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(l_t), np.asarray(l_u),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(os.environ.get('GPMPC_FORCE_PALLAS') != '1'
                    and jax.default_backend() != 'tpu',
                    reason='interpreted Pallas is slow; opt in via '
                           'GPMPC_FORCE_PALLAS=1')
class TestTiedStreamedKernel:
    """Large-N tied path: blam column tiles stream through a grid axis with a
    persistent VMEM accumulator (N = 640 > _FULL_N_MAX forces streaming)."""

    def _problem(self, seed=9, b=4, e=2, n=640, d=3):
        rng = np.random.default_rng(seed)
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        m2r = rng.normal(size=(b, d, d))
        m2 = jnp.asarray(m2r @ np.swapaxes(m2r, -1, -2) * 0.1
                         + np.eye(d), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        br = rng.normal(size=(e, n, n)) * 0.003
        blam = jnp.asarray(br + np.swapaxes(br, -1, -2), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)
        return u, m2, x, blam, ct

    def test_forward_and_backward_match_reference(self):
        u, m2, x, blam, ct = self._problem()
        assert vt.supported_tied(640, 3, jnp.float32, e=2)
        ref = vt.variance_trace_batched_tied_reference(u, m2, x, blam)
        out = vt.variance_trace_batched_tied(u, m2, x, blam)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-5, atol=5e-5)

        def loss_k(u, m2):
            return jnp.sum(vt.variance_trace_batched_tied(u, m2, x, blam) * ct)

        def loss_r(u, m2):
            return jnp.sum(
                vt.variance_trace_batched_tied_reference(u, m2, x, blam) * ct)

        gu_k, gm_k = jax.grad(loss_k, argnums=(0, 1))(u, m2)
        gu_r, gm_r = jax.grad(loss_r, argnums=(0, 1))(u, m2)
        np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_r),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gm_k), np.asarray(gm_r),
                                   rtol=2e-3, atol=2e-4)

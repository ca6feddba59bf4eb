"""Pallas-path dispatch and routing tests (interpret mode on CPU).

The production kernels are the explicitly-batched rw-formulation ones
(ops/pallas/variance_trace.py); their numeric oracles live in
tests/test_batched.py. This file covers the dispatch seams:

  - forced-pallas vs forced-jnp equivalence of the batched variance op,
  - the controller's single-solve B=1 routing through the batched
    rollout/solver (VERDICT r1 item 7) matches the single-scenario path,
  - shape-support predicates.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.ops.pallas import variance_trace as vt

RNG = np.random.default_rng(77)
N, D = 128, 3


class TestBatchedDispatch:
    def test_forced_pallas_matches_jnp(self):
        from gpmpc_tpu.ops import moments
        b, e = 4, 2
        x = jnp.asarray(RNG.uniform(-2, 2, (N, D)), jnp.float32)
        raw = RNG.normal(size=(e, N, N))
        blam = jnp.asarray((raw + np.swapaxes(raw, 1, 2)) / 8, jnp.float32)
        u = jnp.asarray(RNG.uniform(-1, 1, (b, D)), jnp.float32)
        s_diag = jnp.asarray(RNG.uniform(0.01, 0.2, (b, D)), jnp.float32)
        ll = jnp.zeros((e, D), jnp.float32)
        lsf = jnp.zeros((e,), jnp.float32)
        means = jnp.zeros((b, e), jnp.float32)

        os.environ['GPMPC_FORCE_PALLAS'] = '1'
        try:
            v_pal = moments.variance_prop_multi_batched_diag(
                u, s_diag, x, blam, ll, lsf, means, tied=True)
        finally:
            del os.environ['GPMPC_FORCE_PALLAS']
        os.environ['GPMPC_DISABLE_PALLAS'] = '1'
        try:
            v_jnp = moments.variance_prop_multi_batched_diag(
                u, s_diag, x, blam, ll, lsf, means, tied=True)
        finally:
            del os.environ['GPMPC_DISABLE_PALLAS']
        np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_jnp),
                                   rtol=1e-4, atol=1e-6)

    def test_supported_predicates(self):
        assert not vt.supported_batched(100, 3, jnp.float32)  # not tile-aligned
        assert not vt.supported_batched(128, 12, jnp.float32)  # d too large
        assert not vt.supported_batched(128, 3, jnp.float64)   # dtype
        assert vt.supported_batched(256, 6, jnp.float32)
        assert vt.supported_tied(256, 3, jnp.float32, e=2)
        # the streamed kernel serves large N (tiles stream; VMEM-bounded only
        # by the (E, TJ, N) blam tile)
        assert vt.supported_tied(1536, 3, jnp.float32, e=2)
        assert not vt.supported_tied(100, 3, jnp.float32, e=2)  # alignment


class TestSingleSolveRouting:
    def test_controller_b1_matches_single_path(self):
        """The controller's B=1 batched routing must return the same controls
        as the single-scenario rollout + solver it replaced."""
        from gpmpc_tpu.dynamics import build_rollout_cache, rollout
        from gpmpc_tpu.gp import state as gs
        from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
        from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
        from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory

        rng = np.random.default_rng(3)
        s = rng.uniform(-3, 3, (50, 2))
        a = rng.uniform(-1, 1, (50, 1))
        ns = 0.9 * s + np.concatenate([0.1 * a, a], axis=1)
        mpc = RiskSensitiveMPC(gamma=-0.2, horizon=6, state_dim=2,
                               input_dim=1, Q=2 * np.eye(2),
                               R=0.01 * np.eye(1), capacity=64,
                               dtype=jnp.float64,
                               solver=SolverConfig(max_iters=120, tol=1e-7))
        mpc.set_gp_hyperparams(lambdas=[2.0] * 3, sigma_f=1.0, sigma_n=0.05)
        mpc.dynamics.append_train_data(s, a, ns)
        mpc.set_ub([1.0])
        mpc.set_lb([-1.0])
        x0 = np.array([1.5, -0.8])
        u_ctrl = mpc.get_optimal_trajectory(x0)

        cache = build_rollout_cache(mpc.gp, 2, 1)
        params = CostParams(Q=mpc.Q, R=mpc.R,
                            gamma=jnp.asarray(-0.2, jnp.float64),
                            x_ref=mpc.x_ref, u_ref=mpc.u_ref)

        def objective(u):
            means, covs = rollout(cache, jnp.asarray(x0), u)
            return risk_sensitive_cost(params, means, covs, u)

        res = solve_trajectory(objective, jnp.zeros((6, 1), jnp.float64),
                               -1.0, 1.0,
                               SolverConfig(max_iters=120, tol=1e-7))
        np.testing.assert_allclose(u_ctrl, np.asarray(res.u), atol=1e-5)

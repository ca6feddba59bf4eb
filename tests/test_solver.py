"""Solver tests: known-answer quadratic problems, box activity, and the
known-answer 1-D integrator MPC solve (reference test_experiment.py:52-58:
x0 = 5, bounds [-1, 1], H = 5 -> u* = [-1]*5)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory

RNG = np.random.default_rng(9)


class TestSolverCore:
    def test_unconstrained_quadratic(self):
        target = jnp.asarray(RNG.uniform(-0.5, 0.5, (4, 2)))

        def obj(u):
            return jnp.sum((u - target) ** 2)

        res = solve_trajectory(obj, jnp.zeros((4, 2)), -1.0, 1.0,
                               SolverConfig(max_iters=500, tol=1e-6))
        np.testing.assert_allclose(np.asarray(res.u), np.asarray(target),
                                   atol=1e-4)
        assert float(res.pg_norm) < 1e-5

    def test_active_box_constraints(self):
        target = jnp.asarray([[2.0, -3.0], [0.5, 0.0]])

        def obj(u):
            return jnp.sum((u - target) ** 2)

        res = solve_trajectory(obj, jnp.zeros((2, 2)), -1.0, 1.0,
                               SolverConfig(max_iters=500, tol=1e-6))
        np.testing.assert_allclose(np.asarray(res.u),
                                   [[1.0, -1.0], [0.5, 0.0]], atol=1e-4)

    def test_nonfinite_gradient_survives(self):
        def obj(u):
            return jnp.where(u[0, 0] > 0.5, jnp.nan, jnp.sum(u ** 2))

        res = solve_trajectory(obj, jnp.full((1, 1), 0.9), -1.0, 1.0,
                               SolverConfig(max_iters=50))
        assert np.all(np.isfinite(np.asarray(res.u)))

    def test_vmappable(self):
        targets = jnp.asarray(RNG.uniform(-0.5, 0.5, (8, 3, 1)))

        def single(t):
            return solve_trajectory(lambda u: jnp.sum((u - t) ** 2),
                                    jnp.zeros((3, 1)), -1.0, 1.0,
                                    SolverConfig(max_iters=300, tol=1e-6)).u

        batched = jax.vmap(single)(targets)
        np.testing.assert_allclose(np.asarray(batched), np.asarray(targets),
                                   atol=1e-4)


class TestIntegratorKnownAnswer:
    def test_mpc_integrator(self):
        """The reference's known-answer experiment: GP learns f(s,a) = s + a;
        from x0 = 5 with a in [-1, 1], the optimal H=5 trajectory is all -1."""
        rng = np.random.default_rng(0)
        s = rng.uniform(-10, 10, (100, 1))
        a = rng.uniform(-1, 1, (100, 1))
        ns = s + a
        mpc = RiskSensitiveMPC(gamma=1e-5, horizon=5, state_dim=1, input_dim=1,
                               Q=2 * np.eye(1), R=np.zeros((1, 1)),
                               R_delta=np.zeros((1, 1)), capacity=128,
                               dtype=jnp.float64,
                               solver=SolverConfig(max_iters=300, tol=1e-5,
                                                   polish_iters=20))
        mpc.set_gp_hyperparams(lambdas=[2.0, 2.0], sigma_f=3.0, sigma_n=1e-5)
        mpc.dynamics.append_train_data(s, a, ns)
        mpc.set_ub([1.0])
        mpc.set_lb([-1.0])
        mpc.set_xref([0.0])
        mpc.set_uref([0.0])
        u = mpc.get_optimal_trajectory(np.array([5.0]))
        np.testing.assert_allclose(u.ravel(), -np.ones(5), atol=5e-3)

    def test_zero_trajectory_until_data(self):
        mpc = RiskSensitiveMPC(gamma=0.0, horizon=3, state_dim=1, input_dim=1,
                               Q=np.eye(1), R=np.eye(1))
        u = mpc.get_optimal_trajectory(np.array([1.0]))
        np.testing.assert_array_equal(u, np.zeros((3, 1)))

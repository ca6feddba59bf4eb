"""Compat-facade tests: the reference's class API surface backed by the JAX
core (reference usage patterns from gpr.py, dynamics.py, and the experiments)."""

import jax.numpy as jnp
import numpy as np

import oracles
from gpmpc_tpu.compat import Dynamics, GaussianProcessRegression

RNG = np.random.default_rng(33)


class TestGPRCompat:
    def _gpr(self, n=20, d=2):
        x = RNG.uniform(-2, 2, (n, d))
        y = np.sin(x[:, 0]) + 0.3 * x[:, 1]
        gpr = GaussianProcessRegression(x_dim=d, capacity=32)
        gpr.set_lambdas([1.5, 0.8])
        gpr.set_sigma_f(1.2)
        gpr.set_sigma_n(0.1)
        gpr.append_train_data(x, y)
        return gpr, x, y

    def test_predict_vs_oracle(self):
        gpr, x, y = self._gpr()
        xp = RNG.uniform(-2, 2, (5, 2))
        mean, cov = gpr.predict_latent_vars(xp, covar=True)
        m_ref, c_ref = oracles.gp_predict(x, y, xp, np.array([1.5, 0.8]),
                                          1.2, 0.1)
        np.testing.assert_allclose(mean, m_ref, atol=1e-7)
        np.testing.assert_allclose(cov, c_ref, atol=1e-7)

    def test_targets_adds_noise(self):
        gpr, *_ = self._gpr()
        xp = RNG.uniform(-2, 2, (3, 2))
        _, c_f = gpr.predict_latent_vars(xp, covar=True, targets=False)
        _, c_y = gpr.predict_latent_vars(xp, covar=True, targets=True)
        np.testing.assert_allclose(c_y - c_f, 0.01 * np.eye(3), atol=1e-9)

    def test_single_point_api(self):
        gpr, x, y = self._gpr()
        mean, cov = gpr.predict_latent_vars(np.array([0.1, 0.2]), covar=True)
        assert np.isscalar(mean) or mean.shape == ()
        assert np.isscalar(cov) or cov.shape == ()

    def test_marginal_likelihood_vs_oracle(self):
        gpr, x, y = self._gpr()
        np.testing.assert_allclose(
            gpr.compute_marginal_likelihood(),
            oracles.log_ml(x, y, np.array([1.5, 0.8]), 1.2, 0.1), atol=1e-7)

    def test_scalar_append(self):
        gpr = GaussianProcessRegression(x_dim=2, capacity=8)
        gpr.set_sigma_n(0.1)
        for i in range(3):
            gpr.append_train_data(np.array([i * 0.5, -i * 0.3]), float(i))
        assert gpr.num_train == 3
        np.testing.assert_allclose(gpr.y_train.ravel(), [0.0, 1.0, 2.0])

    def test_capacity_growth(self):
        gpr = GaussianProcessRegression(x_dim=1, capacity=4)
        gpr.set_sigma_n(0.1)
        x = RNG.uniform(-1, 1, (10, 1))
        gpr.append_train_data(x, x[:, 0] ** 2)
        assert gpr.num_train == 10

    def test_kernel_matrix_views(self):
        gpr, x, y = self._gpr()
        np.testing.assert_allclose(
            gpr.Kf, oracles.gram(x, x, np.array([1.5, 0.8]), 1.2), atol=1e-8)
        np.testing.assert_allclose(gpr.Ky_inv @ gpr.Ky, np.eye(len(x)),
                                   atol=1e-6)

    def test_nominal_model_residual(self):
        x = RNG.uniform(-2, 2, (15, 2))
        y = 2.0 * x[:, 0] + np.sin(x[:, 1])

        def f_nom(xs):
            return 2.0 * xs[:, 0]

        gpr = GaussianProcessRegression(x_dim=2, nominal_model=f_nom,
                                        capacity=16)
        gpr.set_sigma_n(0.05)
        gpr.append_train_data(x, y)
        xp = RNG.uniform(-2, 2, (4, 2))
        mean, _ = gpr.predict_latent_vars(xp)
        resid = y - 2.0 * x[:, 0]
        m_ref, _ = oracles.gp_predict(x, resid, xp, np.ones(2), 1.0, 0.05)
        np.testing.assert_allclose(mean, m_ref + 2.0 * xp[:, 0], atol=1e-7)

    def test_update_hyperparams_improves_ml(self):
        gpr, *_ = self._gpr()
        ml0 = gpr.compute_marginal_likelihood()
        gpr.update_hyperparams(num_iters=50)
        assert gpr.compute_marginal_likelihood() > ml0


class TestDynamicsCompat:
    def test_per_output_hyperparams(self):
        dyn = Dynamics(state_dim=2, action_dim=1, capacity=32)
        dyn.gpr_err[0].set_sigma_n(1e-3)
        dyn.gpr_err[1].set_sigma_n(1e-2)
        dyn.gpr_err[0].set_lambdas([2.0, 2.0, 2.0])
        assert abs(dyn.gpr_err[0].get_sigma_n() - 1e-3) < 1e-12
        assert abs(dyn.gpr_err[1].get_sigma_n() - 1e-2) < 1e-12
        np.testing.assert_allclose(dyn.gpr_err[0].get_lambdas(), 2.0)

    def test_append_and_rollout(self):
        dyn = Dynamics(state_dim=2, action_dim=1, capacity=64)
        for v in dyn.gpr_err:
            v.set_sigma_n(0.05)
            v.set_lambdas([3.0, 3.0, 3.0])
        s = RNG.uniform(-1, 1, (30, 2))
        a = RNG.uniform(-1, 1, (30, 1))
        ns = 0.9 * s + 0.1 * np.concatenate([a, a], axis=1)
        dyn.append_train_data(s, a, ns)
        assert dyn.gpr_err[0].num_train == 30

        means, covs = dyn.forward_propagate(3, np.array([0.5, -0.2]),
                                            RNG.uniform(-1, 1, (3, 1)))
        assert means.shape == (4, 2) and covs.shape == (4, 2, 2)
        assert np.all(np.isfinite(means))
        # index 0 is the initial state (dynamics.py:76-79)
        np.testing.assert_allclose(means[0], [0.5, -0.2], atol=1e-12)
        np.testing.assert_allclose(covs[0], 1e-3 * np.eye(2), atol=1e-12)

    def test_single_observation_append(self):
        dyn = Dynamics(state_dim=2, action_dim=1, capacity=8)
        dyn.append_train_data(np.array([0.1, 0.2]), np.array([0.5]),
                              np.array([0.15, 0.18]))
        assert dyn.gpr_err[0].num_train == 1

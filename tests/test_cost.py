"""Risk-sensitive cost tests: closed-form oracle comparisons (the reference's
test_mpc.py:15-57,169-274 pattern), the R_delta rate term, the gamma -> 0
limit, and the non-PD guard for gamma < 0."""

import jax.numpy as jnp
import numpy as np

import oracles
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost

RNG = np.random.default_rng(5)


def _params(ds=2, da=1, gamma=-1.0, with_rdelta=False):
    Q = 2.0 * np.eye(ds)
    R = 0.5 * np.eye(da)
    R_delta = 0.3 * np.eye(da) if with_rdelta else None
    x_ref = RNG.uniform(-1, 1, ds)
    u_ref = RNG.uniform(-1, 1, da)
    u_prev = RNG.uniform(-1, 1, da)
    return Q, R, R_delta, x_ref, u_ref, u_prev, gamma


def _traj(h=4, ds=2, da=1):
    means = RNG.uniform(-1, 1, (h + 1, ds))
    covs = np.zeros((h + 1, ds, ds))
    for i in range(h + 1):
        a = RNG.normal(size=(ds, ds)) * 0.1
        covs[i] = a @ a.T + 0.05 * np.eye(ds)
    u = RNG.uniform(-1, 1, (h, da))
    return means, covs, u


def _cp(Q, R, R_delta, x_ref, u_ref, u_prev, gamma):
    return CostParams(Q=jnp.asarray(Q), R=jnp.asarray(R),
                      gamma=jnp.asarray(gamma),
                      x_ref=jnp.asarray(x_ref), u_ref=jnp.asarray(u_ref),
                      R_delta=None if R_delta is None else jnp.asarray(R_delta),
                      u_prev=jnp.asarray(u_prev))


class TestCost:
    def test_vs_oracle_gamma_neg(self):
        Q, R, R_delta, x_ref, u_ref, u_prev, gamma = _params(gamma=-1.0)
        means, covs, u = _traj()
        c = risk_sensitive_cost(_cp(Q, R, R_delta, x_ref, u_ref, u_prev, gamma),
                                jnp.asarray(means), jnp.asarray(covs),
                                jnp.asarray(u))
        c_ref = oracles.risk_cost(Q, R, gamma, x_ref, u_ref, means, covs, u)
        np.testing.assert_allclose(float(c), c_ref, rtol=1e-9)

    def test_vs_oracle_gamma_pos_with_rdelta(self):
        Q, R, R_delta, x_ref, u_ref, u_prev, gamma = _params(
            gamma=0.7, with_rdelta=True)
        means, covs, u = _traj()
        c = risk_sensitive_cost(_cp(Q, R, R_delta, x_ref, u_ref, u_prev, gamma),
                                jnp.asarray(means), jnp.asarray(covs),
                                jnp.asarray(u))
        c_ref = oracles.risk_cost(Q, R, gamma, x_ref, u_ref, means, covs, u,
                                  R_delta=R_delta, u_prev=u_prev)
        np.testing.assert_allclose(float(c), c_ref, rtol=1e-9)

    def test_gamma_zero_limit(self):
        """gamma = 0 must equal the analytic limit AND the gamma -> 0 numeric
        limit of the general branch."""
        Q, R, R_delta, x_ref, u_ref, u_prev, _ = _params()
        means, covs, u = _traj()
        c0 = risk_sensitive_cost(_cp(Q, R, None, x_ref, u_ref, u_prev, 0.0),
                                 jnp.asarray(means), jnp.asarray(covs),
                                 jnp.asarray(u))
        c_small = risk_sensitive_cost(
            _cp(Q, R, None, x_ref, u_ref, u_prev, 1e-9),
            jnp.asarray(means), jnp.asarray(covs), jnp.asarray(u))
        c_ref = oracles.risk_cost(Q, R, 0.0, x_ref, u_ref, means, covs, u)
        np.testing.assert_allclose(float(c0), c_ref, rtol=1e-9)
        np.testing.assert_allclose(float(c0), float(c_small), rtol=1e-6)

    def test_scalar_case_closed_form(self):
        """1-D closed form (reference test_mpc.py:245-274 pattern): for ds=1,
        term = log(1 + g q s)/g + dx^2 / (1/q + g s)."""
        q, g = 2.0, -1.0
        means = np.array([[1.0], [0.5]])
        covs = np.array([[[0.2]], [[0.1]]])
        u = np.array([[0.3]])
        R = np.array([[0.5]])
        expected = 0.0
        for i in range(2):
            s = covs[i, 0, 0]
            dx = means[i, 0]
            expected += np.log(1 + g * q * s) / g + dx ** 2 / (1 / q + g * s)
        expected += 0.5 * 0.3 ** 2
        c = risk_sensitive_cost(
            _cp(np.array([[q]]), R, None, np.zeros(1), np.zeros(1),
                np.zeros(1), g),
            jnp.asarray(means), jnp.asarray(covs), jnp.asarray(u))
        np.testing.assert_allclose(float(c), expected, rtol=1e-9)

    def test_non_pd_guard_finite(self):
        """gamma < 0 with Sigma large enough that I + g Q Sigma loses PD-ness:
        reference NaNs (mpc.py:147-149); here the cost must stay finite and
        large."""
        Q = 2.0 * np.eye(2)
        means = np.zeros((2, 2))
        covs = np.stack([np.eye(2) * 5.0, np.eye(2) * 5.0])  # 1 - 10 < 0
        u = np.zeros((1, 1))
        c = risk_sensitive_cost(
            _cp(Q, np.eye(1), None, np.zeros(2), np.zeros(1), np.zeros(1), -1.0),
            jnp.asarray(means), jnp.asarray(covs), jnp.asarray(u))
        assert np.isfinite(float(c))
        assert float(c) > 1e5

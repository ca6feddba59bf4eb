"""Nominal-mean-model rollout semantics (VERDICT r1 item 9).

The reference's rollout silently ignores nominal models (its own flagged
limitation, /root/reference/src/dynamics.py:64-65). Here a GPState with
`config.nominal_fn` set propagates the nominal contribution through the
rollout: mean += f_nom(m), covariance += J S J^T + J cov(x*, f_gp) + (.)^T
(first-order, exact for affine f_nom). These tests pin that against a
Monte-Carlo oracle and check the routing guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from gpmpc_tpu.dynamics import build_rollout_cache, rollout, rollout_batched
from gpmpc_tpu.gp import state as gs

RNG = np.random.default_rng(23)

A = np.array([[0.9, 0.1], [-0.08, 0.85]])
B = np.array([[0.0], [0.12]])


def _nominal_fn(xs):
    """Affine nominal model over the joint input (state || action):
    f_nom(s, a) = A s + B a. xs: (n, 3) -> (n, 2)."""
    return xs[:, :2] @ jnp.asarray(A).T + xs[:, 2:] @ jnp.asarray(B).T


def _residual_gp(n=40):
    """GP on residuals of the true system  x' = A s + B a + 0.25 sin(s0)."""
    states = RNG.uniform(-2, 2, (n, 2))
    actions = RNG.uniform(-1, 1, (n, 1))
    nxt = (states @ A.T + actions @ B.T
           + 0.25 * np.stack([np.sin(states[:, 0]),
                              np.cos(2 * states[:, 1])], axis=1))
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=64, x_dim=3, out_dim=2, nominal_fn=_nominal_fn)
    gp = gs.make_gp(cfg, x, nxt, log_lambdas=np.log([2.0] * 3),
                    log_sigma_f=np.log(0.5), log_sigma_n=np.log(0.05),
                    dtype=jnp.float64)
    return gp, x, nxt


class TestNominalRollout:
    @pytest.mark.slow
    def test_one_step_vs_monte_carlo(self):
        """One rollout step with a nominal model vs a 300k-sample MC of
        f_nom(x*) + GP posterior at x* ~ N(u, S): mean within 2%, variance
        within 5% (the reference's own MC tolerances)."""
        gp, x_train, nxt = _residual_gp()
        cache = build_rollout_cache(gp, 2, 1)

        x0 = jnp.asarray([0.4, -0.3])
        u = jnp.asarray([[0.5]])
        init_var, act_var = 0.02, 1e-3
        means, covs = rollout(cache, x0, u, init_state_var=init_var,
                              action_var=act_var)
        m_ana = np.asarray(means[1])
        v_ana = np.asarray(jnp.diagonal(covs[1]))

        # MC oracle: joint input (s || a) ~ N((x0 || u), blockdiag)
        T = 300000
        mu = np.concatenate([np.asarray(x0), u[0]])
        S = np.diag([init_var, init_var, act_var])
        xs = RNG.multivariate_normal(mu, S, size=T)
        # residual-GP posterior per output (targets already have f_nom
        # subtracted inside make_gp)
        resid = nxt - np.asarray(_nominal_fn(jnp.asarray(x_train)))
        f_nom_s = np.asarray(_nominal_fn(jnp.asarray(xs)))
        m_mc, v_mc = np.zeros(2), np.zeros(2)
        ks = oracles.gram(xs, x_train, [2.0] * 3, 0.5)
        for e in range(2):
            _, ky_inv, beta = oracles.gp_fit(x_train, resid[:, e],
                                             [2.0] * 3, 0.5, 0.05)
            mus = ks @ beta
            var = 0.5 ** 2 - np.einsum('tn,nm,tm->t', ks, ky_inv, ks)
            tot = f_nom_s[:, e] + mus
            m_mc[e] = np.mean(tot)
            v_mc[e] = np.var(tot) + np.mean(var)

        np.testing.assert_allclose(m_ana, m_mc, rtol=0.02, atol=5e-3)
        np.testing.assert_allclose(v_ana, v_mc, rtol=0.05, atol=1e-4)

    def test_multi_step_means_track_truth(self):
        """5-step rollout means with the nominal model track the true system
        (the residual GP has dense coverage, so errors stay small). Without
        the nominal contribution the means would be residual-only — an error
        of O(|A x|), caught by the coarse bound here."""
        gp, _, _ = _residual_gp(n=60)
        cache = build_rollout_cache(gp, 2, 1)
        x0 = np.array([0.8, -0.5])
        us = RNG.uniform(-0.5, 0.5, (5, 1))
        means, _ = rollout(cache, jnp.asarray(x0), jnp.asarray(us))

        xt = x0.copy()
        for t in range(5):
            xt = (A @ xt + B @ us[t]
                  + 0.25 * np.array([np.sin(xt[0]), np.cos(2 * xt[1])]))
            np.testing.assert_allclose(np.asarray(means[t + 1]), xt, atol=0.1)

    def test_full_cov_psd_and_consistent(self):
        """full_cov=True with a nominal model: diagonal matches the diag path
        and the matrix stays PSD."""
        gp, _, _ = _residual_gp()
        cache = build_rollout_cache(gp, 2, 1)
        x0 = jnp.asarray([0.4, -0.3])
        us = jnp.asarray(RNG.uniform(-0.5, 0.5, (3, 1)))
        _, covs_d = rollout(cache, x0, us)
        means_f, covs_f = rollout(cache, x0, us, full_cov=True)
        w = np.linalg.eigvalsh(np.asarray(covs_f))
        assert np.all(w >= -1e-12)
        # The diag path has no cross-output terms, so the variances agree only
        # to the coupling magnitude; they must match closely here.
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(covs_f, axis1=1, axis2=2)),
            np.asarray(jnp.diagonal(covs_d, axis1=1, axis2=2)),
            rtol=0.15, atol=1e-3)


class TestNominalGuards:
    def test_delta_plus_nominal_raises(self):
        gp, _, _ = _residual_gp()
        cache = build_rollout_cache(gp, 2, 1)
        with pytest.raises(ValueError, match='mutually exclusive'):
            rollout(cache, jnp.zeros(2), jnp.zeros((2, 1)), delta=True)

    def test_batched_raises_and_solve_batch_routes(self):
        from gpmpc_tpu.mpc.cost import CostParams
        from gpmpc_tpu.mpc.solver import SolverConfig
        from gpmpc_tpu.parallel.batch import solve_batch

        gp, _, _ = _residual_gp()
        cache = build_rollout_cache(gp, 2, 1)
        with pytest.raises(NotImplementedError):
            rollout_batched(cache, jnp.zeros((2, 2)), jnp.zeros((2, 3, 1)))

        params = CostParams(Q=jnp.eye(2, dtype=jnp.float64),
                            R=0.01 * jnp.eye(1, dtype=jnp.float64),
                            gamma=jnp.asarray(0.0, jnp.float64),
                            x_ref=jnp.zeros(2, jnp.float64),
                            u_ref=jnp.zeros(1, jnp.float64))
        res = solve_batch(gp, 2, 1, jnp.zeros((2, 2), jnp.float64), params,
                          horizon=3, lb=-1.0, ub=1.0,
                          solver=SolverConfig(max_iters=5))
        assert np.all(np.isfinite(np.asarray(res.cost)))

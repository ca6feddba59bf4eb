"""Rollout tests: lax.scan multi-step propagation vs a step-by-step NumPy oracle
(the pattern of test_dynamics.py:134-196), full-covariance mode, and
differentiability w.r.t. actions."""

import jax
import jax.numpy as jnp
import numpy as np

import oracles
from gpmpc_tpu.dynamics import build_rollout_cache, rollout
from gpmpc_tpu.gp import state as gs

RNG = np.random.default_rng(11)


def _setup(n=15, ds=2, da=1, cap=24):
    states = RNG.uniform(-1, 1, (n, ds))
    actions = RNG.uniform(-1, 1, (n, da))
    next_states = states + 0.1 * np.concatenate(
        [actions, np.sin(states[:, :1])], axis=1)[:, :ds] + 0.05 * states
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=cap, x_dim=ds + da, out_dim=ds)
    gp = gs.make_gp(cfg, x, next_states, log_lambdas=np.log([2.0] * (ds + da)),
                    log_sigma_f=np.log(1.3), log_sigma_n=np.log(0.05),
                    dtype=jnp.float64)
    return gp, x, next_states, ds, da


def _oracle_rollout(x, y, lam, sf, sn, x0, actions, horizon, ds, da,
                    init_var=1e-3, act_var=1e-3):
    """Step-by-step NumPy moment-matching rollout, diagonal covariance."""
    means = [np.asarray(x0, float)]
    covs = [init_var * np.eye(ds)]
    fits = [oracles.gp_fit(x, y[:, e], lam, sf, sn) for e in range(ds)]
    for t in range(horizon):
        u = np.concatenate([means[-1], actions[t]])
        S = np.zeros((ds + da, ds + da))
        S[:ds, :ds] = covs[-1]
        S[ds:, ds:] = act_var * np.eye(da)
        new_mean = np.zeros(ds)
        new_var = np.zeros(ds)
        for e in range(ds):
            ky, ky_inv, beta = fits[e]
            m, _ = oracles.mean_prop(u, S, x, beta, lam, sf)
            v, _ = oracles.variance_prop(u, S, x, beta, ky_inv, lam, sf)
            new_mean[e] = m
            new_var[e] = v
        means.append(new_mean)
        covs.append(np.diag(new_var))
    return np.asarray(means), np.asarray(covs)


class TestRollout:
    def test_vs_stepwise_oracle(self):
        gp, x, y, ds, da = _setup()
        lam = np.full(ds + da, 2.0)
        horizon = 4
        x0 = np.array([0.3, -0.2])
        actions = RNG.uniform(-1, 1, (horizon, da))
        cache = build_rollout_cache(gp, ds, da)
        means, covs = rollout(cache, jnp.asarray(x0), jnp.asarray(actions))
        m_ref, c_ref = _oracle_rollout(x, y, lam, 1.3, 0.05, x0, actions,
                                       horizon, ds, da)
        np.testing.assert_allclose(np.asarray(means), m_ref, atol=1e-7)
        np.testing.assert_allclose(np.asarray(covs), c_ref, atol=1e-7)

    def test_full_cov_diag_matches_and_symmetric(self):
        gp, x, y, ds, da = _setup()
        horizon = 3
        x0 = np.array([0.3, -0.2])
        actions = RNG.uniform(-1, 1, (horizon, da))
        cache = build_rollout_cache(gp, ds, da)
        _, covs_d = rollout(cache, jnp.asarray(x0), jnp.asarray(actions),
                            full_cov=False)
        means_f, covs_f = rollout(cache, jnp.asarray(x0), jnp.asarray(actions),
                                  full_cov=True)
        covs_f = np.asarray(covs_f)
        # Step 1's input distribution is identical in both modes, so the first
        # propagated diagonal must match exactly.
        np.testing.assert_allclose(np.diagonal(covs_f[1]),
                                   np.diagonal(np.asarray(covs_d)[1]), atol=1e-9)
        np.testing.assert_allclose(covs_f, np.swapaxes(covs_f, 1, 2), atol=1e-12)

    def test_full_cov_offdiag_vs_oracle(self):
        gp, x, y, ds, da = _setup()
        x0 = np.array([0.3, -0.2])
        actions = RNG.uniform(-1, 1, (1, da))
        cache = build_rollout_cache(gp, ds, da)
        means, covs = rollout(cache, jnp.asarray(x0), jnp.asarray(actions),
                              full_cov=True)
        lam = np.full(ds + da, 2.0)
        u = np.concatenate([x0, actions[0]])
        S = np.zeros((ds + da, ds + da))
        S[:ds, :ds] = 1e-3 * np.eye(ds)
        S[ds:, ds:] = 1e-3 * np.eye(da)
        _, ki1, b1 = oracles.gp_fit(x, y[:, 0], lam, 1.3, 0.05)
        _, ki2, b2 = oracles.gp_fit(x, y[:, 1], lam, 1.3, 0.05)
        m1, _ = oracles.mean_prop(u, S, x, b1, lam, 1.3)
        m2, _ = oracles.mean_prop(u, S, x, b2, lam, 1.3)
        c_ref = oracles.covariance_prop(u, S, x, b1, b2, lam, lam, 1.3, 1.3,
                                        m1, m2)
        np.testing.assert_allclose(np.asarray(covs)[1, 0, 1], c_ref, atol=1e-8)

    def test_grad_flows_to_actions_only(self):
        gp, x, y, ds, da = _setup()
        cache = build_rollout_cache(gp, ds, da)
        x0 = jnp.asarray([0.3, -0.2])

        def loss(actions):
            means, covs = rollout(cache, x0, actions)
            return jnp.sum(means ** 2) + jnp.sum(covs)

        g = jax.grad(loss)(jnp.zeros((4, da)))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 1e-8)

    def test_fd_gradient_check(self):
        """Finite-difference check of the rollout+cost gradient (reference
        pattern test_mpc.py:276-341, eps=1e-2 noted there; exact math here so
        a smaller eps works in f64)."""
        gp, x, y, ds, da = _setup()
        cache = build_rollout_cache(gp, ds, da)
        x0 = jnp.asarray([0.3, -0.2])

        def loss(actions):
            means, covs = rollout(cache, x0, actions)
            return jnp.sum(means ** 2) + 0.5 * jnp.sum(covs)

        u0 = jnp.asarray(RNG.uniform(-0.5, 0.5, (3, da)))
        g = np.asarray(jax.grad(loss)(u0))
        eps = 1e-6
        for t in range(3):
            d = np.zeros((3, da))
            d[t, 0] = eps
            fd = (float(loss(u0 + d)) - float(loss(u0 - d))) / (2 * eps)
            np.testing.assert_allclose(g[t, 0], fd, rtol=1e-4, atol=1e-7)

    def test_padding_invariance(self):
        gp_s, x, y, ds, da = _setup(cap=15)
        cfg_l = gs.GPConfig(capacity=40, x_dim=ds + da, out_dim=ds)
        gp_l = gs.make_gp(cfg_l, x, y, log_lambdas=np.log([2.0] * (ds + da)),
                          log_sigma_f=np.log(1.3), log_sigma_n=np.log(0.05),
                          dtype=jnp.float64)
        x0 = jnp.asarray([0.3, -0.2])
        actions = jnp.asarray(RNG.uniform(-1, 1, (4, da)))
        m_s, c_s = rollout(build_rollout_cache(gp_s, ds, da), x0, actions)
        m_l, c_l = rollout(build_rollout_cache(gp_l, ds, da), x0, actions)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_l), atol=1e-9)
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_l), atol=1e-9)

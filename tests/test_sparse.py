"""Sparse (FITC) GP tests: exactness when Z = X, predictive accuracy vs exact
GP, moment-prop/rollout interoperability, FITC marginal likelihood."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.dynamics import build_rollout_cache, rollout
from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.gp.exact import predict
from gpmpc_tpu.gp.sparse import fit_sparse, select_inducing

RNG = np.random.default_rng(51)


def _data(n=60, d=2, e=2):
    x = RNG.uniform(-2, 2, (n, d))
    y = np.stack([np.sin(1.5 * x[:, 0]) + 0.3 * x[:, 1],
                  np.cos(x[:, 1]) - 0.2 * x[:, 0]], axis=1)
    y += 0.05 * RNG.normal(size=y.shape)
    return x, y


def _hp(e, d, lam=1.0, sf=1.0, sn=0.1):
    return (jnp.log(jnp.full((e, d), lam)), jnp.log(jnp.full((e,), sf)),
            jnp.log(jnp.full((e,), sn)))


class TestSparseGP:
    def test_full_inducing_matches_exact(self):
        """Z = X makes FITC exact (Qff = Kff, Lam = sigma_n^2 I)."""
        x, y = _data(n=30)
        ll, lf, ln = _hp(2, 2)
        state, ml = fit_sparse(jnp.asarray(x), jnp.asarray(x),
                               jnp.asarray(y.T), ll, lf, ln, jitter=1e-12)
        cfg = gs.GPConfig(capacity=30, x_dim=2, out_dim=2)
        exact = gs.make_gp(cfg, x, y, log_sigma_n=np.log(0.1),
                           dtype=jnp.float64)
        xp = RNG.uniform(-2, 2, (6, 2))
        m_s, v_s = predict(state, jnp.asarray(xp))
        m_e, v_e = predict(exact, jnp.asarray(xp))
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_e), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_e), atol=1e-6)
        from gpmpc_tpu.gp.exact import log_marginal_likelihood
        np.testing.assert_allclose(np.asarray(ml),
                                   np.asarray(log_marginal_likelihood(exact)),
                                   atol=1e-6)

    def test_subset_inducing_approximates(self):
        x, y = _data(n=120)
        z = select_inducing(jax.random.PRNGKey(0), jnp.asarray(x), 40)
        ll, lf, ln = _hp(2, 2)
        state, _ = fit_sparse(z, jnp.asarray(x), jnp.asarray(y.T), ll, lf, ln)
        cfg = gs.GPConfig(capacity=120, x_dim=2, out_dim=2)
        exact = gs.make_gp(cfg, x, y, log_sigma_n=np.log(0.1),
                           dtype=jnp.float64)
        xp = RNG.uniform(-1.5, 1.5, (20, 2))
        m_s, _ = predict(state, jnp.asarray(xp))
        m_e, _ = predict(exact, jnp.asarray(xp))
        rms = float(np.sqrt(np.mean((np.asarray(m_s) - np.asarray(m_e)) ** 2)))
        assert rms < 0.1, rms

    def test_rollout_interop(self):
        """A sparse state drives the SAME rollout machinery (BASELINE config 4:
        M-point basis, horizon 50)."""
        n = 150
        states = RNG.uniform(-1, 1, (n, 2))
        actions = RNG.uniform(-1, 1, (n, 1))
        nxt = 0.95 * states + 0.1 * np.concatenate([actions, actions], axis=1)
        x = np.concatenate([states, actions], axis=1)
        z = select_inducing(jax.random.PRNGKey(1), jnp.asarray(x), 32)
        ll, lf, ln = _hp(2, 3, lam=3.0, sf=0.5)
        sp, _ = fit_sparse(z, jnp.asarray(x), jnp.asarray((nxt - states).T),
                           ll, lf, ln)
        cache = build_rollout_cache(sp, 2, 1)
        u = jnp.asarray(RNG.uniform(-1, 1, (50, 1)))
        means, covs = rollout(cache, jnp.asarray([0.5, -0.5]), u, delta=True)
        assert means.shape == (51, 2)
        assert np.all(np.isfinite(np.asarray(means)))
        diag = np.asarray(jax.vmap(jnp.diagonal)(covs))
        assert np.all(diag >= 0)

    def test_sparse_vs_exact_rollout_close(self):
        n = 150
        states = RNG.uniform(-1, 1, (n, 2))
        actions = RNG.uniform(-1, 1, (n, 1))
        nxt = 0.9 * states + 0.1 * np.concatenate([actions, actions], axis=1)
        x = np.concatenate([states, actions], axis=1)
        deltas = nxt - states
        ll, lf, ln = _hp(2, 3, lam=3.0, sf=0.5, sn=0.05)
        z = select_inducing(jax.random.PRNGKey(2), jnp.asarray(x), 60)
        sp, _ = fit_sparse(z, jnp.asarray(x), jnp.asarray(deltas.T), ll, lf, ln)
        cfg = gs.GPConfig(capacity=n, x_dim=3, out_dim=2)
        ex = gs.make_gp(cfg, x, deltas, log_lambdas=np.log(3.0),
                        log_sigma_f=np.log(0.5), log_sigma_n=np.log(0.05),
                        dtype=jnp.float64)
        u = jnp.asarray(RNG.uniform(-0.5, 0.5, (5, 1)))
        m_s, _ = rollout(build_rollout_cache(sp, 2, 1),
                         jnp.asarray([0.3, -0.2]), u, delta=True)
        m_e, _ = rollout(build_rollout_cache(ex, 2, 1),
                         jnp.asarray([0.3, -0.2]), u, delta=True)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_e), atol=0.05)


class TestInducingOptimization:
    def test_optimized_beats_random(self):
        """Gradient-refined Z must raise the FITC ML over its random-subset
        start, and improve held-out predictive RMSE (VERDICT r1 item 10)."""
        from gpmpc_tpu.gp.sparse import optimize_inducing

        x, y = _data(n=80)
        x_te = RNG.uniform(-2, 2, (40, 2))
        y_te = np.stack([np.sin(1.5 * x_te[:, 0]) + 0.3 * x_te[:, 1],
                         np.cos(x_te[:, 1]) - 0.2 * x_te[:, 0]], axis=1)
        ll, lsf, lsn = _hp(2, 2)
        z0 = select_inducing(jax.random.PRNGKey(3), jnp.asarray(x), 8)

        sp0, ml0 = fit_sparse(z0, jnp.asarray(x), jnp.asarray(y.T),
                              ll, lsf, lsn)
        sp1, ml1 = optimize_inducing(z0, jnp.asarray(x), jnp.asarray(y.T),
                                     ll, lsf, lsn, num_iters=120, lr=0.05)
        assert float(jnp.sum(ml1)) > float(jnp.sum(ml0)) + 1.0, (
            float(jnp.sum(ml0)), float(jnp.sum(ml1)))

        def rmse(sp):
            mean, _ = predict(sp, jnp.asarray(x_te))        # (n, E)
            return float(jnp.sqrt(jnp.mean((mean - jnp.asarray(y_te)) ** 2)))

        assert rmse(sp1) < rmse(sp0), (rmse(sp0), rmse(sp1))

    def test_optimized_state_interops_with_rollout(self):
        from gpmpc_tpu.gp.sparse import optimize_inducing

        x, y = _data(n=60, d=3)
        ll, lsf, lsn = _hp(2, 3)
        z0 = select_inducing(jax.random.PRNGKey(5), jnp.asarray(x), 8)
        sp, _ = optimize_inducing(z0, jnp.asarray(x), jnp.asarray(y.T),
                                  ll, lsf, lsn, num_iters=30)
        cache = build_rollout_cache(sp, 2, 1)
        means, covs = rollout(cache, jnp.asarray([0.1, -0.2]),
                              jnp.asarray(RNG.uniform(-1, 1, (3, 1))))
        assert np.all(np.isfinite(np.asarray(means)))
        assert np.all(np.isfinite(np.asarray(covs)))

"""Delta-dynamics rollout tests: input-output covariance vs Monte Carlo, the
delta-mode mean/covariance recursion vs a direct MC rollout through the GP
posterior, and the variance floor."""

import jax
import jax.numpy as jnp
import numpy as np

import oracles
from gpmpc_tpu.dynamics import build_rollout_cache, rollout
from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.ops import moments

RNG = np.random.default_rng(17)


class TestInputOutputCov:
    def test_vs_monte_carlo(self):
        """cov(x*, f(x*)) under x* ~ N(u, S): analytic vs 200k-sample MC of the
        posterior mean function (the IO-cov term only involves m(.))."""
        n, d = 15, 2
        x = RNG.uniform(-2, 2, (n, d))
        y = np.sin(x[:, 0]) + 0.3 * x[:, 1]
        lam = np.array([1.0, 1.5])
        sf, sn = 1.2, 0.1
        u = np.array([0.3, -0.2])
        S = np.array([[0.12, 0.02], [0.02, 0.08]])

        cfg = gs.GPConfig(capacity=16, x_dim=2, out_dim=1)
        gp = gs.make_gp(cfg, x, y[:, None], log_lambdas=np.log(lam),
                        log_sigma_f=np.log(sf), log_sigma_n=np.log(sn),
                        dtype=jnp.float64)
        m, l = moments.mean_prop(jnp.asarray(u), jnp.asarray(S), gp.x,
                                 gp.beta[0], gp.log_lambdas[0],
                                 gp.log_sigma_f[0], gp.mask)
        c = moments.input_output_cov(jnp.asarray(u), jnp.asarray(S), gp.x,
                                     gp.beta[0], l, gp.log_lambdas[0])

        _, _, beta = oracles.gp_fit(x, y, lam, sf, sn)
        T = 200000
        xs = RNG.multivariate_normal(u, S, size=T)
        ks = oracles.gram(xs, x, lam, sf)
        mus = ks @ beta
        mc = np.asarray([np.cov(xs[:, i], mus)[0, 1] for i in range(d)])
        np.testing.assert_allclose(np.asarray(c), mc, atol=5e-3)


def _delta_setup(n=40):
    """GP trained on deltas of a damped linear system x' = A x + B u."""
    A = np.array([[0.95, 0.08], [-0.05, 0.9]])
    B = np.array([[0.0], [0.1]])
    states = RNG.uniform(-1, 1, (n, 2))
    actions = RNG.uniform(-1, 1, (n, 1))
    nxt = states @ A.T + actions @ B.T
    deltas = nxt - states
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=48, x_dim=3, out_dim=2)
    gp = gs.make_gp(cfg, x, deltas, log_lambdas=np.log([3.0] * 3),
                    log_sigma_f=np.log(0.3), log_sigma_n=np.log(0.05),
                    dtype=jnp.float64)
    return gp, A, B


class TestDeltaRollout:
    def test_mean_recursion(self):
        """Delta-mode means must equal x_t + E[delta] step by step."""
        gp, A, B = _delta_setup()
        cache = build_rollout_cache(gp, 2, 1)
        x0 = jnp.asarray([0.5, -0.3])
        u = jnp.asarray(RNG.uniform(-1, 1, (4, 1)))
        means, covs = rollout(cache, x0, u, delta=True)
        # manual recursion with the same moment ops
        mean, cov = x0, 1e-3 * jnp.eye(2)
        for t in range(4):
            jm = jnp.concatenate([mean, u[t]])
            jc = jnp.zeros((3, 3)).at[:2, :2].set(cov).at[2, 2].set(1e-3)
            gp_m = []
            for e in range(2):
                m_e, _ = moments.mean_prop(jm, jc, gp.x, gp.beta[e],
                                           gp.log_lambdas[e], gp.log_sigma_f[e],
                                           gp.mask)
                gp_m.append(float(m_e))
            mean = mean + jnp.asarray(gp_m)
            cov = covs[t + 1]
            np.testing.assert_allclose(np.asarray(means[t + 1]),
                                       np.asarray(mean), atol=1e-9)

    def test_vs_mc_rollout(self):
        """3-step delta rollout vs a 40k-sample MC through the GP posterior
        means with resampled per-step GP noise (the reference's MC-rollout
        oracle pattern, test_dynamics.py:198-268)."""
        gp, A, B = _delta_setup()
        cache = build_rollout_cache(gp, 2, 1)
        x0 = np.array([0.5, -0.3])
        u = RNG.uniform(-0.8, 0.8, (3, 1))
        means, covs = rollout(cache, jnp.asarray(x0), jnp.asarray(u),
                              delta=True, full_cov=True)

        T = 40000
        xs = RNG.multivariate_normal(x0, 1e-3 * np.eye(2), size=T)
        from gpmpc_tpu.gp.exact import predict
        for t in range(3):
            ut = np.repeat(u[t][None, :], T, axis=0)
            ut = ut + RNG.normal(scale=np.sqrt(1e-3), size=ut.shape)
            inp = np.concatenate([xs, ut], axis=1)
            m, v = predict(gp, jnp.asarray(inp), full_cov=False)
            m = np.asarray(m)
            v = np.maximum(np.asarray(v), 0)
            delta = m + RNG.normal(size=m.shape) * np.sqrt(v)
            xs = xs + delta
        mc_mean = xs.mean(axis=0)
        mc_cov = np.cov(xs.T)
        np.testing.assert_allclose(np.asarray(means[3]), mc_mean, atol=0.02)
        np.testing.assert_allclose(np.asarray(covs[3]), mc_cov, atol=0.05,
                                   rtol=0.15)

    def test_variance_floor(self):
        """Propagated covariance diagonals never go negative, even when pushed
        far outside the data (where moment matching misbehaves)."""
        gp, _, _ = _delta_setup(n=10)
        cache = build_rollout_cache(gp, 2, 1)
        x0 = jnp.asarray([30.0, -30.0])     # far from training data
        u = jnp.asarray(RNG.uniform(-1, 1, (6, 1)))
        for fc in (False, True):
            _, covs = rollout(cache, x0, u, delta=True, full_cov=fc)
            diag = np.asarray(jax.vmap(jnp.diagonal)(covs))
            assert np.all(diag >= 0.0), diag
            assert np.all(np.isfinite(np.asarray(covs)))

    def test_non_delta_unchanged(self):
        """delta=False must reproduce the raw next-state semantics (regression
        guard for the shared code path)."""
        gp, _, _ = _delta_setup()
        cache = build_rollout_cache(gp, 2, 1)
        x0 = jnp.asarray([0.2, 0.1])
        u = jnp.asarray(RNG.uniform(-1, 1, (3, 1)))
        means, _ = rollout(cache, x0, u, delta=False)
        jm = jnp.concatenate([x0, u[0]])
        jc = jnp.zeros((3, 3)).at[:2, :2].set(1e-3 * jnp.eye(2)).at[2, 2].set(1e-3)
        m0, _ = moments.mean_prop(jm, jc, gp.x, gp.beta[0], gp.log_lambdas[0],
                                  gp.log_sigma_f[0], gp.mask)
        np.testing.assert_allclose(float(means[1, 0]), float(m0), atol=1e-12)

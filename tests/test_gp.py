"""GP core tests — oracle comparisons vs NumPy loop implementations,
padding invariance, append semantics, nominal-model residuals.
(Mirrors the reference's test strategy: test_gpr.py oracle patterns, SURVEY.md §4.)"""

import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.gp.exact import log_marginal_likelihood, predict
from gpmpc_tpu.gp.kernels import se_gram

RNG = np.random.default_rng(42)


def _data(n=25, d=3, e=2):
    x = RNG.uniform(-2, 2, (n, d))
    y = RNG.normal(size=(n, e))
    return x, y


def _mk(x, y, cap, lambdas, sigma_f, sigma_n):
    n, d = x.shape
    e = y.shape[1]
    cfg = gs.GPConfig(capacity=cap, x_dim=d, out_dim=e)
    return gs.make_gp(cfg, x, y,
                      log_lambdas=np.log(lambdas),
                      log_sigma_f=np.log(sigma_f),
                      log_sigma_n=np.log(sigma_n), dtype=jnp.float64)


class TestKernel:
    def test_gram_vs_loop_oracle(self):
        x, _ = _data()
        lambdas = np.array([0.7, 1.3, 2.1])
        k = se_gram(jnp.asarray(x), jnp.asarray(x),
                    jnp.log(jnp.asarray(lambdas)), jnp.log(jnp.asarray(1.7)))
        k_ref = oracles.gram(x, x, lambdas, 1.7)
        np.testing.assert_allclose(np.asarray(k), k_ref, atol=1e-10)

    def test_gram_cross(self):
        x, _ = _data(20)
        z = RNG.uniform(-2, 2, (7, 3))
        lambdas = np.array([2.0, 2.0, 2.0])
        k = se_gram(jnp.asarray(z), jnp.asarray(x),
                    jnp.log(jnp.asarray(lambdas)), jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(k), oracles.gram(z, x, lambdas, 1.0),
                                   atol=1e-10)


class TestPosterior:
    @pytest.mark.parametrize('sigma_f,sigma_n', [(1.0, 0.1), (3.0, 1e-4)])
    def test_predict_vs_oracle(self, sigma_f, sigma_n):
        x, y = _data()
        lambdas = np.array([1.0, 2.0, 0.5])
        gp = _mk(x, y, 32, lambdas, sigma_f, sigma_n)
        xp = RNG.uniform(-2, 2, (5, 3))
        mean, cov = predict(gp, jnp.asarray(xp), full_cov=True)
        for e in range(2):
            m_ref, c_ref = oracles.gp_predict(x, y[:, e], xp, lambdas,
                                              sigma_f, sigma_n)
            np.testing.assert_allclose(np.asarray(mean)[:, e], m_ref, atol=1e-7)
            np.testing.assert_allclose(np.asarray(cov)[e], c_ref, atol=1e-7)

    def test_predict_marginal_vs_full(self):
        x, y = _data()
        gp = _mk(x, y, 32, [1.0, 1.0, 1.0], 1.5, 0.01)
        xp = RNG.uniform(-2, 2, (4, 3))
        _, var = predict(gp, jnp.asarray(xp), full_cov=False)
        _, cov = predict(gp, jnp.asarray(xp), full_cov=True)
        np.testing.assert_allclose(np.asarray(var),
                                   np.diagonal(np.asarray(cov), axis1=1, axis2=2).T,
                                   atol=1e-9)

    def test_include_noise(self):
        x, y = _data()
        gp = _mk(x, y, 32, [1.0, 1.0, 1.0], 1.0, 0.3)
        xp = RNG.uniform(-2, 2, (4, 3))
        _, v0 = predict(gp, jnp.asarray(xp), full_cov=False, include_noise=False)
        _, v1 = predict(gp, jnp.asarray(xp), full_cov=False, include_noise=True)
        np.testing.assert_allclose(np.asarray(v1 - v0), 0.09 * np.ones((4, 2)),
                                   atol=1e-9)

    def test_padding_invariance(self):
        """Same data in different capacities must give identical posteriors."""
        x, y = _data()
        gp_s = _mk(x, y, 25, [1.0, 2.0, 0.5], 2.0, 0.05)
        gp_l = _mk(x, y, 64, [1.0, 2.0, 0.5], 2.0, 0.05)
        xp = RNG.uniform(-2, 2, (6, 3))
        m_s, c_s = predict(gp_s, jnp.asarray(xp), full_cov=True)
        m_l, c_l = predict(gp_l, jnp.asarray(xp), full_cov=True)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_l), atol=1e-9)
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_l), atol=1e-9)
        np.testing.assert_allclose(np.asarray(log_marginal_likelihood(gp_s)),
                                   np.asarray(log_marginal_likelihood(gp_l)),
                                   atol=1e-9)


class TestMarginalLikelihood:
    def test_vs_oracle(self):
        x, y = _data()
        lambdas = np.array([1.0, 2.0, 0.5])
        gp = _mk(x, y, 40, lambdas, 1.3, 0.2)
        ml = np.asarray(log_marginal_likelihood(gp))
        for e in range(2):
            np.testing.assert_allclose(
                ml[e], oracles.log_ml(x, y[:, e], lambdas, 1.3, 0.2), atol=1e-7)


class TestAppend:
    def test_incremental_equals_batch(self):
        x, y = _data(10)
        cfg = gs.GPConfig(capacity=16, x_dim=3, out_dim=2)
        gp_inc = gs.make_gp(cfg, dtype=jnp.float64)
        for i in range(10):
            gp_inc = gs.append(gp_inc, x[i], y[i])
        gp_batch = gs.make_gp(cfg, x, y, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(gp_inc.beta),
                                   np.asarray(gp_batch.beta), atol=1e-9)
        assert int(gp_inc.count) == 10

    def test_append_matrix(self):
        x, y = _data(12)
        cfg = gs.GPConfig(capacity=20, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, x[:5], y[:5], dtype=jnp.float64)
        gp = gs.append(gp, x[5:], y[5:])
        gp_ref = gs.make_gp(cfg, x, y, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(gp.beta), np.asarray(gp_ref.beta),
                                   atol=1e-9)

    def test_overflow_drops(self):
        x, y = _data(5)
        cfg = gs.GPConfig(capacity=4, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, dtype=jnp.float64)
        for i in range(5):
            gp = gs.append(gp, x[i], y[i])
        assert int(gp.count) == 4
        np.testing.assert_allclose(np.asarray(gp.x), x[:4], atol=1e-12)

    def test_grow(self):
        x, y = _data(8)
        cfg = gs.GPConfig(capacity=8, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, x, y, dtype=jnp.float64)
        gp2 = gs.grow(gp, 16)
        xp = RNG.uniform(-2, 2, (3, 3))
        m1, _ = predict(gp, jnp.asarray(xp))
        m2, _ = predict(gp2, jnp.asarray(xp))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-9)


class TestNominalModel:
    def test_residual_semantics(self):
        """GP with nominal mean f_nom must equal f_nom(x*) + GP fit on residuals
        (reference gpr.py:306-309)."""
        x, y = _data()

        def f_nom(xs):
            return jnp.stack([xs[:, 0] * 0.5, jnp.sin(xs[:, 1])], axis=1)

        cfg = gs.GPConfig(capacity=32, x_dim=3, out_dim=2, nominal_fn=f_nom)
        gp = gs.make_gp(cfg, x, y, dtype=jnp.float64)

        resid = y - np.asarray(f_nom(jnp.asarray(x)))
        cfg0 = gs.GPConfig(capacity=32, x_dim=3, out_dim=2)
        gp0 = gs.make_gp(cfg0, x, resid, dtype=jnp.float64)

        xp = RNG.uniform(-2, 2, (5, 3))
        m, c = predict(gp, jnp.asarray(xp), full_cov=True)
        m0, c0 = predict(gp0, jnp.asarray(xp), full_cov=True)
        np.testing.assert_allclose(np.asarray(m),
                                   np.asarray(m0) + np.asarray(f_nom(jnp.asarray(xp))),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c0), atol=1e-9)


class TestHyperparams:
    def test_set_hyperparams_refits(self):
        x, y = _data()
        gp = _mk(x, y, 32, [1.0, 1.0, 1.0], 1.0, 0.1)
        gp2 = gs.set_hyperparams(gp, lambdas=[2.0, 2.0, 2.0], sigma_f=1.5,
                                 sigma_n=0.01)
        xp = RNG.uniform(-2, 2, (3, 3))
        m2, _ = predict(gp2, jnp.asarray(xp))
        m_ref, _ = oracles.gp_predict(x, y[:, 0], xp, np.full(3, 2.0), 1.5, 0.01)
        np.testing.assert_allclose(np.asarray(m2)[:, 0], m_ref, atol=1e-7)

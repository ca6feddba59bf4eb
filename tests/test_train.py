"""Hyperparameter-training tests (reference update_hyperparams semantics,
gpr.py:334-370): ML increases, early stop on gradient norm, frozen parameters,
noise floor projection."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.gp.exact import log_marginal_likelihood
from gpmpc_tpu.gp.train import train_hyperparams

RNG = np.random.default_rng(21)


def _gp(n=30, d=2, e=2, sn=0.3):
    x = RNG.uniform(-2, 2, (n, d))
    y = np.stack([np.sin(x[:, 0]) + 0.1 * RNG.normal(size=n),
                  0.5 * x[:, 1] ** 2 + 0.1 * RNG.normal(size=n)], axis=1)
    cfg = gs.GPConfig(capacity=32, x_dim=d, out_dim=e)
    return gs.make_gp(cfg, x, y, log_sigma_n=np.log(sn), dtype=jnp.float64)


class TestTrain:
    def test_ml_increases(self):
        gp = _gp()
        ml0 = np.asarray(log_marginal_likelihood(gp))
        res = train_hyperparams(gp, num_iters=100, lr=0.1)
        ml1 = np.asarray(res.log_ml)
        assert np.all(ml1 > ml0)
        assert int(res.iters) <= 100

    def test_early_stop(self):
        # A loose tolerance must trigger the early stop well before the cap
        # (Adam with lr 0.1 rarely reaches |grad| < 1e-5 exactly — the
        # reference has the same practical behavior, gpr.py:367-370).
        gp = _gp()
        res = train_hyperparams(gp, num_iters=2000, lr=0.05, tol=1e-1)
        assert int(res.iters) < 2000
        assert float(res.grad_norm) < 1e-1

    def test_frozen_sigma_n(self):
        gp = _gp(sn=0.25)
        res = train_hyperparams(gp, num_iters=50, train_sigma_n=False)
        np.testing.assert_allclose(np.asarray(res.state.sigma_n), 0.25,
                                   rtol=1e-12)
        # Other params did move.
        assert not np.allclose(np.asarray(res.state.log_lambdas),
                               np.asarray(gp.log_lambdas))

    def test_min_sigma_n_floor(self):
        # Noise-free targets drive sigma_n -> 0 without a floor.
        x = RNG.uniform(-2, 2, (25, 2))
        y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1])], axis=1)
        cfg = gs.GPConfig(capacity=32, x_dim=2, out_dim=2)
        gp = gs.make_gp(cfg, x, y, log_sigma_n=np.log(0.1), dtype=jnp.float64)
        res = train_hyperparams(gp, num_iters=300, lr=0.1, min_sigma_n=1e-2)
        assert np.all(np.asarray(res.state.sigma_n) >= 1e-2 - 1e-12)

    def test_jittable(self):
        gp = _gp()
        res = jax.jit(lambda s: train_hyperparams(s, num_iters=30))(gp)
        assert np.all(np.isfinite(np.asarray(res.log_ml)))

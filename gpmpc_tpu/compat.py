"""Drop-in compatibility facades mirroring the reference's class API.

A user of `Thiagodcv/gaussian-process-mpc` interacts with four classes:
`GaussianProcessRegression` (gpr.py:5), `Dynamics` (dynamics.py:8),
`RiskSensitiveMPC` (mpc.py:7) and `Simulator` (simulator.py:5). The MPC and
Simulator live in gpmpc_tpu.mpc.controller / gpmpc_tpu.sim.simulator; this
module provides the first two with the reference's exact method surface
(NumPy in / NumPy out), implemented on the functional JAX core.

Deliberate behavior differences (all safe upgrades, flagged here):
  - setters refit the cached factorizations immediately — the reference
    requires a manual `build_Ky_inv_mat()` after `set_*` (gpr.py:53) and
    silently computes garbage if you forget; `build_Ky_inv_mat()` is kept as a
    no-op-compatible explicit refit.
  - factorizations are Cholesky/eigh-based, never `linalg.inv`/`det`
    (gpr.py:171,246).
  - the training-set buffer has a fixed capacity (default 1024) and grows by
    repadding when exceeded, instead of unbounded torch.cat (gpr.py:118).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.gp.exact import log_marginal_likelihood, predict
from gpmpc_tpu.gp.kernels import se_gram
from gpmpc_tpu.gp.train import train_hyperparams
from gpmpc_tpu.dynamics import build_rollout_cache, rollout


class GaussianProcessRegression:
    """Reference gpr.py:5 surface on the JAX core. Single-output exact GP with
    ARD-SE kernel and optional nominal mean model."""

    def __init__(self, x_dim: int, nominal_model: Optional[Callable] = None,
                 capacity: int = 1024, dtype=jnp.float64):
        self.x_dim = int(x_dim)
        self.dtype = dtype
        nominal_fn = None
        if nominal_model is not None:
            nominal_fn = lambda xs: jnp.reshape(nominal_model(xs), (-1, 1))
        self._cfg = gs.GPConfig(capacity=capacity, x_dim=x_dim, out_dim=1,
                                nominal_fn=nominal_fn)
        self.state = gs.make_gp(self._cfg, dtype=dtype)
        self.f_nom = nominal_model

    # -- data ------------------------------------------------------------
    @property
    def num_train(self) -> int:
        return int(self.state.count)

    @property
    def X_train(self) -> np.ndarray:
        return np.asarray(self.state.x[:self.num_train])

    @property
    def y_train(self) -> np.ndarray:
        return np.asarray(self.state.y[0, :self.num_train])[:, None]

    def append_train_data(self, x, y):
        """x: (x_dim,) or (n, x_dim); y: scalar or (n,) (gpr.py:90-122)."""
        y = np.asarray(y, np.float64).reshape(-1, 1)
        x = np.asarray(x, np.float64).reshape(-1, self.x_dim)
        n_new = self.num_train + x.shape[0]
        if n_new > self.state.config.capacity:
            self.state = gs.grow(self.state, max(n_new, 2 * self.state.config.capacity))
        self.state = gs.append(self.state, x, y)

    # -- hyperparameters (gpr.py:51-88) ----------------------------------
    def set_lambdas(self, lambdas):
        self.state = gs.set_hyperparams(self.state, lambdas=np.asarray(lambdas))

    def get_lambdas(self) -> np.ndarray:
        return np.asarray(self.state.lambdas[0])

    def set_sigma_f(self, sigma_f: float):
        self.state = gs.set_hyperparams(self.state, sigma_f=float(sigma_f))

    def get_sigma_f(self) -> float:
        return float(self.state.sigma_f[0])

    def set_sigma_n(self, sigma_n: float):
        self.state = gs.set_hyperparams(self.state, sigma_n=float(sigma_n))

    def get_sigma_n(self) -> float:
        return float(self.state.sigma_n[0])

    # -- kernel matrices (views; reference exposes them as attributes) ---
    @property
    def Kf(self) -> np.ndarray:
        n = self.num_train
        k = se_gram(self.state.x[:n], self.state.x[:n],
                    self.state.log_lambdas[0], self.state.log_sigma_f[0])
        return np.asarray(k)

    @property
    def Ky(self) -> np.ndarray:
        n = self.num_train
        return self.Kf + float(self.state.sigma_n[0]) ** 2 * np.eye(n)

    @property
    def Ky_inv(self) -> np.ndarray:
        n = self.num_train
        return np.asarray(self.state.kinv[0, :n, :n])

    def build_Ky_inv_mat(self):
        """Explicit refit (reference gpr.py:159; here setters already refit)."""
        self.state = gs.fit(self.state)

    def se_kernel(self, x1, x2) -> float:
        from gpmpc_tpu.gp.kernels import se_kernel
        return float(se_kernel(jnp.asarray(x1, self.dtype).ravel(),
                               jnp.asarray(x2, self.dtype).ravel(),
                               self.state.log_lambdas[0],
                               self.state.log_sigma_f[0]))

    # -- inference (gpr.py:240-332) --------------------------------------
    def compute_marginal_likelihood(self) -> float:
        return float(log_marginal_likelihood(self.state)[0])

    def compute_pred_train_covariance(self, X_pred) -> np.ndarray:
        xp = np.asarray(X_pred, np.float64)
        single = xp.ndim == 1
        xp2 = np.atleast_2d(xp)
        k = se_gram(jnp.asarray(xp2, self.dtype), self.state.x,
                    self.state.log_lambdas[0], self.state.log_sigma_f[0])
        k = np.asarray(k)[:, :self.num_train]
        return k[0] if single else k

    def predict_latent_vars(self, X_pred, covar: bool = False,
                            targets: bool = False):
        xp = np.asarray(X_pred, np.float64)
        single = xp.ndim == 1
        xp2 = np.atleast_2d(xp)
        mean, cov = predict(self.state, jnp.asarray(xp2, self.dtype),
                            full_cov=True, include_noise=targets)
        mean = np.asarray(mean)[:, 0]
        if single:
            mean = mean[0]
        if not covar:
            return mean, None
        cov = np.asarray(cov)[0]
        if single:
            cov = cov[0, 0]
        return mean, cov

    # -- training (gpr.py:334-370) ---------------------------------------
    def update_hyperparams(self, num_iters: int = 1000, verbose: bool = False):
        res = train_hyperparams(self.state, num_iters=num_iters, lr=0.1,
                                tol=1e-5)
        self.state = res.state
        if verbose:
            print('iters:', int(res.iters), 'ml:', float(res.log_ml[0]),
                  'lambdas:', self.get_lambdas(),
                  'sigma_f:', self.get_sigma_f(),
                  'sigma_n:', self.get_sigma_n())
        return res


class _GPRView:
    """Per-output view into the shared multi-output GPState, so reference-style
    code like `dynamics.gpr_err[i].set_sigma_n(1e-5)` works
    (pretrain_pendulum.py:53-55)."""

    def __init__(self, owner: 'Dynamics', idx: int):
        self._owner = owner
        self._idx = idx

    def _hp(self, **kw):
        s = self._owner.state
        e, i = s.log_lambdas.shape[0], self._idx
        dt = s.log_lambdas.dtype
        if 'lambdas' in kw:
            val = jnp.log(jnp.asarray(kw['lambdas'], dt))
            # Per-output setter: can't cheaply prove the rows still tie.
            s = s.replace(
                log_lambdas=s.log_lambdas.at[i].set(val),
                config=s.config.replace(tied_lambdas=False))
        if 'sigma_f' in kw:
            s = s.replace(log_sigma_f=s.log_sigma_f.at[i].set(
                jnp.log(jnp.asarray(kw['sigma_f'], dt))))
        if 'sigma_n' in kw:
            s = s.replace(log_sigma_n=s.log_sigma_n.at[i].set(
                jnp.log(jnp.asarray(kw['sigma_n'], dt))))
        self._owner.state = gs.fit(s)

    def set_lambdas(self, lambdas):
        self._hp(lambdas=lambdas)

    def set_sigma_f(self, sigma_f):
        self._hp(sigma_f=sigma_f)

    def set_sigma_n(self, sigma_n):
        self._hp(sigma_n=sigma_n)

    def get_lambdas(self):
        return np.asarray(self._owner.state.lambdas[self._idx])

    def get_sigma_f(self):
        return float(self._owner.state.sigma_f[self._idx])

    def get_sigma_n(self):
        return float(self._owner.state.sigma_n[self._idx])

    @property
    def num_train(self):
        return int(self._owner.state.count)

    @property
    def X_train(self):
        n = self.num_train
        return np.asarray(self._owner.state.x[:n])

    @property
    def y_train(self):
        n = self.num_train
        return np.asarray(self._owner.state.y[self._idx, :n])[:, None]


class Dynamics:
    """Reference dynamics.py:8 surface: a bundle of per-state-dim GPs over
    x = (state ‖ action), with multi-step uncertain rollout."""

    def __init__(self, state_dim: int, action_dim: int,
                 nominal_models: Optional[Sequence[Callable]] = None,
                 capacity: int = 1024, dtype=jnp.float64):
        self.state_dim = int(state_dim)
        self.action_dim = int(action_dim)
        nominal_fn = None
        if nominal_models is not None:
            models = list(nominal_models)

            def nominal_fn(xs):
                s, a = xs[:, :state_dim], xs[:, state_dim:]
                return jnp.stack([m(s, a) for m in models], axis=1)

        self._cfg = gs.GPConfig(capacity=capacity,
                                x_dim=state_dim + action_dim,
                                out_dim=state_dim, nominal_fn=nominal_fn)
        self.state = gs.make_gp(self._cfg, dtype=dtype)
        self.gpr_err: List[_GPRView] = [_GPRView(self, i)
                                        for i in range(state_dim)]
        self.nominal_models = nominal_models

    def append_train_data(self, state, action, next_state):
        """dynamics.py:39-60 semantics (single or batch observations)."""
        state = np.atleast_2d(np.asarray(state, np.float64))
        action = np.asarray(action, np.float64)
        if action.ndim == 1 and state.shape[0] > 1:
            action = action[:, None]
        action = np.atleast_2d(action)
        next_state = np.atleast_2d(np.asarray(next_state, np.float64))
        x = np.concatenate([state, action], axis=1)
        n_new = int(self.state.count) + x.shape[0]
        if n_new > self.state.config.capacity:
            self.state = gs.grow(self.state,
                                 max(n_new, 2 * self.state.config.capacity))
        self.state = gs.append(self.state, x, next_state)

    def forward_propagate(self, horizon: int, curr_state, actions):
        """dynamics.py:62-124 / 126-191: H-step uncertain rollout. Returns
        (state_means (H+1, ds), state_covars (H+1, ds, ds)) as NumPy."""
        cache = build_rollout_cache(self.state, self.state_dim,
                                    self.action_dim)
        dt = self.state.x.dtype
        means, covs = rollout(cache, jnp.asarray(curr_state, dt),
                              jnp.asarray(actions, dt).reshape(
                                  horizon, self.action_dim))
        return np.asarray(means), np.asarray(covs)

    # The reference maintains NumPy and torch twins (dynamics.py:62, 126);
    # here there is one jitted path.
    forward_propagate_torch = forward_propagate

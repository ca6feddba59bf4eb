"""Sparse (inducing-point, FITC) GP regression.

New capability over the reference (SURVEY.md §7: BASELINE config 4 wants an
M=128 inducing-point GP with horizon-50 rollouts; the reference has exact GPs
only). Design insight that keeps the rest of the framework unchanged: the FITC
posterior has exactly the exact-GP algebraic form over the inducing set Z —

    mean(x*) = k(x*, Z) alpha
    var(x*)  = sigma_f^2 - k(x*, Z) W k(Z, x*)

with  B = Kzz + Kzx Lam^{-1} Kxz,  alpha = B^{-1} Kzx Lam^{-1} y,
      W = Kzz^{-1} - B^{-1},  Lam = diag(sigma_f^2 - qff) + sigma_n^2 I.

So `fit_sparse` returns a regular GPState whose buffer holds Z with
beta = alpha and kinv = W — and the uncertain-input moment propagation,
rollout cache, Pallas kernels, controller, and batch solver all work verbatim
on it, with N^2 cost replaced by M^2 (the moment-matching integrals only ever
see the basis set and the quadratic form).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from gpmpc_tpu.gp.kernels import se_gram_batched
from gpmpc_tpu.gp.state import GPConfig, GPState
from gpmpc_tpu.utils.linalg import chol_inverse, chol_solve, f32_matmul_precision


def select_inducing(key: jax.Array, x: jax.Array, m: int) -> jax.Array:
    """Random-subset inducing selection (the standard strong baseline; see
    optimize_inducing for the gradient-refined variant)."""
    idx = jax.random.choice(key, x.shape[0], (m,), replace=False)
    return x[idx]


def optimize_inducing(z0: jax.Array, x: jax.Array, y: jax.Array,
                      log_lambdas: jax.Array, log_sigma_f: jax.Array,
                      log_sigma_n: jax.Array,
                      mask: Optional[jax.Array] = None,
                      num_iters: int = 150, lr: float = 0.05):
    """Gradient refinement of the inducing inputs Z: Adam ascent on the FITC
    log marginal likelihood (summed over outputs), which `fit_sparse` already
    returns as a differentiable function of Z. One jitted `lax.scan`.

    Returns (state, ml): the refitted GPState at the optimized Z and its
    per-output FITC ML (E,). Hyperparameters are held fixed (train them with
    gp.train on the exact model, or alternate the two loops)."""
    import optax

    def neg_ml(z):
        _, ml = fit_sparse(z, x, y, log_lambdas, log_sigma_f, log_sigma_n,
                           mask)
        return -jnp.sum(ml)

    opt = optax.adam(lr)

    @jax.jit
    def run(z0):
        def step(carry, _):
            z, opt_state = carry
            g = jax.grad(neg_ml)(z)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(z, updates), opt_state), None

        (z, _), _ = jax.lax.scan(step, (z0, opt.init(z0)), None,
                                 length=num_iters)
        return z

    return fit_sparse(run(z0), x, y, log_lambdas, log_sigma_f, log_sigma_n,
                      mask)


@f32_matmul_precision
def fit_sparse(z: jax.Array, x: jax.Array, y: jax.Array,
               log_lambdas: jax.Array, log_sigma_f: jax.Array,
               log_sigma_n: jax.Array,
               mask: Optional[jax.Array] = None,
               jitter: float = 1e-6) -> GPState:
    """FITC fit. z: (M, d) inducing inputs; x: (N, d); y: (E, N) targets;
    hyperparameters shaped as in GPState ((E, d), (E,), (E,)).

    Returns (state, ml): a GPState over the inducing set (state.x = z,
    state.beta = alpha, state.kinv = W; state.logdet is left zero — the exact
    ML identity does not carry over) and the per-output FITC log marginal
    likelihood (E,).
    """
    m_ind, d = z.shape
    e = y.shape[0]
    dt = z.dtype
    if mask is None:
        mask = jnp.ones((x.shape[0],), bool)
    mw = mask.astype(dt)

    def one(log_lam, log_sf, log_sn, y_e):
        sf2 = jnp.exp(2.0 * log_sf)
        sn2 = jnp.exp(2.0 * log_sn)
        kzz = se_gram_batched(z, z, log_lam[None], log_sf[None])[0]
        kzz = kzz + (jitter * sf2 + 1e-12) * jnp.eye(m_ind, dtype=dt)
        kzx = se_gram_batched(z, x, log_lam[None], log_sf[None])[0]
        kzx = kzx * mw[None, :]

        lzz = jnp.linalg.cholesky(kzz)
        v = jax.scipy.linalg.solve_triangular(lzz, kzx, lower=True)  # (M, N)
        qff = jnp.sum(v * v, axis=0)                                 # (N,)
        # FITC heteroscedastic noise; padded columns get 1.0 (inert).
        lam = jnp.where(mask, sf2 - qff + sn2, 1.0)
        lam = jnp.maximum(lam, sn2)            # guard qff > sf2 roundoff

        kxl = kzx / lam[None, :]                                     # (M, N)
        b = kzz + kxl @ kzx.T
        b = 0.5 * (b + b.T)
        lb = jnp.linalg.cholesky(b)
        y_m = y_e * mw
        alpha = chol_solve(lb, (kxl @ y_m)[:, None])[:, 0]           # (M,)
        kzz_inv = chol_inverse(lzz)
        b_inv = chol_inverse(lb)
        w = kzz_inv - b_inv

        # FITC log marginal likelihood
        n_val = jnp.sum(mw)
        quad = jnp.sum(y_m * y_m / lam) - y_m @ kxl.T @ chol_solve(lb, kxl @ y_m)
        logdet = (2.0 * jnp.sum(jnp.log(jnp.diagonal(lb)))
                  - 2.0 * jnp.sum(jnp.log(jnp.diagonal(lzz)))
                  + jnp.sum(jnp.where(mask, jnp.log(lam), 0.0)))
        ml = -0.5 * quad - 0.5 * logdet - 0.5 * n_val * math.log(2.0 * math.pi)
        return alpha, w, ml

    alpha, w, ml = jax.vmap(one)(log_lambdas, log_sigma_f, log_sigma_n, y)

    from gpmpc_tpu.gp.state import _rows_tied
    cfg = GPConfig(capacity=m_ind, x_dim=d, out_dim=e,
                   tied_lambdas=_rows_tied(log_lambdas))
    state = GPState(
        config=cfg, x=z,
        y=jnp.zeros((e, m_ind), dt),          # raw targets live elsewhere
        mask=jnp.ones((m_ind,), bool),
        count=jnp.asarray(m_ind, jnp.int32),
        log_lambdas=log_lambdas, log_sigma_f=log_sigma_f,
        log_sigma_n=log_sigma_n,
        kinv=w, beta=alpha,
        logdet=jnp.zeros((e,), dt),
        jitter_used=jnp.zeros((e,), dt),
    )
    return state, ml

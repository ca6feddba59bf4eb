"""Exact GP posterior prediction and marginal likelihood.

Reference semantics: gpr.py:240-332 (`compute_marginal_likelihood`,
`compute_pred_train_covariance`, `predict_latent_vars`), Rasmussen & Williams
eqs. 2.23-2.24. Differences by design (SURVEY.md §7):
  - Cholesky solves instead of the cached explicit inverse for prediction.
  - log-ML via 2*sum(log diag chol) instead of log(det(Ky)) (gpr.py:246
    overflows/underflows for moderate N; not copied).
  - Batched over E outputs sharing X (reference loops one object per output).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gpmpc_tpu.gp.kernels import se_gram_batched
from gpmpc_tpu.gp.state import GPState, residuals
from gpmpc_tpu.utils.linalg import f32_matmul_precision


@f32_matmul_precision
def predict(state: GPState, x_pred: jax.Array, full_cov: bool = False,
            include_noise: bool = False):
    """Posterior mean (and covariance) at test points.

    x_pred: (P, x_dim) or (x_dim,).
    Returns (mean, cov):
      mean: (P, E)
      cov:  (E, P, P) if full_cov else (P, E) marginal variances.
    include_noise=True adds sigma_n^2 to the diagonal (predicting targets y, not
    latent f — reference `targets=True`, gpr.py:330).
    """
    single = x_pred.ndim == 1
    xp = jnp.atleast_2d(x_pred).astype(state.x.dtype)
    mvalid = state.mask.astype(xp.dtype)

    k_star = se_gram_batched(xp, state.x, state.log_lambdas, state.log_sigma_f)
    k_star = k_star * mvalid[None, None, :]            # (E, P, cap)

    mean = jnp.einsum('epn,en->pe', k_star, state.beta)
    if state.config.nominal_fn is not None:
        mean = mean + state.config.nominal_fn(xp)

    # sol = Ky^{-1} k_star^T per output (regularized inverse cached at fit).
    sol = jnp.einsum('enm,epm->enp', state.kinv, k_star)   # (E, cap, P)
    if full_cov:
        k_pp = se_gram_batched(xp, xp, state.log_lambdas, state.log_sigma_f)
        cov = k_pp - jnp.einsum('epn,enq->epq', k_star, sol)
        if include_noise:
            eye = jnp.eye(xp.shape[0], dtype=xp.dtype)
            cov = cov + jnp.exp(2.0 * state.log_sigma_n)[:, None, None] * eye
    else:
        k_pp_diag = jnp.exp(2.0 * state.log_sigma_f)[:, None]            # (E, 1)
        var = k_pp_diag - jnp.einsum('epn,enp->ep', k_star, sol)
        if include_noise:
            var = var + jnp.exp(2.0 * state.log_sigma_n)[:, None]
        cov = var.T                                                       # (P, E)

    if single:
        mean = mean[0]
        cov = cov[:, 0, 0] if full_cov else cov[0]
    return mean, cov


def log_marginal_likelihood(state: GPState) -> jax.Array:
    """Per-output log marginal likelihood, shape (E,).

    -1/2 r^T Ky^{-1} r - 1/2 log det Ky - n/2 log 2pi  on the valid block
    (reference: gpr.py:240-251; padded rows contribute 0 to both the quadratic
    form and the log-det by construction of the masked factorization)."""
    resid = residuals(state)                     # (E, cap), zero where padded
    quad = jnp.sum(resid * state.beta, axis=-1)  # (E,)
    n = state.count.astype(resid.dtype)
    return -0.5 * quad - 0.5 * state.logdet - 0.5 * n * math.log(2.0 * math.pi)

"""Risk-sensitive MPC cost.

Reference semantics (mpc.py:118-200, `cost` / `cost_torch`):

  J = sum_{i=0..H} [ (1/gamma) log det(I + gamma Q Sigma_i)
                     + (x_i - x_ref)^T (Q^{-1} + gamma Sigma_i)^{-1} (x_i - x_ref) ]
    + sum_{j=0..H-1} (u_j - u_ref)^T R (u_j - u_ref)
    + sum_{j=0..H-1} du_j^T R_delta du_j          (du = diff of [u_prev; u])

gamma < 0 is risk-averse, gamma > 0 risk-seeking (README.md:2-9). Two hardenings
the reference lacks (SURVEY.md hard parts 5):
  - the exact gamma -> 0 risk-neutral limit  tr(Q Sigma) + dx^T Q dx  is
    implemented (the reference divides by gamma and NaNs at 0; BASELINE config 1
    wants gamma = 0),
  - log det(I + gamma Q Sigma) is guarded: if the matrix leaves the PD cone
    (possible for gamma < 0 with large Sigma) a large finite penalty is returned
    instead of NaN, keeping the solver's line of sight.

All (ds, ds) terms are vectorized over the horizon with vmap; the whole cost is
one fused XLA computation differentiable w.r.t. u (and x0 through the rollout).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpmpc_tpu.utils.linalg import f32_matmul_precision
from gpmpc_tpu.utils.smallchol import chol_small, solve_lower_small, solve_psd_small

_PD_PENALTY = 1e6


class CostParams(NamedTuple):
    Q: jax.Array                    # (ds, ds)
    R: jax.Array                    # (da, da)
    gamma: jax.Array                # () risk sensitivity
    x_ref: jax.Array                # (ds,)
    u_ref: jax.Array                # (da,)
    R_delta: Optional[jax.Array] = None   # (da, da) or None (static)
    u_prev: Optional[jax.Array] = None    # (da,) last applied input for du cost


def _stage_state_cost(Q, gamma, x, sig, x_ref):
    """Risk term for one step: (1/g) log det(I + g Q Sig) + dx^T (Q^{-1}+g Sig)^{-1} dx,
    with the exact g -> 0 limit tr(Q Sig) + dx^T Q dx.

    Both general-branch pieces reduce to ONE Cholesky of the symmetric matrix
    G = Q^{-1} + g Sig:  det(I + g Q Sig) = det(Q) det(G), and G is PD exactly
    when I + g Q Sig has all eigenvalues positive (substitute y = Q^{-1/2} x:
    both conditions read 1 + g eig(Q^{1/2} Sig Q^{1/2}) > 0). A failed Cholesky
    (NaN diagonal) therefore *is* the PD-cone test, and triggers the finite
    penalty instead of the reference's NaN (mpc.py:147-149)."""
    ds = Q.shape[0]
    dt = x.dtype
    dx = x - x_ref
    eye = jnp.eye(ds, dtype=dt)

    is_zero = gamma == 0.0
    g = jnp.where(is_zero, jnp.ones((), dt), gamma)

    # All (ds, ds) factorizations are unrolled elementwise ops (smallchol) —
    # XLA's batched cholesky/triangular_solve at these sizes is a per-step
    # bottleneck on TPU.
    q_chol = chol_small(Q)
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.diagonal(q_chol)))
    q_inv = solve_psd_small(Q, eye)

    G = q_inv + g * sig
    g_chol = chol_small(G)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(g_chol)))
    # Double-where: compute with a sanitized G so NaNs never enter the selected
    # branch's gradient graph.
    g_chol_safe = jnp.where(ok, g_chol, eye)
    logdet_g = 2.0 * jnp.sum(jnp.log(jnp.diagonal(g_chol_safe)))
    logdet_term = (logdet_q + logdet_g) / g

    w = solve_lower_small(g_chol_safe, dx[:, None])[:, 0]
    quad_general = jnp.sum(w * w)

    limit = jnp.trace(Q @ sig) + dx @ Q @ dx
    general = jnp.where(ok, logdet_term + quad_general, _PD_PENALTY)
    return jnp.where(is_zero, limit, general)


@f32_matmul_precision
def risk_sensitive_cost(params: CostParams, means: jax.Array, covs: jax.Array,
                        u: jax.Array) -> jax.Array:
    """means: (H+1, ds), covs: (H+1, ds, ds), u: (H, da) -> scalar."""
    state_terms = jax.vmap(_stage_state_cost, in_axes=(None, None, 0, 0, None))(
        params.Q, params.gamma, means, covs, params.x_ref)
    cost = jnp.sum(state_terms)

    du_ref = u - params.u_ref[None, :]
    cost = cost + jnp.sum((du_ref @ params.R) * du_ref)

    if params.R_delta is not None:
        u_prev = params.u_prev
        if u_prev is None:
            u_prev = jnp.zeros((u.shape[1],), u.dtype)
        u_ext = jnp.concatenate([u_prev[None, :], u], axis=0)
        du = jnp.diff(u_ext, axis=0)
        cost = cost + jnp.sum((du @ params.R_delta) * du)
    return cost

"""ARD squared-exponential kernel assembly.

Reference semantics: gpr.py:124-135 (`se_kernel`) and gpr.py:159-171
(`build_Ky_inv_mat`): k(x1, x2) = sigma_f^2 * exp(-1/2 (x1-x2)^T Lambda^{-1} (x1-x2))
with Lambda = diag(lambdas). The reference assembles the Gram matrix with a scaled
`torch.cdist`; here it is the same scaled-distance trick expressed as one MXU matmul
plus fused elementwise exp (see utils/linalg.sq_dists).

Hyperparameters are stored in log space exactly as the reference does
(gpr.py:38-40), so `lambdas = exp(log_lambdas)` etc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpmpc_tpu.utils.accurate import exp_f32 as _exp
from gpmpc_tpu.utils.linalg import sq_dists


def se_kernel(x1: jax.Array, x2: jax.Array, log_lambdas: jax.Array,
              log_sigma_f: jax.Array) -> jax.Array:
    """Kernel value between two single points (D,). Mirrors gpr.py:124."""
    inv_lam = _exp(-log_lambdas)
    d = x1 - x2
    return _exp(2.0 * log_sigma_f) * _exp(-0.5 * jnp.sum(d * d * inv_lam))


def se_gram(x1: jax.Array, x2: jax.Array, log_lambdas: jax.Array,
            log_sigma_f: jax.Array) -> jax.Array:
    """Gram matrix K(x1, x2): (N, M) for x1 (N, D), x2 (M, D).

    Scaling each input by Lambda^{-1/2} turns the Mahalanobis distance into a
    Euclidean one, so the whole Gram matrix is one matmul + exp
    (reference does the same via torch.cdist, gpr.py:167-169).
    """
    inv_sqrt_lam = _exp(-0.5 * log_lambdas)
    a = x1 * inv_sqrt_lam
    b = x2 * inv_sqrt_lam
    return _exp(2.0 * log_sigma_f) * _exp(-0.5 * sq_dists(a, b))


# Batched over E independent outputs sharing the same inputs (the reference keeps
# one GPR object per state dimension, dynamics.py:33; here the output axis is vmapped).
se_gram_batched = jax.vmap(se_gram, in_axes=(None, None, 0, 0))

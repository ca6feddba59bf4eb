"""Masked / padded linear-algebra helpers.

TPU/XLA wants static shapes, so the growing GP training set of the reference
(gpr.py:90-122 `append_train_data` + full rebuild) becomes a fixed-capacity padded
buffer with a validity mask. These helpers keep the padded rows inert: a masked
Gram matrix gets an identity block on the padded diagonal so Cholesky / solves
stay well-posed and contribute nothing to posteriors or log-determinants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_matmul_precision(fn):
    """Run `fn`'s traced matmuls at true f32 precision.

    On TPU, XLA lowers f32 matmuls to bf16 MXU passes by DEFAULT, which is
    catastrophic for GP linear algebra: the Gram-matrix assembly and Cholesky
    factorization lose ~3 decimal digits and the factorization of a moderately
    conditioned Ky (sigma_n = 0.1, cond ~ 5e4) outright fails. Wrapping the
    kernel-assembly / factorization / moment-contraction paths in
    default_matmul_precision('float32') (3-pass bf16 decomposition, true-f32
    accurate) restores exact-GP quality at a ~3x matmul cost on only these ops.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision('float32'):
            return fn(*args, **kwargs)
    return wrapper


def sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distances between rows of `a` (N,D) and `b` (M,D).

    Computed MXU-style: ||a||^2 + ||b||^2 - 2 a b^T, clamped at 0 to kill the
    tiny negative values the cross-term form produces in low precision.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)          # (N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T        # (1, M)
    cross = a @ b.T                                      # (N, M) — MXU
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)


def masked_psd_add(K: jax.Array, mask: jax.Array, diag_add: jax.Array | float) -> jax.Array:
    """Masked Ky assembly: zero padded rows/cols of K, add `diag_add` to the valid
    diagonal (Ky = Kf + sigma_n^2 I on the valid block), and put 1.0 on the padded
    diagonal so the factorization of the padded block is exact identity and does
    not pollute solves or log-dets."""
    m = mask.astype(K.dtype)
    m2 = m[:, None] * m[None, :]
    Km = K * m2
    diag_extra = jnp.where(mask, jnp.asarray(diag_add, K.dtype), 0.0)
    # padded diagonal: Km diag is 0 there; set it to 1
    pad_diag = jnp.where(mask, 0.0, 1.0).astype(K.dtype)
    return Km + jnp.diag(diag_extra + pad_diag)


def chol_solve(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given lower Cholesky factor of A. b: (N,) or (N, M)."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def chol_inverse(chol: jax.Array) -> jax.Array:
    """Explicit inverse from a Cholesky factor (used where repeated elementwise
    contractions against the inverse are cheaper than repeated solves —
    the moment-propagation trace terms)."""
    eye = jnp.eye(chol.shape[-1], dtype=chol.dtype)
    return chol_solve(chol, eye)


def chol_logdet(chol: jax.Array) -> jax.Array:
    """log det(A) from its Cholesky factor. Padded rows carry 1.0 on the factor
    diagonal and contribute log(1) = 0."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


def solve_psd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Cholesky solve of a small PSD system (the (d,d) input-distribution blocks
    in moment propagation; d = state_dim + action_dim, typically 3-6)."""
    chol = jnp.linalg.cholesky(A)
    return chol_solve(chol, b)


def logdet_psd(A: jax.Array) -> jax.Array:
    chol = jnp.linalg.cholesky(A)
    return chol_logdet(chol)

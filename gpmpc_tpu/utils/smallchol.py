"""Unrolled small-matrix Cholesky and triangular solves.

The moment-propagation step and the risk-sensitive cost factorize many tiny
(d, d) SPD matrices (d = state_dim + action_dim, typically 3-6) batched over
scenarios. XLA lowers batched `cholesky`/`triangular_solve` at these sizes to
row-loops with dynamic slicing — on TPU that costs ~1 ms per op instead of
microseconds and dominates the whole rollout (measured: a mean-only H=20
rollout spent 31 of 53 ms in this overhead). Unrolling the factorization over
the *static* dimension d turns it into ~d^3/6 fused elementwise ops over the
batch, which the VPU eats for free.

All functions take (..., d, d) / (..., d, m) arrays; the leading batch dims are
arbitrary. Python loops run over the static d only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this size the unrolled code bloats the HLO for no benefit; fall back.
MAX_UNROLL_DIM = 8


def chol_small(a: jax.Array) -> jax.Array:
    """Lower Cholesky factor of (..., d, d) SPD matrices, unrolled over d."""
    d = a.shape[-1]
    if d > MAX_UNROLL_DIM:
        return jnp.linalg.cholesky(a)
    col = [[None] * d for _ in range(d)]     # col[i][j] = L[..., i, j], j <= i
    for j in range(d):
        s = a[..., j, j]
        for k in range(j):
            s = s - col[j][k] * col[j][k]
        ljj = jnp.sqrt(s)
        col[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, d):
            s = a[..., i, j]
            for k in range(j):
                s = s - col[i][k] * col[j][k]
            col[i][j] = s * inv
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [jnp.stack([col[i][j] if j <= i else zero for j in range(d)], axis=-1)
            for i in range(d)]
    return jnp.stack(rows, axis=-2)


def solve_lower_small(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L x = b by unrolled forward substitution. b: (..., d, m)."""
    d = l.shape[-1]
    if d > MAX_UNROLL_DIM:
        return jax.scipy.linalg.solve_triangular(l, b, lower=True)
    xs = []
    for i in range(d):
        s = b[..., i, :]
        for k in range(i):
            s = s - l[..., i, k][..., None] * xs[k]
        xs.append(s / l[..., i, i][..., None])
    return jnp.stack(xs, axis=-2)


def solve_upper_small(lt_as_l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L^T x = b (given the LOWER factor) by unrolled back substitution."""
    d = lt_as_l.shape[-1]
    if d > MAX_UNROLL_DIM:
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(lt_as_l, -1, -2), b, lower=False)
    xs = [None] * d
    for i in reversed(range(d)):
        s = b[..., i, :]
        for k in range(i + 1, d):
            # (L^T)[i, k] = L[k, i]
            s = s - lt_as_l[..., k, i][..., None] * xs[k]
        xs[i] = s / lt_as_l[..., i, i][..., None]
    return jnp.stack(xs, axis=-2)


def solve_psd_small(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for small SPD A via unrolled Cholesky.
    b: (..., d, m) or (..., d) — vector RHS handled like numpy.linalg.solve."""
    vector_rhs = b.ndim == a.ndim - 1
    if vector_rhs:
        b = b[..., None]
    l = chol_small(a)
    x = solve_upper_small(l, solve_lower_small(l, b))
    return x[..., 0] if vector_rhs else x


def logdet_psd_small(a: jax.Array) -> jax.Array:
    """log det of small SPD matrices via the unrolled factor."""
    l = chol_small(a)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1)

"""Jitted box-constrained trajectory optimizer — the TPU-native replacement for
the reference's CPU IPOPT callback loop (mpc.py:269-330).

The reference already runs IPOPT deliberately degraded — line search disabled,
tol 1e-4, max_iter 300 (mpc.py:308-320) — i.e. it is used as a bounded-budget
first-order-ish descender. Here the solve is a single jitted `lax.while_loop` of
projected-Adam steps with the same budget semantics:

  - gradients come from `jax.grad` through the scan rollout + cost (the
    reference pays a Python<->C++ callback and a device sync per IPOPT iterate,
    SURVEY.md §3.2; here the whole solve stays on device),
  - box constraints are handled by projection (clip) — the reference has box
    bounds only, no state constraints (mpc.py:257-267, README.md:18),
  - convergence is declared on the projected-gradient residual
    ||u - clip(u - grad)||_inf < tol, the first-order optimality condition for
    box-constrained problems,
  - the whole solver is vmappable: thousands of independent solves batch across
    a mesh (see gpmpc_tpu.parallel).

Cold start at u = 0 mirrors the reference (mpc.py:292-293, which notes that
warm-starting from the previous trajectory caused local-minima issues); warm
starting is still available via `u_init`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SolverConfig:
    max_iters: int = struct.field(pytree_node=False, default=300)
    tol: float = struct.field(pytree_node=False, default=1e-4)
    learning_rate: float = struct.field(pytree_node=False, default=0.1)
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)
    # Final polishing: a few projected-gradient steps with decaying step size to
    # tighten boundary activity after Adam's adaptive scaling.
    polish_iters: int = struct.field(pytree_node=False, default=0)


class SolveResult(NamedTuple):
    u: jax.Array          # (H, da) optimal action trajectory
    cost: jax.Array       # () objective at u
    iters: jax.Array      # () iterations taken
    pg_norm: jax.Array    # () final projected-gradient residual (inf-norm)


def solve_trajectory(objective: Callable[[jax.Array], jax.Array],
                     u_init: jax.Array, lb: jax.Array, ub: jax.Array,
                     config: SolverConfig = SolverConfig()) -> SolveResult:
    """Minimize `objective(u)` over the box [lb, ub] (broadcast against u).

    objective: (H, da) -> scalar, jax-differentiable.
    """
    dt = u_init.dtype
    lb = jnp.broadcast_to(jnp.asarray(lb, dt), u_init.shape)
    ub = jnp.broadcast_to(jnp.asarray(ub, dt), u_init.shape)
    grad_fn = jax.grad(objective)
    lr = jnp.asarray(config.learning_rate, dt)

    def proj(u):
        return jnp.clip(u, lb, ub)

    def pg_residual(u, g):
        return jnp.max(jnp.abs(u - proj(u - g)))

    def cond(carry):
        u, g, m, v, t, done = carry
        return jnp.logical_and(t < config.max_iters, jnp.logical_not(done))

    def body(carry):
        # One gradient evaluation per iteration: the carried g is grad at u.
        u, g, m, v, t, _ = carry
        m = config.b1 * m + (1.0 - config.b1) * g
        v = config.b2 * v + (1.0 - config.b2) * g * g
        t1 = t + 1
        tf = t1.astype(dt)
        mhat = m / (1.0 - config.b1 ** tf)
        vhat = v / (1.0 - config.b2 ** tf)
        u_new = proj(u - lr * mhat / (jnp.sqrt(vhat) + config.eps))
        g_new = grad_fn(u_new)
        # Non-finite gradients (cost left the PD cone): zero so Adam coasts.
        g_new = jnp.where(jnp.isfinite(g_new), g_new, 0.0)
        done = pg_residual(u_new, g_new) < config.tol
        return u_new, g_new, m, v, t1, done

    u0 = proj(u_init)
    zeros = jnp.zeros_like(u0)
    g0 = grad_fn(u0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    u, _, m, v, iters, _ = jax.lax.while_loop(
        cond, body,
        (u0, g0, zeros, zeros, jnp.zeros((), jnp.int32), jnp.asarray(False)))

    if config.polish_iters > 0:
        def polish_body(i, u):
            g = grad_fn(u)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            step = lr * (0.5 ** (i.astype(dt) / 4.0))
            return proj(u - step * g / (jnp.max(jnp.abs(g)) + config.eps))
        u = jax.lax.fori_loop(0, config.polish_iters, polish_body, u)

    final_cost = objective(u)
    return SolveResult(u=u, cost=final_cost, iters=iters,
                       pg_norm=pg_residual(u, grad_fn(u)))

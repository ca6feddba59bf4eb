"""Jitted augmented-Lagrangian solver for generally-constrained NLPs.

The reference validates its solver layer with IPOPT's canonical hs071 test
problem (/root/reference/src/test/test_ipopt.py:14-37 and
test_ipopt_pytorch.py:15-45) — a problem with a nonlinear equality AND
inequality constraint that a box-projected method cannot express. This module
closes that gap TPU-natively: a classic augmented-Lagrangian outer loop
(Bertsekas; the LANCELOT/ALGENCAN scheme) whose inner subproblems are the same
jitted projected L-BFGS the production MPC solve uses (mpc/solver.py), so the
whole constrained solve is ONE compiled program — no Python<->C++ callback per
iterate (the reference pays that through cyipopt, SURVEY.md §3.2).

Problem form:
    minimize    f(u)
    subject to  c_eq(u) = 0,  c_in(u) >= 0,  lb <= u <= ub

Augmented Lagrangian (inequalities via the Rockafellar/Powell-Hestenes form —
exactly the multiplier algebra ALGENCAN uses):
    L_mu(u) = f(u) + lam_eq . c_eq + (mu/2) |c_eq|^2
            + (1/(2 mu)) sum_i [ max(0, lam_in_i - mu c_in_i)^2 - lam_in_i^2 ]

Multiplier updates after each inner solve:
    lam_eq <- lam_eq + mu c_eq(u),   lam_in <- max(0, lam_in - mu c_in(u)),
and mu grows by `mu_growth` whenever the constraint violation failed to drop
by a factor of 4 (the standard sufficient-progress test).

Box bounds stay with the inner projection (they are handled exactly, never
penalized). The outer loop is a `lax.fori_loop` with a static trip count, so
the solver jits, vmaps, and shards like everything else in the framework.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpmpc_tpu.mpc.solver import SolverConfig, _solve_lbfgs


class ConstrainedResult(NamedTuple):
    u: jax.Array          # solution (same shape as u_init)
    cost: jax.Array       # () objective at u (NOT the AL value)
    eq_viol: jax.Array    # () ||c_eq(u)||_inf (0 if no equality constraints)
    ineq_viol: jax.Array  # () ||min(c_in(u), 0)||_inf (0 if none)
    lam_eq: jax.Array     # final equality multipliers
    lam_in: jax.Array     # final inequality multipliers
    mu: jax.Array         # final penalty parameter


def solve_constrained(objective: Callable[[jax.Array], jax.Array],
                      u_init: jax.Array, lb, ub,
                      eq_con: Optional[Callable] = None,
                      ineq_con: Optional[Callable] = None,
                      config: SolverConfig = SolverConfig(max_iters=100,
                                                          tol=1e-8),
                      outer_iters: int = 12,
                      mu0: float = 10.0,
                      mu_growth: float = 10.0,
                      mu_max: float = 1e8) -> ConstrainedResult:
    """Minimize `objective` under equality/inequality constraints and a box.

    eq_con:   u -> (m_eq,)  residuals, feasible iff all zero (or None).
    ineq_con: u -> (m_in,)  residuals, feasible iff all >= 0 (or None).
    config:   inner projected-L-BFGS budget (per outer iteration).
    """
    dt = u_init.dtype

    def _eq(u):
        return eq_con(u) if eq_con is not None else jnp.zeros((0,), dt)

    def _in(u):
        return ineq_con(u) if ineq_con is not None else jnp.zeros((0,), dt)

    m_eq = _eq(u_init).shape[0]
    m_in = _in(u_init).shape[0]

    def al(u, lam_eq, lam_in, mu):
        val = objective(u)
        if m_eq:
            c = _eq(u)
            val = val + jnp.dot(lam_eq, c) + 0.5 * mu * jnp.dot(c, c)
        if m_in:
            g = _in(u)
            t = jnp.maximum(0.0, lam_in - mu * g)
            val = val + (jnp.dot(t, t) - jnp.dot(lam_in, lam_in)) / (2.0 * mu)
        return val

    def viol(u):
        v = jnp.zeros((), dt)
        if m_eq:
            v = jnp.maximum(v, jnp.max(jnp.abs(_eq(u))))
        if m_in:
            v = jnp.maximum(v, jnp.max(-jnp.minimum(_in(u), 0.0)))
        return v

    def body(_, carry):
        u, lam_eq, lam_in, mu, prev_v = carry
        res = _solve_lbfgs(lambda w: al(w, lam_eq, lam_in, mu),
                           u, lb, ub, config)
        u = res.u
        v = viol(u)
        if m_eq:
            lam_eq = lam_eq + mu * _eq(u)
        if m_in:
            lam_in = jnp.maximum(0.0, lam_in - mu * _in(u))
        # Sufficient-progress test: grow mu only when violation stalls.
        mu = jnp.where(v > 0.25 * prev_v,
                       jnp.minimum(mu * mu_growth, mu_max), mu)
        return u, lam_eq, lam_in, mu, v

    init = (u_init, jnp.zeros((m_eq,), dt), jnp.zeros((m_in,), dt),
            jnp.asarray(mu0, dt), jnp.asarray(jnp.inf, dt))
    u, lam_eq, lam_in, mu, _ = jax.lax.fori_loop(0, outer_iters, body, init)

    eq_v = jnp.max(jnp.abs(_eq(u))) if m_eq else jnp.zeros((), dt)
    in_v = (jnp.max(-jnp.minimum(_in(u), 0.0)) if m_in
            else jnp.zeros((), dt))
    return ConstrainedResult(u=u, cost=objective(u), eq_viol=eq_v,
                             ineq_viol=in_v, lam_eq=lam_eq, lam_in=lam_in,
                             mu=mu)

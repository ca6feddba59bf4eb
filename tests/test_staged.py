"""Tests for the staged adaptive-budget solve and the noise-tolerant solver
options (round-3 additions: solver.py noise_rel/nonmonotone/converged,
parallel/batch.py solve_batch_staged)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.mpc.cost import CostParams
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch


@pytest.fixture(scope='module')
def small_problem():
    ds, da, n, b, h = 2, 1, 48, 8, 6
    rng = np.random.default_rng(3)
    states = rng.uniform(-2, 2, (n, ds))
    actions = rng.uniform(-2, 2, (n, da))
    next_states = 0.9 * states + 0.2 * np.concatenate(
        [states[:, 1:], actions], axis=1)
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=64, x_dim=ds + da, out_dim=ds)
    gp = gs.make_gp(cfg, x, next_states,
                    log_lambdas=np.log([3.0] * (ds + da)),
                    log_sigma_f=0.0, log_sigma_n=np.log(0.1),
                    dtype=jnp.float32)
    dt = jnp.float32
    x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)), dt)
    gammas = jnp.asarray(np.linspace(-0.3, 0.3, b), dt)
    params = CostParams(Q=jnp.eye(ds, dtype=dt), R=0.05 * jnp.eye(da, dtype=dt),
                        gamma=gammas, x_ref=jnp.zeros(ds, dt),
                        u_ref=jnp.zeros(da, dt))
    return dict(gp=gp, ds=ds, da=da, x0s=x0s, params=params, h=h,
                lb=-2.0, ub=2.0)


def test_converged_field_reports_termination(small_problem):
    p = small_problem
    res = pbatch.solve_batch(p['gp'], p['ds'], p['da'], p['x0s'], p['params'],
                             p['h'], p['lb'], p['ub'],
                             SolverConfig(max_iters=200, tol=1e-5))
    conv = np.asarray(res.converged)
    iters = np.asarray(res.iters)
    assert conv.shape == (8,)
    # a lane that hit the cap must be reported unconverged and vice versa
    assert np.all(conv == (iters < 200))


@pytest.mark.slow
def test_staged_matches_full_budget_quality(small_problem):
    p = small_problem
    solver = SolverConfig(max_iters=160, tol=1e-5)
    full = pbatch.solve_batch(p['gp'], p['ds'], p['da'], p['x0s'],
                              p['params'], p['h'], p['lb'], p['ub'], solver)
    staged = pbatch.solve_batch_staged(p['gp'], p['ds'], p['da'], p['x0s'],
                                       p['params'], p['h'], p['lb'], p['ub'],
                                       solver, budget1=12, budget_total=160,
                                       tail_divisor=2)
    c_full = np.asarray(full.cost)
    c_staged = np.asarray(staged.cost)
    # staged must reach (numerically) the same objective quality per lane;
    # the warm-started restart may land in the same basin with tiny noise
    assert np.all(c_staged <= c_full + 1e-2 * (1 + np.abs(c_full)))
    assert staged.u.shape == full.u.shape
    assert np.all(np.asarray(staged.iters) <= 160)


def test_staged_all_converged_in_phase1_short_circuits(small_problem):
    p = small_problem
    # generous tol: everything converges immediately in phase 1
    solver = SolverConfig(max_iters=200, tol=1e3)
    staged = pbatch.solve_batch_staged(p['gp'], p['ds'], p['da'], p['x0s'],
                                       p['params'], p['h'], p['lb'], p['ub'],
                                       solver, budget1=8, budget_total=100)
    assert np.all(np.asarray(staged.converged))
    assert np.all(np.asarray(staged.iters) <= 8)


def test_noise_tolerant_solver_improves_or_matches(small_problem):
    p = small_problem
    base = pbatch.solve_batch(p['gp'], p['ds'], p['da'], p['x0s'],
                              p['params'], p['h'], p['lb'], p['ub'],
                              SolverConfig(max_iters=120, tol=1e-5))
    noisy = pbatch.solve_batch(p['gp'], p['ds'], p['da'], p['x0s'],
                               p['params'], p['h'], p['lb'], p['ub'],
                               SolverConfig(max_iters=120, tol=1e-5,
                                            noise_rel=1e-3, nonmonotone=8))
    c0, c1 = np.asarray(base.cost), np.asarray(noisy.cost)
    assert np.all(np.isfinite(c1))
    # noise-tolerant acceptance may wander by O(noise) but must not be
    # materially worse anywhere on a clean small problem
    assert np.all(c1 <= c0 + 0.05 * (1 + np.abs(c0)))


def test_nonmonotone_default_is_bit_identical(small_problem):
    p = small_problem
    a = pbatch.solve_batch(p['gp'], p['ds'], p['da'], p['x0s'], p['params'],
                           p['h'], p['lb'], p['ub'],
                           SolverConfig(max_iters=40, tol=1e-5))
    b = pbatch.solve_batch(p['gp'], p['ds'], p['da'], p['x0s'], p['params'],
                           p['h'], p['lb'], p['ub'],
                           SolverConfig(max_iters=40, tol=1e-5,
                                        nonmonotone=0, noise_rel=0.0))
    assert np.array_equal(np.asarray(a.u), np.asarray(b.u))

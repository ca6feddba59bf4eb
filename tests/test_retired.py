"""solve_batch_multistart_retired — the round-5 lane-retirement composition.

Small shapes (CPU suite): correctness of the host-orchestrated gather/scatter
plumbing, the incumbent guarantee, and the known-answer integrator.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpmpc_tpu.gp import state as gp_state
from gpmpc_tpu.mpc.cost import CostParams
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch


@pytest.fixture(scope='module')
def integrator_problem():
    rng = np.random.default_rng(0)
    s = rng.uniform(-10, 10, (80, 1))
    a = rng.uniform(-1, 1, (80, 1))
    cfg = gp_state.GPConfig(capacity=80, x_dim=2, out_dim=1)
    gp = gp_state.make_gp(cfg, dtype=jnp.float64)
    gp = gp_state.append(gp, np.concatenate([s, a], 1), s + a)
    gp = gp_state.set_hyperparams(gp, [2.0, 2.0], 3.0, 1e-5)
    b = 6
    params = CostParams(Q=2 * jnp.eye(1), R=jnp.zeros((1, 1)),
                        gamma=jnp.asarray(np.full(b, 1e-5)),
                        x_ref=jnp.zeros(1), u_ref=jnp.zeros(1))
    return gp, jnp.full((b, 1), 5.0), params


def test_known_answer_all_lanes(integrator_problem):
    """B lanes of the 1-D integrator from x0 = 5 in [-1, 1]: u* = [-1]*H
    (reference test_experiment.py:52-58 semantics), through every phase of
    the retired driver (tail continuation + gated shift refinement)."""
    gp, x0s, params = integrator_problem
    solver = SolverConfig(max_iters=40, tol=1e-6, noise_rel=3e-4,
                          progress_window=10)
    diag = {}
    res = pbatch.solve_batch_multistart_retired(
        gp, 1, 1, x0s, params, 5, -1.0, 1.0, solver,
        n_starts=4, prune_to=2, budget1=20, tail_divisor=3,
        shift_set=(1, -1), shift_iters=10, shift_top=2,
        shift_smooth_iters=3, shift_margin=0.05, diag=diag)
    u = np.asarray(res.u)
    np.testing.assert_allclose(u, -np.ones_like(u), atol=5e-3)
    assert np.all(np.isfinite(np.asarray(res.cost)))
    assert 'n_tail' in diag and 'n_shift_worthy' in diag


def test_never_worse_than_phase_a_incumbent(integrator_problem):
    """The shift phase applies only strict improvements: with shift disabled
    vs enabled, per-lane final cost must satisfy cost_shift <= cost_noshift
    (same budgets; the incumbent rides through untouched otherwise)."""
    gp, x0s, params = integrator_problem
    solver = SolverConfig(max_iters=30, tol=1e-6, noise_rel=3e-4,
                          progress_window=10)
    kw = dict(n_starts=4, prune_to=2, budget1=30, tail_divisor=3)
    res_plain = pbatch.solve_batch_multistart_retired(
        gp, 1, 1, x0s, params, 5, -1.0, 1.0, solver, shift_set=(), **kw)
    res_shift = pbatch.solve_batch_multistart_retired(
        gp, 1, 1, x0s, params, 5, -1.0, 1.0, solver,
        shift_set=(1, -1), shift_iters=8, shift_top=2,
        shift_smooth_iters=2, shift_margin=1.0, **kw)
    c0 = np.asarray(res_plain.cost)
    c1 = np.asarray(res_shift.cost)
    # budget1 == max_iters: phase A identical, so the incumbents match and
    # the gated shift can only improve.
    assert np.all(c1 <= c0 + 1e-12), (c0, c1)


def test_pregate_matches_legacy_invariant(integrator_problem):
    """The frozen pre-gate (round 5) changes which lanes pay the precise
    stage, never the acceptance rule: both paths keep the incumbent
    guarantee and solve the known-answer problem."""
    gp, x0s, params = integrator_problem
    solver = SolverConfig(max_iters=30, tol=1e-6, noise_rel=3e-4,
                          progress_window=10)
    kw = dict(n_starts=4, prune_to=2, budget1=30, tail_divisor=3,
              shift_set=(1, -1), shift_iters=8, shift_top=2,
              shift_smooth_iters=2, shift_margin=1.0)
    for pregate in (False, True):
        res = pbatch.solve_batch_multistart_retired(
            gp, 1, 1, x0s, params, 5, -1.0, 1.0, solver,
            pregate=pregate, **kw)
        u = np.asarray(res.u)
        np.testing.assert_allclose(u, -np.ones_like(u), atol=5e-3,
                                   err_msg=f'pregate={pregate}')


def test_rescue_phase_improves_only(integrator_problem):
    """The tail-rescue phase (neighborhood-outlier multistart) accepts on
    strict improvement only: enabling it can never worsen any lane, and its
    diag counter reports."""
    gp, x0s, params = integrator_problem
    solver = SolverConfig(max_iters=30, tol=1e-6, noise_rel=3e-4,
                          progress_window=10)
    kw = dict(n_starts=4, prune_to=2, budget1=30, tail_divisor=3,
              shift_set=())
    res_plain = pbatch.solve_batch_multistart_retired(
        gp, 1, 1, x0s, params, 5, -1.0, 1.0, solver, **kw)
    diag = {}
    res_rescue = pbatch.solve_batch_multistart_retired(
        gp, 1, 1, x0s, params, 5, -1.0, 1.0, solver,
        rescue_lanes=3, rescue_starts=3, rescue_iters=10, diag=diag, **kw)
    c0 = np.asarray(res_plain.cost)
    c1 = np.asarray(res_rescue.cost)
    assert np.all(c1 <= c0 + 1e-12), (c0, c1)
    assert 'n_rescue' in diag

"""Behavioral closed-loop validation (VERDICT r1 item 4).

These tests assert the framework's *qualitative control behavior*, not just
numeric parity:

  1. Pendulum swing-up succeeds in delta-dynamics mode with trained
     hyperparameters — the end-to-end online-learning loop (the capability
     the reference demonstrates with pretrain_pendulum.py:9-67).
  2. The risk-sensitivity gamma sweep reproduces the reference's README
     property (README.md:11-14, pretrain_uncertainty.py:129-175): the
     risk-averse controller (gamma = -1) keeps its trajectory closer to the
     training data than the risk-neutral one (gamma = 1e-5), which cuts the
     corner through the low-data region.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.envs.pendulum import PendulumEnv, PendulumParams, sample_transitions
from gpmpc_tpu.dynamics import build_rollout_cache, rollout
from gpmpc_tpu.experiments.uncertainty import make_l_shaped_data
from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.sim.simulator import Simulator


@pytest.mark.slow
class TestPendulumSwingUp:
    def test_delta_mode_swing_up(self):
        """Delta-dynamics GP-MPC stabilizes the pendulum upright from a
        hanging-adjacent start: |theta| small over the episode tail, all
        applied torques within bounds (reference pretrain_pendulum.py drives
        the same loop but never asserts success)."""
        params = PendulumParams(g=10.0, max_torque=5.0)
        states, actions, next_states = sample_transitions(
            jax.random.PRNGKey(0), 250, params)

        mpc = RiskSensitiveMPC(
            gamma=0.0, horizon=8, state_dim=2, input_dim=1,
            Q=np.diag([8.0, 1.0]), R=0.001 * np.eye(1),
            R_delta=0.001 * np.eye(1),
            capacity=512, delta_dynamics=True, dtype=jnp.float64,
            solver=SolverConfig(max_iters=60, tol=1e-4))
        mpc.set_ub([params.max_torque])
        mpc.set_lb([-params.max_torque])
        mpc.set_gp_hyperparams(lambdas=[2.0, 2.0, 2.0], sigma_f=1.0,
                               sigma_n=1e-2)
        mpc.dynamics.append_train_data(np.asarray(states), np.asarray(actions),
                                       np.asarray(next_states))
        mpc.train_gp(num_iters=80)

        env = PendulumEnv(params=params,
                          init_state={'th_init': 1.0, 'thdot_init': 0.5})
        log = Simulator(mpc, env, num_iters=40).run()

        th_tail = log.states[-8:, 0]
        thdot_tail = log.states[-8:, 1]
        assert np.max(np.abs(th_tail)) < 0.15, (
            f'pendulum not upright: tail theta {np.round(th_tail, 3)}')
        assert np.max(np.abs(thdot_tail)) < 0.5
        assert np.all(np.abs(log.actions) <= params.max_torque + 1e-9)
        # Online learning really appended every step.
        assert int(mpc.gp.count) == 250 + len(log.actions)


@pytest.mark.slow
class TestGammaSweepProperty:
    def test_risk_averse_hugs_training_data(self):
        """The README-figure property, automated (reference
        pretrain_uncertainty.py config verbatim: L-shaped data, lambdas 0.5,
        sigma_n 1e-5, H=6, bounds +-1, x0=(4,-4)). The quantity gamma
        actually controls is the accumulated predictive variance along the
        planned trajectory: the risk-averse controller (gamma = -1) stays in
        the high-data corridor and accumulates a FRACTION of the variance of
        the risk-neutral one (gamma = 1e-5), which cuts the corner through
        the low-data region; risk-seeking (gamma = 1) accumulates the most.
        (Measured: 1.75 vs 6.71 vs 7.16.)"""
        states, acts, next_states = make_l_shaped_data(seed=0)
        x0 = np.array([4.0, -4.0])
        sum_var, final_means = {}, {}
        for gamma in (-1.0, 1e-5, 1.0):
            mpc = RiskSensitiveMPC(gamma=gamma, horizon=6, state_dim=2,
                                   input_dim=2, Q=2 * np.eye(2),
                                   R=np.zeros((2, 2)), capacity=512,
                                   dtype=jnp.float64,
                                   solver=SolverConfig(max_iters=300, tol=1e-5,
                                                       polish_iters=20))
            mpc.set_gp_hyperparams(lambdas=[0.5] * 4, sigma_f=1.0,
                                   sigma_n=1e-5)
            mpc.dynamics.append_train_data(states, acts, next_states)
            mpc.set_ub([1.0, 1.0])
            mpc.set_lb([-1.0, -1.0])
            u = mpc.get_optimal_trajectory(x0)

            cache = build_rollout_cache(mpc.gp, 2, 2)
            means, covs = rollout(cache, jnp.asarray(x0), jnp.asarray(u))
            tr = np.trace(np.asarray(covs), axis1=1, axis2=2)
            sum_var[gamma] = float(np.sum(tr))
            final_means[gamma] = np.asarray(means)[-1]

        # Risk-averse accumulates a fraction of the risk-neutral variance.
        assert sum_var[-1.0] < 0.5 * sum_var[1e-5], sum_var
        # Risk-seeking seeks variance at least as much as risk-neutral -0.1.
        assert sum_var[1.0] > 0.9 * sum_var[1e-5], sum_var
        # All three still reach the set point (planned terminal mean ~ 0).
        for gamma, m in final_means.items():
            assert np.linalg.norm(m) < 0.3, (gamma, m)

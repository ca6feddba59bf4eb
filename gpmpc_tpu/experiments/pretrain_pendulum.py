"""Pendulum swing-up with a pretrained GP dynamics model.

Reference: experiments/pretrain_pendulum.py:9-67 — 300 random transitions from
the static stepper, hand-set hyperparameters (sigma_n = 1e-5, lambdas = 2),
gamma = -1, H = 5, torque bounds +-5, then a 200-step online-learning episode.

This version exposes the reference configuration (raw next-state targets,
hand-set hyperparameters, --mode reference) and the TPU build's improved
configuration (delta-dynamics targets + trained hyperparameters,
--mode delta, the default) — the latter actually stabilizes the pendulum;
see SURVEY §6 notes and tests/test_closed_loop.py.
"""

import argparse

import numpy as np


def pendulum_experiment(mode: str = 'delta', num_iters: int = 100,
                        num_train: int = 300, horizon: int = 8,
                        gamma: float = 0.0, seed: int = 0,
                        verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from gpmpc_tpu.envs.pendulum import (PendulumEnv, PendulumParams,
                                         sample_transitions)
    from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.sim.simulator import Simulator

    params = PendulumParams(g=10.0, max_torque=5.0)
    states, actions, next_states = sample_transitions(
        jax.random.PRNGKey(seed), num_train, params)

    delta = mode == 'delta'
    mpc = RiskSensitiveMPC(
        gamma=(gamma if delta else -1.0), horizon=horizon,
        state_dim=2, input_dim=1,
        Q=2 * np.eye(2), R=0.01 * np.eye(1), R_delta=0.01 * np.eye(1),
        capacity=512, delta_dynamics=delta,
        solver=SolverConfig(max_iters=150, tol=1e-4),
        # Production quality recipe: basin selection via multistart on every
        # control step (VERDICT r3 item 5; quality_ms_sweep.json).
        solver_recipe='multistart', n_starts=4)
    mpc.set_ub([params.max_torque])
    mpc.set_lb([-params.max_torque])

    if delta:
        mpc.set_gp_hyperparams(lambdas=[2.0, 2.0, 2.0], sigma_f=1.0,
                               sigma_n=1e-2)
        mpc.dynamics.append_train_data(np.asarray(states), np.asarray(actions),
                                       np.asarray(next_states))
        res = mpc.train_gp(num_iters=150)
        if verbose:
            print('trained hyperparams: lambdas=',
                  np.round(np.asarray(mpc.gp.lambdas), 2),
                  'sigma_n=', np.asarray(mpc.gp.sigma_n))
    else:
        # Reference configuration verbatim (pretrain_pendulum.py:53-55).
        mpc.set_gp_hyperparams(lambdas=[2.0, 2.0, 2.0], sigma_n=1e-5)
        mpc.dynamics.append_train_data(np.asarray(states), np.asarray(actions),
                                       np.asarray(next_states))

    env = PendulumEnv(params=params,
                      init_state={'th_init': 1.0, 'thdot_init': 0.5})
    log = Simulator(mpc, env, num_iters=num_iters).run()
    if verbose:
        th = log.states[:, 0]
        print('theta trajectory (every 10):', np.round(th[::10], 3))
        print('final state:', np.round(log.states[-1], 4))
        print('total reward:', round(float(np.sum(log.rewards)), 1))
        print('mean warm solve time: %.3fs'
              % float(np.mean(log.solve_times[3:])))
    return log


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', choices=['delta', 'reference'], default='delta')
    ap.add_argument('--num-iters', type=int, default=100)
    ap.add_argument('--horizon', type=int, default=8)
    ap.add_argument('--gamma', type=float, default=0.0)
    args = ap.parse_args()
    pendulum_experiment(mode=args.mode, num_iters=args.num_iters,
                        horizon=args.horizon, gamma=args.gamma)

"""Continuous cartpole with a pretrained GP dynamics model.

Reference: experiments/pretrain_cts_cartpole.py:7-53 — 300 random transitions,
sigma_n = 1e-5, lambdas = 2, gamma = -1, H = 5, force action in [-1, 1],
50-step online-learning episode. Delta-dynamics + trained hyperparameters is
the default here too (see pretrain_pendulum.py).
"""

import argparse

import numpy as np


def cartpole_experiment(mode: str = 'delta', num_iters: int = 50,
                        num_train: int = 300, horizon: int = 5,
                        gamma: float = 0.0, seed: int = 0,
                        verbose: bool = True):
    import jax

    from gpmpc_tpu.envs.cartpole import (CartPoleEnv, CartPoleParams,
                                         sample_transitions)
    from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.sim.simulator import Simulator

    params = CartPoleParams()
    states, actions, next_states = sample_transitions(
        jax.random.PRNGKey(seed), num_train, params)

    delta = mode == 'delta'
    mpc = RiskSensitiveMPC(
        gamma=(gamma if delta else -1.0), horizon=horizon,
        state_dim=4, input_dim=1,
        Q=2 * np.eye(4), R=0.01 * np.eye(1),
        capacity=512, delta_dynamics=delta,
        solver=SolverConfig(max_iters=150, tol=1e-4))
    mpc.set_ub([1.0])
    mpc.set_lb([-1.0])

    if delta:
        mpc.set_gp_hyperparams(lambdas=[2.0] * 5, sigma_f=1.0, sigma_n=1e-2)
        mpc.dynamics.append_train_data(np.asarray(states), np.asarray(actions),
                                       np.asarray(next_states))
        mpc.train_gp(num_iters=150)
    else:
        # Reference configuration verbatim (pretrain_cts_cartpole.py:41-43).
        mpc.set_gp_hyperparams(lambdas=[2.0] * 5, sigma_n=1e-5)
        mpc.dynamics.append_train_data(np.asarray(states), np.asarray(actions),
                                       np.asarray(next_states))

    env = CartPoleEnv(params=params, seed=seed)
    log = Simulator(mpc, env, num_iters=num_iters).run()
    if verbose:
        print('final state:', np.round(log.states[-1], 4))
        print('|x| max:', round(float(np.max(np.abs(log.states[:, 0]))), 3),
              '|theta| max:', round(float(np.max(np.abs(log.states[:, 2]))), 3))
        print('mean warm solve time: %.3fs'
              % float(np.mean(log.solve_times[3:])))
    return log


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', choices=['delta', 'reference'], default='delta')
    ap.add_argument('--num-iters', type=int, default=50)
    args = ap.parse_args()
    cartpole_experiment(mode=args.mode, num_iters=args.num_iters)

"""Risk-sensitivity gamma-sweep on a 2-D integrator — the README figure
generator of the reference (experiments/pretrain_uncertainty.py:15-179).

Setup: f(s, a) = s + a with 2-D state and 2-D action in [-1, 1]^2. Training
data covers an L-shaped region (two boxes, 200 points each — the reference
ships the sampled arrays as .npy; here they are regenerated from the generator
code the reference left commented at pretrain_uncertainty.py:25-46). From
x0 = (4, -4) with the set point at the origin, a risk-averse controller
(gamma < 0) hugs the L-shaped high-data corridor while a risk-neutral /
risk-seeking one cuts the corner through the low-data region — the qualitative
behavior shown in the reference's README figures (media/uncertainty/*.png).

Saves trajectories as .npz (and .png when matplotlib is available).
"""

import argparse
import os

import numpy as np


def make_l_shaped_data(seed: int = 0):
    """The two-box training distribution of pretrain_uncertainty.py:25-46."""
    rng = np.random.default_rng(seed)
    boxes = [
        (200, 3.8, 4.2, -4.2, 0.2),
        (200, -0.2, 4.2, -0.2, 0.2),
    ]
    states, actions = [], []
    for n, x0, x1, y0, y1 in boxes:
        sx = rng.uniform(x0, x1, (n, 1))
        sy = rng.uniform(y0, y1, (n, 1))
        ax = rng.uniform(-1, 1, (n, 1))
        ay = rng.uniform(-1, 1, (n, 1))
        states.append(np.concatenate([sx, sy], axis=1))
        actions.append(np.concatenate([ax, ay], axis=1))
    states = np.concatenate(states, axis=0)
    actions = np.concatenate(actions, axis=0)
    next_states = states + actions
    return states, actions, next_states


def uncertainty_experiment(gammas=(-1.0, 1e-5), horizon: int = 6,
                           out_dir: str = 'media/uncertainty',
                           seed: int = 0, verbose: bool = True):
    import jax
    jax.config.update('jax_enable_x64', True)   # sigma_n = 1e-5 needs f64
    import jax.numpy as jnp

    from gpmpc_tpu.dynamics import build_rollout_cache, rollout
    from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
    from gpmpc_tpu.mpc.solver import SolverConfig

    states, actions, next_states = make_l_shaped_data(seed)
    curr_state = np.array([4.0, -4.0])
    results = {}

    for gamma in gammas:
        mpc = RiskSensitiveMPC(gamma=gamma, horizon=horizon, state_dim=2,
                               input_dim=2, Q=2 * np.eye(2),
                               R=np.zeros((2, 2)), capacity=512,
                               dtype=jnp.float64,
                               solver=SolverConfig(max_iters=300, tol=1e-5,
                                                   polish_iters=20))
        # Reference hyperparameters (pretrain_uncertainty.py:100-103).
        mpc.set_gp_hyperparams(lambdas=[0.5] * 4, sigma_f=1.0, sigma_n=1e-5)
        mpc.dynamics.append_train_data(states, actions, next_states)
        mpc.set_ub([1.0, 1.0])
        mpc.set_lb([-1.0, -1.0])
        mpc.set_xref(np.array([0.0, 0.0]))
        mpc.set_uref(np.array([0.0, 0.0]))

        opt_traj = mpc.get_optimal_trajectory(curr_state)

        cache = build_rollout_cache(mpc.gp, 2, 2)
        means, covs = rollout(cache, jnp.asarray(curr_state),
                              jnp.asarray(opt_traj))
        expected = np.asarray(means)

        true_traj = np.zeros((horizon + 1, 2))
        true_traj[0] = curr_state
        for i in range(horizon):
            true_traj[i + 1] = true_traj[i] + opt_traj[i]

        results[gamma] = dict(u=opt_traj, expected=expected, true=true_traj,
                              covs=np.asarray(covs))
        if verbose:
            print(f'gamma={gamma}: u[0]={np.round(opt_traj[0], 3)}, '
                  f'expected path x: {np.round(expected[:, 0], 2)}')
            print(f'             expected path y: {np.round(expected[:, 1], 2)}')

    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, 'gamma_sweep.npz'),
             states=states,
             **{f'expected_{g}': r['expected'] for g, r in results.items()},
             **{f'true_{g}': r['true'] for g, r in results.items()})

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        for gamma, r in results.items():
            fig, ax = plt.subplots()
            ax.set_xlim(-1, 5)
            ax.set_ylim(-5, 1)
            ax.scatter(states[:, 0], states[:, 1], label='Training Data',
                       alpha=0.4, s=8)
            ax.scatter(*r['expected'].T, color='blue',
                       label='Expected Trajectory')
            ax.scatter(*r['true'].T, color='black', label='True Trajectory')
            ax.scatter(0, 0, color='white', edgecolor='black', marker='*',
                       s=300, label='Set Point')
            ax.scatter(*curr_state, color='white', edgecolor='black',
                       marker='o', s=200, label='Initial State')
            ax.legend()
            ax.set_title(f'Optimal MPC Trajectory with gamma={gamma}')
            ax.set_xlabel('State Dimension 1')
            ax.set_ylabel('State Dimension 2')
            fig.savefig(os.path.join(out_dir, f'gamma_{gamma}.png'), dpi=120)
            plt.close(fig)
        if verbose:
            print(f'figures written to {out_dir}/')
    except ImportError:
        if verbose:
            print('matplotlib unavailable — wrote .npz only')
    return results


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--gammas', type=float, nargs='+', default=[-1.0, 1e-5])
    ap.add_argument('--out-dir', default='media/uncertainty')
    args = ap.parse_args()
    uncertainty_experiment(gammas=tuple(args.gammas), out_dir=args.out_dir)

"""Known-answer sanity experiment: 1-D integrator f(s, a) = s + a.

Reference: experiments/test_experiment.py:10-74 — GP trained on 100 random
(s, a, s + a) transitions, gamma = 1e-5, H = 5, a in [-1, 1], x0 = 5; the
optimal trajectory is u* = [-1] * 5. Prints the solve and checks the answer.
"""

import numpy as np


def integrator_experiment(seed: int = 0, verbose: bool = True):
    import jax
    jax.config.update('jax_enable_x64', True)   # reference parity is f64
    import jax.numpy as jnp

    from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
    from gpmpc_tpu.mpc.solver import SolverConfig

    rng = np.random.default_rng(seed)
    state = rng.uniform(-10, 10, (100, 1))
    action = rng.uniform(-1, 1, (100, 1))
    next_state = state + action

    mpc = RiskSensitiveMPC(gamma=1e-5, horizon=5, state_dim=1, input_dim=1,
                           Q=2 * np.eye(1), R=np.zeros((1, 1)),
                           R_delta=np.zeros((1, 1)), capacity=128,
                           dtype=jnp.float64,
                           solver=SolverConfig(max_iters=300, tol=1e-5,
                                               polish_iters=20))
    mpc.set_gp_hyperparams(lambdas=[2.0, 2.0], sigma_f=3.0, sigma_n=1e-5)
    mpc.dynamics.append_train_data(state, action, next_state)
    mpc.set_ub([1.0])
    mpc.set_lb([-1.0])
    mpc.set_xref([0.0])
    mpc.set_uref([0.0])

    u = mpc.get_optimal_trajectory(np.array([5.0]))
    err = np.max(np.abs(u.ravel() + 1.0))
    if verbose:
        print('optimal trajectory:', u.ravel())
        print('expected [-1]*5, max deviation:', err)
        print('solver iters:', int(mpc.last_result.iters),
              'cost:', float(mpc.last_result.cost))
    return u, err


if __name__ == '__main__':
    _, err = integrator_experiment()
    assert err < 5e-3, f"integrator known answer violated: {err}"
    print('PASS')

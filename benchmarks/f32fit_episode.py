"""Closed-loop effect of the traced-f32 online GP fit (VERDICT r4 item 7).

`run_episode_on_device` refits the GP INSIDE the scan after each online
append; in a non-x64 process that traced fit runs on-device in f32, while the
host Simulator's eager appends go through the host-f64 factorization
(gp/state.py warns: ~1e-3 relative error in beta at headline conditioning).
This harness measures what that divergence does to the CLOSED LOOP:

  A. host-loop episode — eager appends (host-f64 fit), one jitted solve per
     step; the production host path (sim.Simulator semantics);
  B. on-device episode, default config — traced f32 fit inside the scan;
  C. on-device episode with GPConfig(fit_callback_f64=True) — exact f64
     agreement via jax.pure_callback (if the backend supports host
     callbacks; recorded as unavailable otherwise).

Same plant, same initial state, same solver on all variants. Metrics: action
divergence (vs A), state-trajectory divergence, total reward. Writes
benchmarks/results/f32fit_episode.json — the evidence VERDICT asks for to
pick the default.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = os.path.join(REPO, 'benchmarks', 'results')


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp

    from benchmarks.provenance import provenance
    from gpmpc_tpu.dynamics import build_rollout_cache, rollout
    from gpmpc_tpu.envs.pendulum import (PendulumParams, sample_transitions,
                                         step as pend_step)
    from gpmpc_tpu.gp import state as gp_state
    from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
    from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory
    from gpmpc_tpu.sim.simulator import run_episode_on_device

    horizon, num_steps, n_pre = 8, 40, 300
    pp = PendulumParams(g=10.0, max_torque=5.0)
    states, actions, next_states = sample_transitions(
        jax.random.PRNGKey(0), n_pre, pp)
    x = np.concatenate([np.asarray(states), np.asarray(actions)], axis=1)
    y = np.asarray(next_states) - np.asarray(states)       # delta targets

    def make(callback_f64=False):
        cfg = gp_state.GPConfig(capacity=512, x_dim=3, out_dim=2,
                                fit_callback_f64=callback_f64)
        gp = gp_state.make_gp(cfg, x, y, dtype=jnp.float32)
        return gp_state.set_hyperparams(gp, [2.0, 2.0, 2.0], 1.0, 1e-2)

    params = CostParams(Q=2 * jnp.eye(2), R=0.01 * jnp.eye(1),
                        gamma=jnp.asarray(0.0, jnp.float32),
                        x_ref=jnp.zeros(2, jnp.float32),
                        u_ref=jnp.zeros(1, jnp.float32))
    solver = SolverConfig(max_iters=100, tol=1e-4)
    lb, ub = -pp.max_torque, pp.max_torque
    x0 = jnp.asarray([1.0, 0.5], jnp.float32)

    def plant(xs, u):
        nx, reward = pend_step(xs, u, pp)
        return nx, reward

    # --- A: host loop, eager appends (host-f64 fit) -----------------------
    @jax.jit
    def solve_once(gp, xs):
        cache = build_rollout_cache(gp, 2, 1)

        def objective(u):
            m, c = rollout(cache, xs, u, delta=True)
            return risk_sensitive_cost(params, m, c, u)

        return solve_trajectory(objective,
                                jnp.zeros((horizon, 1), jnp.float32),
                                lb, ub, solver).u

    gp_a = make()
    xs = x0
    acts_a, st_a, rew_a = [], [], []
    for _ in range(num_steps):
        u = solve_once(gp_a, xs)
        a0 = np.asarray(u)[0]
        nx, r = plant(xs, jnp.asarray(a0))
        gp_a = gp_state.append(gp_a, np.concatenate([np.asarray(xs), a0]),
                               np.asarray(nx) - np.asarray(xs))  # eager: f64
        acts_a.append(a0)
        st_a.append(np.asarray(nx))
        rew_a.append(float(r))
        xs = nx
    acts_a, st_a = np.asarray(acts_a), np.asarray(st_a)

    # --- B/C: whole-episode scan (traced fit) -----------------------------
    def run_device(callback_f64):
        gp = make(callback_f64)
        fn = jax.jit(lambda g, x0: run_episode_on_device(
            g, plant, x0, params, horizon, num_steps, lb, ub, solver,
            learn_online=True, delta_dynamics=True))
        _, outs = fn(gp, x0)
        return (np.asarray(outs['action']), np.asarray(outs['state']),
                np.asarray(outs['reward']))

    acts_b, st_b, rew_b = run_device(False)
    try:
        acts_c, st_c, rew_c = run_device(True)
        c_ok = True
    except Exception as e:                        # pragma: no cover
        acts_c = st_c = rew_c = None
        c_ok = False
        c_err = repr(e)[:300]

    def compare(name, acts, st, rew):
        return {
            'action_mae_vs_A': float(np.mean(np.abs(acts.ravel()
                                                    - acts_a.ravel()))),
            'action_max_vs_A': float(np.max(np.abs(acts.ravel()
                                                   - acts_a.ravel()))),
            'state_mae_vs_A': float(np.mean(np.abs(st - st_a))),
            'final_state': np.asarray(st[-1]).tolist(),
            'total_reward': float(np.sum(rew)),
        }

    out = {
        'workload': {'plant': 'pendulum delta-dynamics', 'horizon': horizon,
                     'num_steps': num_steps, 'n_pretrain': n_pre,
                     'sigma_n': 1e-2, 'backend': jax.default_backend()},
        'A_host_eager_f64_fit': {
            'total_reward': float(np.sum(rew_a)),
            'final_state': st_a[-1].tolist()},
        'B_device_traced_f32_fit': compare('B', acts_b, st_b, rew_b),
        'C_device_callback_f64': (compare('C', acts_c, st_c, rew_c)
                                  if c_ok else {'unavailable': c_err}),
        'provenance': provenance(),
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, 'f32fit_episode.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()

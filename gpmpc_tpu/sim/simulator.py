"""Receding-horizon simulation drivers.

`Simulator` is the host-side control loop with the reference's exact semantics
(simulator.py:37-60): per step, apply the first action of the freshly solved
trajectory, step the plant, then append the observed transition to the GP
(online learning — which refits the Cholesky bundle, the reference's full
rebuild at gpr.py:122). Episode metrics are collected instead of the
reference's print-and-video-only telemetry.

`run_episode_on_device` is the TPU-native upgrade the reference has no analog
for: when the plant is a pure-jnp stepper, the entire episode — solve, step,
online GP append/refit — runs as one jitted `lax.scan` on device, with no
host round-trips. Batched over initial states via vmap.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.dynamics import build_rollout_cache, rollout
from gpmpc_tpu.gp import state as gp_state
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory


class EpisodeLog(NamedTuple):
    states: np.ndarray      # (T+1, ds)
    actions: np.ndarray     # (T, da)
    rewards: np.ndarray     # (T,)
    solve_times: np.ndarray  # (T,) wall-clock seconds per solve
    costs: np.ndarray       # (T,) objective value at the returned trajectory
    iters: np.ndarray       # (T,) solver iterations


class Simulator:
    """Host control loop (reference simulator.py). `env` needs reset()/step();
    `mpc` is a gpmpc_tpu RiskSensitiveMPC.

    Episode recording (the reference's RecordVideo wrapper,
    simulator.py:29-35): pass `renderer` (a frame function from
    sim/render.py, e.g. pendulum_renderer(params)) and `video_path`
    ('.gif'); the episode is captured per step and written on completion."""

    def __init__(self, mpc, env, num_iters: int = 500,
                 learn_online: bool = True,
                 renderer=None, video_path: Optional[str] = None,
                 fps: int = 20):
        self.mpc = mpc
        self.env = env
        self.num_iters = num_iters
        self.learn_online = learn_online
        self.recorder = None
        self.video_path = video_path
        if renderer is not None:
            from gpmpc_tpu.sim.render import EpisodeRecorder
            self.recorder = EpisodeRecorder(renderer, fps=fps)

    def run(self) -> EpisodeLog:
        obs, _ = self.env.reset()
        states, actions, rewards, solve_times, costs, iters = \
            [np.asarray(obs)], [], [], [], [], []

        for _ in range(self.num_iters):
            t0 = time.perf_counter()
            traj = self.mpc.get_optimal_trajectory(obs)
            solve_times.append(time.perf_counter() - t0)
            action = traj[0, :]
            if self.recorder is not None:
                self.recorder.capture(obs, action)
            next_obs, reward, terminated, truncated, _ = self.env.step(action)
            res = self.mpc.last_result
            costs.append(float(res.cost) if res is not None else np.nan)
            iters.append(int(res.iters) if res is not None else 0)
            actions.append(action)
            rewards.append(reward)
            states.append(np.asarray(next_obs))
            if terminated or truncated:
                break
            if self.learn_online:
                self.mpc.dynamics.append_train_data(obs, action, next_obs)
            obs = next_obs

        if self.recorder is not None:
            self.recorder.capture(obs)
            if self.video_path is not None:
                self.recorder.save(self.video_path)
        self.env.close()
        return EpisodeLog(states=np.asarray(states), actions=np.asarray(actions),
                          rewards=np.asarray(rewards),
                          solve_times=np.asarray(solve_times),
                          costs=np.asarray(costs), iters=np.asarray(iters))


def run_episode_on_device(gp: gp_state.GPState,
                          plant_step: Callable,
                          x0: jax.Array,
                          params: CostParams,
                          horizon: int,
                          num_steps: int,
                          lb, ub,
                          solver: SolverConfig = SolverConfig(),
                          learn_online: bool = True,
                          full_cov: bool = False,
                          delta_dynamics: bool = False,
                          solver_recipe: str = 'single',
                          n_starts: int = 4):
    """Whole receding-horizon episode as one on-device scan.

    plant_step: (state (ds,), action (da,)) -> (next_state, reward), pure jnp.
    Returns (final GPState, dict of stacked per-step arrays). jit/vmap-able;
    wrap in jax.jit at the call site (see experiments and bench).

    solver_recipe='multistart': every control step's cold solve runs the
    global-then-local basin-selection recipe (`n_starts` starts; see
    parallel.batch.solve_batch_multistart) instead of a single descent from
    u = 0 — the production quality configuration. Requires the fused-path
    conditions (L-BFGS, diagonal covariance); full_cov falls back to 'single'.
    """
    ds = params.Q.shape[0]
    da = params.R.shape[0]
    use_ms = (solver_recipe == 'multistart' and not full_cov
              and solver.method == 'lbfgs')

    def mpc_solve(gp_t, x, u_prev, u_warm):
        p = params._replace(u_prev=u_prev) if params.R_delta is not None else params

        if use_ms:
            from gpmpc_tpu.parallel.batch import solve_batch_multistart
            # Explicit (B=1, da) axis on u_prev — a shared (da,) leaf is
            # ambiguous to the batch layer when da happens to equal B.
            if p.u_prev is not None and p.R_delta is not None:
                p = p._replace(u_prev=p.u_prev[None])
            # The receding-horizon warm start (previous step's solved
            # trajectory, shifted) rides along as an extra candidate
            # (advisor r4, low) — cold start + wide draws unchanged.
            res = solve_batch_multistart(gp_t, ds, da, x[None], p, horizon,
                                         lb, ub, solver, n_starts=n_starts,
                                         delta=delta_dynamics,
                                         extra_starts=u_warm[None, None])
            return jax.tree.map(lambda v: v[0], res)

        cache = build_rollout_cache(gp_t, ds, da)

        def objective(u):
            means, covs = rollout(cache, x, u, full_cov=full_cov,
                                  delta=delta_dynamics)
            return risk_sensitive_cost(p, means, covs, u)

        u_init = jnp.zeros((horizon, da), x.dtype)
        return solve_trajectory(objective, u_init, lb, ub, solver)

    def body(carry, _):
        gp_t, x, u_prev, u_traj = carry
        u_warm = jnp.concatenate([u_traj[1:], u_traj[-1:]], axis=0)
        result = mpc_solve(gp_t, x, u_prev, u_warm)
        action = result.u[0]
        next_x, reward = plant_step(x, action)
        if learn_online:
            xu = jnp.concatenate([x, action])
            target = next_x - x if delta_dynamics else next_x
            gp_t = gp_state.append(gp_t, xu, target)
        out = dict(state=next_x, action=action, reward=reward,
                   cost=result.cost, iters=result.iters)
        return (gp_t, next_x, action, result.u), out

    u0 = jnp.zeros((da,), x0.dtype)
    traj0 = jnp.zeros((horizon, da), x0.dtype)
    (gp_final, _, _, _), outs = jax.lax.scan(body, (gp, x0, u0, traj0), None,
                                             length=num_steps)
    return gp_final, outs

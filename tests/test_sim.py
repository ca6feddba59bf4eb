"""Simulator tests: host receding-horizon loop semantics and the fully
on-device episode (solve + plant step + online GP append inside one scan)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.envs import pendulum
from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
from gpmpc_tpu.mpc.cost import CostParams
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.sim.simulator import Simulator, run_episode_on_device

RNG = np.random.default_rng(8)


class TestHostSimulator:
    def test_online_learning_and_log(self):
        params = pendulum.PendulumParams(max_torque=2.0)
        env = pendulum.PendulumEnv(params=params,
                                   init_state={'th_init': 0.5,
                                               'thdot_init': 0.0})
        mpc = RiskSensitiveMPC(gamma=0.0, horizon=3, state_dim=2, input_dim=1,
                               Q=2 * np.eye(2), R=0.1 * np.eye(1), capacity=32,
                               delta_dynamics=True, dtype=jnp.float64,
                               solver=SolverConfig(max_iters=30))
        mpc.set_ub([2.0])
        mpc.set_lb([-2.0])
        log = Simulator(mpc, env, num_iters=5).run()
        assert log.states.shape == (6, 2)
        assert log.actions.shape == (5, 1)
        assert int(mpc.gp.count) == 5          # one append per step
        assert np.all(np.abs(log.actions) <= 2.0 + 1e-9)
        # First step has no data -> zero action (reference mpc.py:284-289).
        np.testing.assert_allclose(log.actions[0], 0.0)

    def test_learn_online_off(self):
        env = pendulum.PendulumEnv(init_state={'th_init': 0.5,
                                               'thdot_init': 0.0})
        mpc = RiskSensitiveMPC(gamma=0.0, horizon=3, state_dim=2, input_dim=1,
                               Q=np.eye(2), R=np.eye(1), capacity=16,
                               dtype=jnp.float64)
        Simulator(mpc, env, num_iters=3, learn_online=False).run()
        assert int(mpc.gp.count) == 0


class TestOnDeviceEpisode:
    def test_whole_episode_on_device(self):
        params = pendulum.PendulumParams(max_torque=3.0)
        states, actions, next_states = pendulum.sample_transitions(
            jax.random.PRNGKey(0), 20, params)
        x = jnp.concatenate([states, actions], axis=1)
        deltas = next_states - states
        cfg = gs.GPConfig(capacity=32, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, x, deltas, log_lambdas=jnp.log(jnp.full((2, 3), 3.0)),
                        log_sigma_n=jnp.log(jnp.full(2, 0.05)),
                        dtype=jnp.float64)
        p = CostParams(Q=2 * jnp.eye(2), R=0.1 * jnp.eye(1),
                       gamma=jnp.asarray(0.0), x_ref=jnp.zeros(2),
                       u_ref=jnp.zeros(1))

        def plant(s, u):
            return pendulum.step(s, u, params)

        run = jax.jit(lambda gp, x0: run_episode_on_device(
            gp, plant, x0, p, horizon=3, num_steps=4, lb=-3.0, ub=3.0,
            solver=SolverConfig(max_iters=25), delta_dynamics=True))
        gp_final, outs = run(gp, jnp.asarray([0.5, 0.0]))
        assert outs['state'].shape == (4, 2)
        assert np.all(np.isfinite(np.asarray(outs['state'])))
        assert int(gp_final.count) == 24       # 20 pretrain + 4 online
        assert np.all(np.abs(np.asarray(outs['action'])) <= 3.0 + 1e-9)

    def test_batched_episodes_vmap(self):
        params = pendulum.PendulumParams(max_torque=3.0)
        states, actions, next_states = pendulum.sample_transitions(
            jax.random.PRNGKey(1), 16, params)
        x = jnp.concatenate([states, actions], axis=1)
        cfg = gs.GPConfig(capacity=24, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, x, next_states - states,
                        log_lambdas=jnp.log(jnp.full((2, 3), 3.0)),
                        log_sigma_n=jnp.log(jnp.full(2, 0.05)),
                        dtype=jnp.float64)
        p = CostParams(Q=2 * jnp.eye(2), R=0.1 * jnp.eye(1),
                       gamma=jnp.asarray(0.0), x_ref=jnp.zeros(2),
                       u_ref=jnp.zeros(1))

        def plant(s, u):
            return pendulum.step(s, u, params)

        def one(x0):
            _, outs = run_episode_on_device(
                gp, plant, x0, p, horizon=3, num_steps=3, lb=-3.0, ub=3.0,
                solver=SolverConfig(max_iters=20), delta_dynamics=True)
            return outs['state']

        x0s = jnp.asarray(RNG.uniform(-0.5, 0.5, (3, 2)))
        traj = jax.jit(jax.vmap(one))(x0s)
        assert traj.shape == (3, 3, 2)
        assert np.all(np.isfinite(np.asarray(traj)))

"""Auxiliary-subsystem tests: checkpoint/resume, metrics logging, native
C++ solver oracle."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.gp.exact import predict
from gpmpc_tpu.utils import checkpoint as ckpt
from gpmpc_tpu.utils.metrics import JsonlLogger, episode_summary

RNG = np.random.default_rng(13)


class TestCheckpoint:
    def test_gp_roundtrip(self, tmp_path):
        x = RNG.uniform(-1, 1, (20, 3))
        y = RNG.normal(size=(20, 2))
        cfg = gs.GPConfig(capacity=32, x_dim=3, out_dim=2)
        gp = gs.make_gp(cfg, x, y, log_sigma_n=np.log(0.1), dtype=jnp.float64)
        p = str(tmp_path / 'gp.npz')
        ckpt.save_gp(p, gp)
        gp2 = ckpt.load_gp(p)
        xp = jnp.asarray(RNG.uniform(-1, 1, (4, 3)))
        m1, v1 = predict(gp, xp)
        m2, v2 = predict(gp2, xp)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        assert int(gp2.count) == 20

    def test_nominal_fn_guard(self, tmp_path):
        def f_nom(xs):
            return xs[:, :1]

        cfg = gs.GPConfig(capacity=8, x_dim=2, out_dim=1, nominal_fn=f_nom)
        gp = gs.make_gp(cfg, RNG.uniform(-1, 1, (5, 2)),
                        RNG.normal(size=(5, 1)), dtype=jnp.float64)
        p = str(tmp_path / 'gp.npz')
        ckpt.save_gp(p, gp)
        with pytest.raises(ValueError, match='nominal'):
            ckpt.load_gp(p)
        gp2 = ckpt.load_gp(p, nominal_fn=f_nom)
        assert gp2.config.nominal_fn is f_nom

    def test_controller_roundtrip(self, tmp_path):
        from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
        mpc = RiskSensitiveMPC(gamma=-0.5, horizon=4, state_dim=2, input_dim=1,
                               Q=2 * np.eye(2), R=0.1 * np.eye(1),
                               R_delta=0.2 * np.eye(1), capacity=32,
                               delta_dynamics=True, dtype=jnp.float64)
        s = RNG.uniform(-1, 1, (10, 2))
        a = RNG.uniform(-1, 1, (10, 1))
        mpc.dynamics.append_train_data(s, a, 0.9 * s)
        mpc.set_ub([2.0])
        mpc.set_lb([-2.0])
        mpc.last_traj = RNG.normal(size=(4, 1))
        base = str(tmp_path / 'ctrl')
        ckpt.save_controller(base, mpc)
        mpc2 = ckpt.load_controller(base)
        assert mpc2.gamma == -0.5 and mpc2.delta_dynamics
        np.testing.assert_array_equal(mpc2.last_traj, mpc.last_traj)
        u1 = mpc.get_optimal_trajectory(np.array([0.5, -0.5]))
        u2 = mpc2.get_optimal_trajectory(np.array([0.5, -0.5]))
        np.testing.assert_allclose(u1, u2, atol=1e-12)


class TestMetrics:
    def test_jsonl_logger(self, tmp_path):
        p = str(tmp_path / 'm.jsonl')
        lg = JsonlLogger(p)
        lg.log(dict(kind='x', v=1))
        lg.log(dict(kind='y', v=2.5))
        lines = [json.loads(l) for l in open(p)]
        assert lines[0]['kind'] == 'x' and 't' in lines[0]
        assert lines[1]['v'] == 2.5

    def test_episode_summary(self):
        from gpmpc_tpu.sim.simulator import EpisodeLog
        log = EpisodeLog(states=np.zeros((6, 2)), actions=np.zeros((5, 1)),
                         rewards=np.ones(5), solve_times=np.full(5, 0.01),
                         costs=np.arange(5.0), iters=np.full(5, 20))
        s = episode_summary(log)
        assert s['steps'] == 5 and abs(s['solves_per_s'] - 100.0) < 1e-6


class TestNativeSolver:
    def test_available_and_box_qp(self):
        from gpmpc_tpu import native
        if not native.available():
            pytest.skip('no C++ toolchain')
        target = np.array([2.0, -3.0, 0.5, 0.0])

        def fg(x):
            t = x - target
            return float(t @ t), 2 * t

        res = native.solve_box(fg, np.zeros(4), -np.ones(4), np.ones(4))
        np.testing.assert_allclose(res.x, [1.0, -1.0, 0.5, 0.0], atol=1e-8)
        assert res.converged

    def test_cross_validates_jax_solver(self):
        """The native L-BFGS and the jitted projected-Adam solver must agree on
        the integrator MPC objective (the role IPOPT plays in the reference's
        known-answer experiment)."""
        from gpmpc_tpu import native
        if not native.available():
            pytest.skip('no C++ toolchain')
        import jax
        from gpmpc_tpu.dynamics import build_rollout_cache, rollout
        from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
        from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory

        rng = np.random.default_rng(0)
        s = rng.uniform(-10, 10, (60, 1))
        a = rng.uniform(-1, 1, (60, 1))
        cfg = gs.GPConfig(capacity=64, x_dim=2, out_dim=1)
        gp = gs.make_gp(cfg, np.concatenate([s, a], 1), s + a,
                        log_lambdas=np.log([2.0, 2.0]),
                        log_sigma_f=np.log(3.0), log_sigma_n=np.log(1e-4),
                        dtype=jnp.float64)
        cache = build_rollout_cache(gp, 1, 1)
        params = CostParams(Q=2 * jnp.eye(1), R=jnp.zeros((1, 1)),
                            gamma=jnp.asarray(1e-5), x_ref=jnp.zeros(1),
                            u_ref=jnp.zeros(1))
        x0 = jnp.asarray([5.0])

        def obj(u):
            m, c = rollout(cache, x0, u)
            return risk_sensitive_cost(params, m, c, u)

        vg = jax.jit(jax.value_and_grad(lambda u: obj(u.reshape(5, 1))))

        def fg(u_flat):
            v, g = vg(jnp.asarray(u_flat))
            return float(v), np.asarray(g).ravel()

        res_native = native.solve_box(fg, np.zeros(5), -np.ones(5),
                                      np.ones(5), max_iters=200, tol=1e-8)
        res_jax = solve_trajectory(obj, jnp.zeros((5, 1)), -1.0, 1.0,
                                   SolverConfig(max_iters=400, tol=1e-6,
                                                polish_iters=20))
        # Third, fully independent oracle: scipy's L-BFGS-B. (The true optimum
        # here is NOT [-1]*5: sigma_f = 3 makes the predictive-variance term
        # back the weakly-weighted terminal control off the bound, to
        # u4 ~ -0.9116; all three solvers must find that point.)
        from scipy.optimize import minimize
        r = minimize(lambda uf: fg(uf), np.zeros(5), jac=True,
                     method='L-BFGS-B', bounds=[(-1.0, 1.0)] * 5)
        np.testing.assert_allclose(res_native.x, r.x, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res_jax.u).ravel(),
                                   res_native.x, atol=5e-3)
        np.testing.assert_allclose(res_native.x[:4], -np.ones(4), atol=1e-4)

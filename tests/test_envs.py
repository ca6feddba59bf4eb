"""Plant-model tests: jnp steppers vs direct NumPy transcriptions of the
reference physics, clip behavior, batching, and the analytic pendulum models
(reference test/models/test_pendulum.py pattern)."""

import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.envs import cartpole, pendulum
from gpmpc_tpu.models import pendulum as pmodels

RNG = np.random.default_rng(3)


def _pendulum_ref(state, u, p: pendulum.PendulumParams):
    th, thdot = state
    u = np.clip(u, -p.max_torque, p.max_torque)
    newthdot = thdot + (3 * p.g / (2 * p.l) * np.sin(th)
                        + 3.0 / (p.m * p.l ** 2) * u) * p.dt
    newthdot = np.clip(newthdot, -p.max_speed, p.max_speed)
    newth = th + newthdot * p.dt
    return np.array([newth, newthdot])


def _cartpole_ref(state, force, p: cartpole.CartPoleParams):
    x, x_dot, theta, theta_dot = state
    total_mass = p.masscart + p.masspole
    pml = p.masspole * p.length
    cth, sth = np.cos(theta), np.sin(theta)
    temp = (force + pml * theta_dot ** 2 * sth) / total_mass
    thetaacc = (p.gravity * sth - cth * temp) / (
        p.length * (4.0 / 3.0 - p.masspole * cth ** 2 / total_mass))
    xacc = temp - pml * thetaacc * cth / total_mass
    return np.array([x + p.tau * x_dot, x_dot + p.tau * xacc,
                     theta + p.tau * theta_dot, theta_dot + p.tau * thetaacc])


class TestPendulum:
    def test_step_vs_reference_physics(self):
        p = pendulum.PendulumParams(g=10.0, max_torque=5.0)
        for _ in range(20):
            s = RNG.uniform(-np.pi, np.pi, 2)
            u = RNG.uniform(-8, 8)  # beyond torque limit to exercise clip
            nxt, _ = pendulum.step(jnp.asarray(s), jnp.asarray(u), p)
            np.testing.assert_allclose(np.asarray(nxt), _pendulum_ref(s, u, p),
                                       atol=1e-12)

    def test_reward_formula(self):
        p = pendulum.PendulumParams()
        s = np.array([0.5, 1.0])
        u = 0.7
        _, r = pendulum.step(jnp.asarray(s), jnp.asarray(u), p)
        expected = -(0.5 ** 2 + 0.1 * 1.0 ** 2 + 0.001 * 0.7 ** 2)
        np.testing.assert_allclose(float(r), expected, atol=1e-12)

    def test_speed_clip(self):
        p = pendulum.PendulumParams(max_speed=2.0)
        s = np.array([np.pi / 2, 1.9])
        nxt, _ = pendulum.step(jnp.asarray(s), jnp.asarray(p.max_torque), p)
        assert abs(float(nxt[1])) <= 2.0 + 1e-12

    def test_batch_matches_single(self):
        p = pendulum.PendulumParams()
        s = RNG.uniform(-1, 1, (6, 2))
        u = RNG.uniform(-2, 2, (6, 1))
        batch, _ = pendulum.step_batch(jnp.asarray(s), jnp.asarray(u), p)
        for i in range(6):
            single, _ = pendulum.step(jnp.asarray(s[i]), jnp.asarray(u[i]), p)
            np.testing.assert_allclose(np.asarray(batch[i]), np.asarray(single),
                                       atol=1e-12)

    def test_env_wrapper(self):
        env = pendulum.PendulumEnv(init_state={'th_init': 1.0,
                                               'thdot_init': 0.5})
        obs, _ = env.reset()
        np.testing.assert_allclose(obs, [1.0, 0.5])
        nxt, r, term, trunc, _ = env.step(np.array([0.3]))
        assert nxt.shape == (2,) and not term and not trunc

    def test_angle_normalize(self):
        np.testing.assert_allclose(float(pendulum.angle_normalize(jnp.pi + 0.1)),
                                   -jnp.pi + 0.1, atol=1e-7)


class TestCartPole:
    def test_step_physics_vs_reference(self):
        p = cartpole.CartPoleParams()
        for _ in range(20):
            s = RNG.uniform(-1, 1, 4)
            f = RNG.uniform(-30, 30)
            nxt = cartpole.step_physics(jnp.asarray(s), jnp.asarray(f), p)
            np.testing.assert_allclose(np.asarray(nxt), _cartpole_ref(s, f, p),
                                       atol=1e-10)

    def test_action_scaling(self):
        p = cartpole.CartPoleParams()
        s = RNG.uniform(-0.2, 0.2, 4)
        n1, _ = cartpole.step(jnp.asarray(s), jnp.asarray(0.5), p)
        n2 = cartpole.step_physics(jnp.asarray(s), jnp.asarray(15.0), p)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-12)

    def test_env_wrapper(self):
        env = cartpole.CartPoleEnv(seed=0)
        obs, _ = env.reset()
        assert obs.shape == (4,)
        nxt, r, term, trunc, _ = env.step(np.array([0.1]))
        assert nxt.shape == (4,) and r == 1.0


class TestAnalyticModels:
    def test_nominal_vs_true_friction_gap(self):
        x = jnp.asarray(RNG.uniform(-1, 1, (5, 2)))
        u = jnp.asarray(RNG.uniform(-1, 1, (5,)))
        nom = np.asarray(pmodels.nom_model_om(x, u))
        true = np.asarray(pmodels.true_model_om(x, u))
        gap = -pmodels.b / pmodels.m * np.asarray(x[:, 1]) * pmodels.delta_t
        np.testing.assert_allclose(true - nom, gap, atol=1e-12)

    def test_single_and_batch_agree(self):
        x = RNG.uniform(-1, 1, (4, 2))
        u = RNG.uniform(-1, 1, 4)
        batch_th = np.asarray(pmodels.nom_model_th(jnp.asarray(x), jnp.asarray(u)))
        batch_om = np.asarray(pmodels.true_model_om(jnp.asarray(x), jnp.asarray(u)))
        for i in range(4):
            np.testing.assert_allclose(
                float(pmodels.nom_model_th(jnp.asarray(x[i]), jnp.asarray(u[i]))),
                batch_th[i], atol=1e-12)
            np.testing.assert_allclose(
                float(pmodels.true_model_om(jnp.asarray(x[i]), jnp.asarray(u[i]))),
                batch_om[i], atol=1e-12)

    def test_residual_adapter_shape(self):
        xu = jnp.asarray(RNG.uniform(-1, 1, (7, 3)))
        out = pmodels.nominal_residual_fn(xu)
        assert out.shape == (7, 2)

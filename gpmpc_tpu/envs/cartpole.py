"""Continuous-action cartpole plant — pure-jnp stepper + host wrapper.

Physics matches the reference's `ContinuousCartPoleEnv.stepPhysics`
(environments/continuous_cartpole.py:24-87): semi-implicit-free Euler on the
classic cartpole equations, continuous force action in [-1, 1] scaled by 30 N,
termination disabled (continuous_cartpole.py:89-101 always returns done=False).

State: (x, x_dot, theta, theta_dot).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class CartPoleParams(NamedTuple):
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    length: float = 0.5        # half the pole length
    force_mag: float = 30.0
    tau: float = 0.02


def step_physics(state: jax.Array, force: jax.Array,
                 params: CartPoleParams = CartPoleParams()) -> jax.Array:
    """(state (4,), force ()) -> next_state (4,). Force in Newtons (already
    scaled); pure, jittable, vmappable."""
    x, x_dot, theta, theta_dot = state[0], state[1], state[2], state[3]
    total_mass = params.masscart + params.masspole
    polemass_length = params.masspole * params.length
    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)
    temp = (force + polemass_length * theta_dot ** 2 * sintheta) / total_mass
    thetaacc = (params.gravity * sintheta - costheta * temp) / (
        params.length * (4.0 / 3.0 - params.masspole * costheta ** 2 / total_mass))
    xacc = temp - polemass_length * thetaacc * costheta / total_mass
    x = x + params.tau * x_dot
    x_dot = x_dot + params.tau * xacc
    theta = theta + params.tau * theta_dot
    theta_dot = theta_dot + params.tau * thetaacc
    return jnp.stack([x, x_dot, theta, theta_dot])


def step(state: jax.Array, action: jax.Array,
         params: CartPoleParams = CartPoleParams()):
    """Action in [-1, 1]; returns (next_state, reward=1.0) like the reference
    (continuous_cartpole.py:89-101)."""
    force = params.force_mag * jnp.reshape(action, ())
    return step_physics(state, force, params), jnp.asarray(1.0, state.dtype)


step_batch = jax.vmap(step, in_axes=(0, 0, None))


def sample_transitions(key: jax.Array, n: int,
                       params: CartPoleParams = CartPoleParams()):
    """Random transitions over the pretraining ranges of
    pretrain_cts_cartpole.py:14-27."""
    ks = jax.random.split(key, 5)
    x = jax.random.uniform(ks[0], (n,), minval=-2.4, maxval=2.4)
    xdot = jax.random.uniform(ks[1], (n,), minval=-2.0, maxval=2.0)
    theta = jax.random.uniform(ks[2], (n,), minval=-np.pi / 4, maxval=np.pi / 4)
    thetadot = jax.random.uniform(ks[3], (n,), minval=-2.0, maxval=2.0)
    actions = jax.random.uniform(ks[4], (n, 1), minval=-1.0, maxval=1.0)
    states = jnp.stack([x, xdot, theta, thetadot], axis=1)
    next_states, _ = step_batch(states, actions, params)
    return states, actions, next_states


class CartPoleEnv:
    """Host-side stateful wrapper (reset/step), gym-free."""

    def __init__(self, params: CartPoleParams = CartPoleParams(),
                 seed: Optional[int] = None):
        self.params = params
        self._rng = np.random.default_rng(seed)
        self.state = np.zeros(4)
        self._step = jax.jit(lambda s, u: step(s, u, self.params))

    def reset(self, *, seed: Optional[int] = None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self.state = self._rng.uniform(-0.2, 0.2, size=4)
        return self.state.copy(), {}

    def step(self, action):
        next_state, reward = self._step(jnp.asarray(self.state, jnp.float32),
                                        jnp.asarray(action, jnp.float32))
        self.state = np.asarray(next_state, np.float64)
        return self.state.copy(), float(reward), False, False, {}

    def close(self):
        pass

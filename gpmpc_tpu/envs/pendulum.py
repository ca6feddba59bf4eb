"""Adjustable pendulum plant — pure-jnp stepper + host-side env wrapper.

Physics matches the reference's `AdjustablePendulumEnv`
(environments/adjustable_pendulum.py:135-178, a Gymnasium classic-pendulum fork):

  u        <- clip(u, -max_torque, max_torque)
  thdot'   <- thdot + (3 g / (2 l) sin(th) + 3 / (m l^2) u) * dt
  thdot'   <- clip(thdot', -max_speed, max_speed)
  th'      <- th + thdot' * dt
  reward   = -(angle_norm(th)^2 + 0.1 thdot^2 + 0.001 u^2)

Observations are the raw (theta, theta_dot) state — the fork deliberately drops
the (cos, sin, thdot) encoding (adjustable_pendulum.py:197-198).

Because the stepper is a pure jnp function of (state, action, params), whole
batched episodes run on device under jit/vmap/scan — the TPU-first capability
the host-loop reference lacks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PendulumParams(NamedTuple):
    g: float = 10.0
    m: float = 1.0
    l: float = 1.0
    dt: float = 0.05
    max_speed: float = 8.0
    max_torque: float = 2.0


DEFAULT_TH = np.pi
DEFAULT_THDOT = 1.0


def angle_normalize(x):
    """Wrap to [-pi, pi) (reference adjustable_pendulum.py:305)."""
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def step(state: jax.Array, u: jax.Array, params: PendulumParams = PendulumParams()):
    """(state (2,), u (1,) or ()) -> (next_state (2,), reward ()). Pure, jittable,
    vmappable over leading batch axes of state/u."""
    th, thdot = state[0], state[1]
    u = jnp.clip(jnp.reshape(u, ()), -params.max_torque, params.max_torque)
    cost = angle_normalize(th) ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2
    newthdot = thdot + (3.0 * params.g / (2.0 * params.l) * jnp.sin(th)
                        + 3.0 / (params.m * params.l ** 2) * u) * params.dt
    newthdot = jnp.clip(newthdot, -params.max_speed, params.max_speed)
    newth = th + newthdot * params.dt
    return jnp.stack([newth, newthdot]), -cost


step_batch = jax.vmap(step, in_axes=(0, 0, None))


def sample_transitions(key: jax.Array, n: int,
                       params: PendulumParams = PendulumParams(),
                       th_range=(0.0, np.pi)):
    """Generate n random (state, action, next_state) training transitions —
    the pretraining data pattern of pretrain_pendulum.py:18-26."""
    k1, k2, k3 = jax.random.split(key, 3)
    th = jax.random.uniform(k1, (n,), minval=th_range[0], maxval=th_range[1])
    thdot = jax.random.uniform(k2, (n,), minval=-params.max_speed,
                               maxval=params.max_speed)
    actions = jax.random.uniform(k3, (n, 1), minval=-params.max_torque,
                                 maxval=params.max_torque)
    states = jnp.stack([th, thdot], axis=1)
    next_states, _ = step_batch(states, actions, params)
    return states, actions, next_states


class PendulumEnv:
    """Host-side stateful wrapper with the gym-ish reset/step surface the
    reference Simulator drives (simulator.py:41-48). No gym dependency;
    rendering intentionally omitted (the reference's pygame path is
    display-bound and out of compute scope)."""

    def __init__(self, params: PendulumParams = PendulumParams(),
                 init_state: Optional[dict] = None, seed: Optional[int] = None):
        self.params = params
        self.init_state = init_state
        self._rng = np.random.default_rng(seed)
        self.state = np.zeros(2)
        self._step = jax.jit(lambda s, u: step(s, u, self.params))

    def reset(self, *, seed: Optional[int] = None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        if self.init_state is None:
            high = np.array([DEFAULT_TH, DEFAULT_THDOT])
            self.state = self._rng.uniform(-high, high)
        else:
            th = self.init_state.get('th_init', DEFAULT_TH)
            thdot = self.init_state.get('thdot_init', DEFAULT_THDOT)
            self.state = np.array([th, thdot], np.float64)
        return self.state.copy(), {}

    def step(self, action):
        next_state, reward = self._step(jnp.asarray(self.state, jnp.float32),
                                        jnp.asarray(action, jnp.float32))
        self.state = np.asarray(next_state, np.float64)
        return self.state.copy(), float(reward), False, False, {}

    def close(self):
        pass

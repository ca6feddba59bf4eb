"""Analytic pendulum model pair — nominal (frictionless) vs true (with friction).

Reference: models/pendulum.py:8-56. The nominal models serve as GP mean
functions (the GP fits the residual); the true models generate data. Constants
match the reference exactly: m=1, l=1, b=0.5, g=9.8, dt=0.1.

All functions take batched input x (N, 2+) with columns (theta, omega, ...) and
action u (N,) or (N, 1); 1-D single-sample input is also accepted, mirroring the
reference's dual handling (pendulum.py:20-23, 30-33).
"""

from __future__ import annotations

import jax.numpy as jnp

m = 1.0
l = 1.0
b = 0.5
g = 9.8
delta_t = 0.1


def _cols(x, u):
    if x.ndim == 2:
        return x[:, 0], x[:, 1], jnp.reshape(u, (-1,))
    return x[0], x[1], jnp.reshape(u, ())


def nom_model_th(x, u):
    """theta_{k+1} = theta_k + omega_k * dt (reference pendulum.py:16-23)."""
    th, om, _ = _cols(x, u)
    return th + om * delta_t


def nom_model_om(x, u):
    """Frictionless omega update (reference pendulum.py:26-33)."""
    th, om, uu = _cols(x, u)
    return -g / l * jnp.sin(th) * delta_t + om + 1.0 / (m * l ** 2) * uu * delta_t


def true_model_th(x, u):
    """Same kinematics as nominal (reference pendulum.py:37-44)."""
    return nom_model_th(x, u)


def true_model_om(x, u):
    """Adds viscous friction -b/m * omega * dt (reference pendulum.py:47-56)."""
    th, om, uu = _cols(x, u)
    return (-b / m * om * delta_t - g / l * jnp.sin(th) * delta_t + om
            + 1.0 / (m * l ** 2) * uu * delta_t)


def nominal_residual_fn(xu):
    """GPConfig.nominal_fn adapter: xu (N, 3) = (theta, omega, u) -> (N, 2)
    nominal next state, for residual-GP dynamics learning."""
    x, u = xu[:, :2], xu[:, 2]
    return jnp.stack([nom_model_th(x, u), nom_model_om(x, u)], axis=1)

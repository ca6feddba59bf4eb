"""Canonical benchmark problem definitions shared by bench.py, the benchmark
suite, and the solution-quality regression harness — one source of truth so a
perf change and its quality guard always measure the SAME workload.

The headline problem is the BASELINE.json north-star scale: B independent
risk-sensitive GP-MPC solves against a shared exact-GP pendulum-dimension
posterior (ds=2, da=1), N=200 training points (capacity 256), horizon 20
(reference workload role: mpc.py:269-330 driven by simulator.py:47).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

# BASELINE.json north_star: ">=1000 concurrent GP-MPC solves/s on a v5p
# host". The single source of truth for bench.py's vs_baseline ratio.
BASELINE_TARGET_SOLVES_PER_S = 1000.0


class HeadlineProblem(NamedTuple):
    gp: object            # GPState
    state_dim: int
    action_dim: int
    x0s: object           # (B, ds)
    params: object        # CostParams (gamma is a (B,) sweep)
    horizon: int
    lb: float
    ub: float


def make_headline_problem(b: int = 256, dtype=None, seed: int = 0,
                          n_train: int = 200, capacity: int = 256,
                          horizon: int = 20) -> HeadlineProblem:
    """The bench.py workload. dtype defaults to f32 (the production precision);
    pass jnp.float64 (under jax.enable_x64) for the quality-reference solve."""
    import jax.numpy as jnp

    from gpmpc_tpu.gp import state as gs
    from gpmpc_tpu.mpc.cost import CostParams

    if dtype is None:
        dtype = jnp.float32
    ds, da = 2, 1

    rng = np.random.default_rng(seed)
    states = rng.uniform(-np.pi, np.pi, (n_train, ds))
    actions = rng.uniform(-5, 5, (n_train, da))
    next_states = states + 0.05 * np.concatenate(
        [states[:, 1:], 15 * np.sin(states[:, :1]) + 3 * actions], axis=1)
    x = np.concatenate([states, actions], axis=1)
    cfg = gs.GPConfig(capacity=capacity, x_dim=ds + da, out_dim=ds)
    # f32-friendly conditioning (sigma_n = 0.1): the hot path runs in f32; the
    # reference's sigma_n = 1e-5 configs require x64 (see gp/state.py).
    gp = gs.make_gp(cfg, x, next_states, log_lambdas=np.log([4.0] * (ds + da)),
                    log_sigma_f=0.0, log_sigma_n=np.log(0.1), dtype=dtype)

    x0s = jnp.asarray(rng.uniform(-1, 1, (b, ds)), dtype)
    gammas = jnp.asarray(np.linspace(-0.5, 0.5, b), dtype)
    params = CostParams(Q=2.0 * jnp.eye(ds, dtype=dtype),
                        R=0.01 * jnp.eye(da, dtype=dtype),
                        gamma=gammas,
                        x_ref=jnp.zeros(ds, dtype), u_ref=jnp.zeros(da, dtype))
    return HeadlineProblem(gp=gp, state_dim=ds, action_dim=da, x0s=x0s,
                           params=params, horizon=horizon, lb=-5.0, ub=5.0)


def cartpole_data(n_train: int, seed: int = 0):
    """Backend-independent cartpole transitions: NUMPY rng + host f64 physics
    (exact twin of envs.cartpole.step_physics) so the dataset is bit-identical
    in every process — jax.random resolves to different PRNG implementations
    on this machine's TPU vs CPU (see make_cartpole_problem note).
    Returns (x (n, 5), next_states (n, 4)) float64."""
    from gpmpc_tpu.envs import cartpole as cp

    rng0 = np.random.default_rng(seed)
    st = np.stack([rng0.uniform(-2.4, 2.4, n_train),
                   rng0.uniform(-2.0, 2.0, n_train),
                   rng0.uniform(-np.pi / 4, np.pi / 4, n_train),
                   rng0.uniform(-2.0, 2.0, n_train)], axis=1)
    ac = rng0.uniform(-1.0, 1.0, (n_train, 1))
    pp = cp.CartPoleParams()
    force = pp.force_mag * ac[:, 0]
    xp, xd, th, thd = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
    total_mass = pp.masscart + pp.masspole
    pml = pp.masspole * pp.length
    ct, stn = np.cos(th), np.sin(th)
    temp = (force + pml * thd ** 2 * stn) / total_mass
    thacc = (pp.gravity * stn - ct * temp) / (
        pp.length * (4.0 / 3.0 - pp.masspole * ct ** 2 / total_mass))
    xacc = temp - pml * thacc * ct / total_mass
    ns = np.stack([xp + pp.tau * xd, xd + pp.tau * xacc,
                   th + pp.tau * thd, thd + pp.tau * thacc], axis=1)
    return np.concatenate([st, ac], axis=1), ns


def make_sparse_cartpole_problem(b: int = 256, dtype=None, seed: int = 0,
                                 n_train: int = 1000, m: int = 128,
                                 horizon: int = 10) -> HeadlineProblem:
    """Suite config 3b's workload with backend-independent data: cartpole
    N=1000 through the FITC sparse GP (M=128), gamma=0, H=10, bounds +-1."""
    import jax.numpy as jnp

    from gpmpc_tpu.gp import sparse as gsp
    from gpmpc_tpu.mpc.cost import CostParams

    if dtype is None:
        dtype = jnp.float32
    ds, da = 4, 1
    x, ns = cartpole_data(n_train, seed)
    rng = np.random.default_rng(seed + 3)
    sel = rng.choice(n_train, m, replace=False)
    z = jnp.asarray(x[sel], dtype)
    sp, _ml = gsp.fit_sparse(z, jnp.asarray(x, dtype),
                             jnp.asarray(ns, dtype).T,
                             jnp.log(jnp.full((ds, ds + da), 2.0, dtype)),
                             jnp.zeros((ds,), dtype),
                             jnp.full((ds,), np.log(0.1), dtype))
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (b, ds)), dtype)
    params = CostParams(Q=jnp.eye(ds, dtype=dtype),
                        R=0.1 * jnp.eye(da, dtype=dtype),
                        gamma=jnp.zeros((), dtype),
                        x_ref=jnp.zeros(ds, dtype), u_ref=jnp.zeros(da, dtype))
    return HeadlineProblem(gp=sp, state_dim=ds, action_dim=da, x0s=x0s,
                           params=params, horizon=horizon, lb=-1.0, ub=1.0)


def make_sparse_fullcov_problem(b: int = 64, dtype=None, seed: int = 0,
                                n_train: int = 1000, m: int = 128,
                                horizon: int = 50) -> HeadlineProblem:
    """Suite config 4's workload: pendulum-dimension FITC sparse GP (M=128),
    FULL cross-output covariance propagation, H=50, gamma=-1e-2."""
    import jax.numpy as jnp

    from gpmpc_tpu.gp import sparse as gsp
    from gpmpc_tpu.gp import state as gs
    from gpmpc_tpu.mpc.cost import CostParams

    if dtype is None:
        dtype = jnp.float32
    ds, da = 2, 1
    rng = np.random.default_rng(seed)
    states = rng.uniform(-np.pi, np.pi, (n_train, ds))
    actions = rng.uniform(-5, 5, (n_train, da))
    next_states = states + 0.05 * np.concatenate(
        [states[:, 1:], 15 * np.sin(states[:, :1]) + 3 * actions], axis=1)
    x = np.concatenate([states, actions], axis=1)
    rng4 = np.random.default_rng(seed + 4)
    sel = rng4.choice(n_train, m, replace=False)
    z = jnp.asarray(x[sel], dtype)
    sp, _ml = gsp.fit_sparse(z, jnp.asarray(x, dtype),
                             jnp.asarray(next_states, dtype).T,
                             jnp.log(jnp.full((ds, ds + da), 4.0, dtype)),
                             jnp.zeros((ds,), dtype),
                             jnp.full((ds,), np.log(0.1), dtype))
    x0s = jnp.asarray(rng4.uniform(-1, 1, (b, ds)), dtype)
    params = CostParams(Q=2.0 * jnp.eye(ds, dtype=dtype),
                        R=0.01 * jnp.eye(da, dtype=dtype),
                        gamma=jnp.asarray(-1e-2, dtype),
                        x_ref=jnp.zeros(ds, dtype), u_ref=jnp.zeros(da, dtype))
    return HeadlineProblem(gp=sp, state_dim=ds, action_dim=da, x0s=x0s,
                           params=params, horizon=horizon, lb=-5.0, ub=5.0)


def make_cartpole_problem(b: int = 32, dtype=None, seed: int = 0,
                          n_train: int = 200, capacity: int = 256,
                          horizon: int = 10) -> HeadlineProblem:
    """Second quality workload (recipe-generalization evidence): the
    BASELINE config-3 cartpole plant (4-D state, true step_physics data) at a
    CPU-reference-affordable N, gamma sweep, H=10, force bounds +-1."""
    import jax
    import jax.numpy as jnp

    from gpmpc_tpu.envs import cartpole as cp
    from gpmpc_tpu.gp import state as gs
    from gpmpc_tpu.mpc.cost import CostParams

    if dtype is None:
        dtype = jnp.float32
    ds, da = 4, 1
    # Training data via NUMPY rng + the pure physics stepper — NOT
    # jax.random: this machine's TPU platform resolves jax.random to a
    # different PRNG implementation than CPU, so jax.random-seeded problems
    # are NOT the same problem across backends (observed as a phantom 30%
    # "quality gap": the f64 CPU reference and the TPU solve optimized
    # different GP posteriors).
    rng0 = np.random.default_rng(seed)
    st = np.stack([rng0.uniform(-2.4, 2.4, n_train),
                   rng0.uniform(-2.0, 2.0, n_train),
                   rng0.uniform(-np.pi / 4, np.pi / 4, n_train),
                   rng0.uniform(-2.0, 2.0, n_train)], axis=1)
    ac = rng0.uniform(-1.0, 1.0, (n_train, da))
    # Host numpy f64 physics (exact twin of envs.cartpole.step_physics) so
    # the dataset is bit-identical in every process regardless of backend
    # dtype defaults.
    pp = cp.CartPoleParams()
    force = pp.force_mag * ac[:, 0]
    xp, xd, th, thd = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
    total_mass = pp.masscart + pp.masspole
    pml = pp.masspole * pp.length
    ct, stn = np.cos(th), np.sin(th)
    temp = (force + pml * thd ** 2 * stn) / total_mass
    thacc = (pp.gravity * stn - ct * temp) / (
        pp.length * (4.0 / 3.0 - pp.masspole * ct ** 2 / total_mass))
    xacc = temp - pml * thacc * ct / total_mass
    ns = np.stack([xp + pp.tau * xd, xd + pp.tau * xacc,
                   th + pp.tau * thd, thd + pp.tau * thacc], axis=1)
    x = np.concatenate([st, ac], axis=1)
    cfg = gs.GPConfig(capacity=capacity, x_dim=ds + da, out_dim=ds)
    gp = gs.make_gp(cfg, x, np.asarray(ns, np.float64),
                    log_lambdas=np.log([2.0] * (ds + da)),
                    log_sigma_f=0.0, log_sigma_n=np.log(0.1), dtype=dtype)

    rng = np.random.default_rng(seed + 1)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (b, ds)), dtype)
    gammas = jnp.asarray(np.linspace(-0.5, 0.5, b), dtype)
    params = CostParams(Q=jnp.eye(ds, dtype=dtype),
                        R=0.1 * jnp.eye(da, dtype=dtype),
                        gamma=gammas,
                        x_ref=jnp.zeros(ds, dtype), u_ref=jnp.zeros(da, dtype))
    return HeadlineProblem(gp=gp, state_dim=ds, action_dim=da, x0s=x0s,
                           params=params, horizon=horizon, lb=-1.0, ub=1.0)

"""Checkpoint / resume for GP-MPC state.

The reference has no persistence at all (SURVEY.md §5: no torch.save anywhere;
model state is reconstructed by re-appending data). Here the model state is an
explicit pytree, so checkpointing is trivial and exact: the GPState arrays
(training buffers + hyperparameters + cached factorizations) plus the static
config go to one .npz; controller checkpoints add the warm-start buffer.
Orbax is available in the image for large sharded states, but a GP-MPC
checkpoint is kilobytes-to-megabytes — np.savez keeps it dependency-light and
inspectable.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.gp.state import GPConfig, GPState

_ARRAY_FIELDS = ('x', 'y', 'mask', 'count', 'log_lambdas', 'log_sigma_f',
                 'log_sigma_n', 'kinv', 'beta', 'logdet', 'jitter_used')


def save_gp(path: str, state: GPState) -> None:
    """Write a GPState to `path` (.npz). nominal_fn is code, not data — it is
    NOT serialized; pass it to load_gp."""
    cfg = state.config
    meta = dict(capacity=cfg.capacity, x_dim=cfg.x_dim, out_dim=cfg.out_dim,
                jitter=cfg.jitter, solve_backend=cfg.solve_backend,
                has_nominal=cfg.nominal_fn is not None)
    arrays = {f: np.asarray(getattr(state, f)) for f in _ARRAY_FIELDS}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_gp(path: str, nominal_fn=None, dtype=None) -> GPState:
    """Load a GPState. If the checkpoint was saved with a nominal model, the
    same callable must be supplied (it cannot be serialized)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data['__meta__']))
        arrays = {f: data[f] for f in _ARRAY_FIELDS}
    if meta.pop('has_nominal') and nominal_fn is None:
        raise ValueError('checkpoint used a nominal model; pass nominal_fn=')
    cfg = GPConfig(nominal_fn=nominal_fn, **meta)

    def conv(name, arr):
        if name in ('mask',):
            return jnp.asarray(arr, bool)
        if name == 'count':
            return jnp.asarray(arr, jnp.int32)
        return jnp.asarray(arr, dtype) if dtype else jnp.asarray(arr)

    return GPState(config=cfg, **{f: conv(f, a) for f, a in arrays.items()})


def save_controller(path: str, mpc) -> None:
    """Checkpoint a RiskSensitiveMPC: GP state + warm-start buffer + cost
    setup, enough to resume a receding-horizon run exactly."""
    save_gp(path + '.gp.npz', mpc.gp)
    np.savez(path + '.ctrl.npz',
             last_traj=mpc.last_traj,
             Q=np.asarray(mpc.Q), R=np.asarray(mpc.R),
             R_delta=(np.asarray(mpc.R_delta)
                      if mpc.R_delta is not None else np.zeros(0)),
             x_ref=np.asarray(mpc.x_ref), u_ref=np.asarray(mpc.u_ref),
             lb=mpc.lb, ub=mpc.ub,
             meta=json.dumps(dict(gamma=mpc.gamma, horizon=mpc.horizon,
                                  state_dim=mpc.state_dim,
                                  input_dim=mpc.input_dim,
                                  full_cov=mpc.full_cov,
                                  delta_dynamics=mpc.delta_dynamics)))


def load_controller(path: str, nominal_fn=None):
    """Rebuild a RiskSensitiveMPC from save_controller output."""
    from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
    gp = load_gp(path + '.gp.npz', nominal_fn=nominal_fn)
    with np.load(path + '.ctrl.npz', allow_pickle=False) as d:
        meta = json.loads(str(d['meta']))
        r_delta = d['R_delta'] if d['R_delta'].size else None
        mpc = RiskSensitiveMPC(
            gamma=meta['gamma'], horizon=meta['horizon'],
            state_dim=meta['state_dim'], input_dim=meta['input_dim'],
            Q=d['Q'], R=d['R'], R_delta=r_delta,
            capacity=gp.config.capacity, full_cov=meta['full_cov'],
            delta_dynamics=meta['delta_dynamics'], dtype=gp.x.dtype)
        mpc.gp = gp
        mpc.last_traj = d['last_traj']
        mpc.x_ref = jnp.asarray(d['x_ref'])
        mpc.u_ref = jnp.asarray(d['u_ref'])
        mpc.lb = d['lb']
        mpc.ub = d['ub']
    return mpc

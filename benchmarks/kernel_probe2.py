"""Probe: resident full-N tied kernel vs streamed lane-aware tied kernel at
the HEADLINE shape (B=256, N=256, d=3, E=2), timed as scan chains (slope
between lengths isolates per-call cost)."""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp

    from gpmpc_tpu.ops.pallas import variance_trace as vt

    B, N, D, E = 256, 256, 3, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, (N, D)), jnp.float32)
    blam = jnp.asarray(rng.uniform(-0.1, 0.1, (E, N, N)), jnp.float32)
    blam = 0.5 * (blam + jnp.swapaxes(blam, 1, 2))
    m2 = jnp.eye(D, dtype=jnp.float32) * 0.3

    def chain(call_mode, length, u0):
        def body(u, _):
            a = u[:, None, :] - x[None]
            g = jnp.einsum('bnd,dk->bnk', a, m2)
            q = jnp.sum(g * a, axis=-1)
            dv = jnp.exp(-0.125 * q)
            ao = jnp.concatenate([jnp.ones(a.shape[:-1] + (1,), a.dtype), a],
                                 axis=-1)
            old = vt._FULL_N_MAX
            vt._FULL_N_MAX = 0 if call_mode == 'streamed' else old
            try:
                rw = vt._rw_call_tied(g, a, dv, ao, blam)
            finally:
                vt._FULL_N_MAX = old
            t = jnp.sum(rw[..., 0], axis=-1)
            return u + 1e-4 * jnp.pad(t, ((0, 0), (0, D - E))), None

        u, _ = jax.lax.scan(body, u0, None, length=length)
        return u

    results = {}
    for mode in ('resident', 'streamed'):
        for length in (24, 96):
            fn = jax.jit(functools.partial(chain, mode, length))
            u0 = jnp.asarray(rng.uniform(-1, 1, (B, D)), jnp.float32)
            _ = np.asarray(fn(u0))
            ts = []
            for _ in range(3):
                u0 = jnp.asarray(rng.uniform(-1, 1, (B, D)), jnp.float32)
                jax.block_until_ready(u0)
                t0 = time.perf_counter()
                out = fn(u0)
                _ = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            results[f'{mode}_L{length}'] = round(min(ts) * 1e3, 2)
        us = (results[f'{mode}_L96'] - results[f'{mode}_L24']) / 72.0
        results[f'{mode}_us_per_call'] = round(us * 1e3, 1)
        print(json.dumps(results))


if __name__ == '__main__':
    main()

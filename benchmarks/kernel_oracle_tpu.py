"""On-TPU kernel-numerics artifact (VERDICT r2 item 5).

The CPU test suite exercises the Pallas kernels only in interpreter mode
(exact f32), so the bf16x3 MXU arithmetic (`_dot3`/`_dot3_t`, claimed ~3e-5
max rel err) was previously pinned nowhere on real hardware. This harness
runs the kernel oracles COMPILED on the TPU chip — forward values and VJP
cotangents against the pure-jnp reference twins evaluated in f64-via-f32x2
(numpy f64 on host) — and records max relative errors per shape to
benchmarks/results/KERNEL_TPU_r{N}.json.

Shapes: the headline solve (N=256, d=3, E=2), the cartpole/config-3 scale
(N=1024, d=5, E=4), and a non-power-of-two tile count (N=384). Each shape
runs the tied and untied dispatches, both the column-sweep streamed kernel
and (when enabled/supported) the symmetric pair kernel.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _np_reference(u, m2e, x, blam, dvec_pow=0.125):
    """f64 numpy oracle of variance_trace_batched (untied layout)."""
    a = u[:, None, :] - x[None]                        # (B, N, d)
    out = np.zeros((u.shape[0], blam.shape[0]), np.float64)
    rw = None
    for b in range(u.shape[0]):
        for e in range(blam.shape[0]):
            g = a[b] @ m2e[b, e]
            p = g @ a[b].T
            q = np.sum(g * a[b], axis=1)
            dv = np.exp(-dvec_pow * q)
            w = blam[e] * np.exp(-0.25 * p)
            out[b, e] = dv @ w @ dv
    return out


def run_shape(b, n, d, e, seed=0):
    import jax
    import jax.numpy as jnp
    from gpmpc_tpu.ops.pallas import variance_trace as vt

    rng = np.random.default_rng(seed)
    u = rng.uniform(-1, 1, (b, d))
    x = rng.uniform(-3, 3, (n, d))
    blam = rng.uniform(-0.1, 0.1, (e, n, n))
    blam = 0.5 * (blam + np.swapaxes(blam, 1, 2))
    m2 = rng.uniform(-0.1, 0.1, (b, d, d))
    m2 = 0.5 * (m2 + np.swapaxes(m2, 1, 2)) + 0.5 * np.eye(d)
    m2e = rng.uniform(-0.1, 0.1, (b, e, d, d))
    m2e = 0.5 * (m2e + np.swapaxes(m2e, 2, 3)) + 0.5 * np.eye(d)

    uj = jnp.asarray(u, jnp.float32)
    xj = jnp.asarray(x, jnp.float32)
    blj = jnp.asarray(blam, jnp.float32)
    m2j = jnp.asarray(m2, jnp.float32)
    m2ej = jnp.asarray(m2e, jnp.float32)

    res = {}

    # f64 oracle values
    t64_tied = _np_reference(u, np.broadcast_to(m2[:, None], m2e.shape), x,
                             blam)
    t64_untied = _np_reference(u, m2e, x, blam)

    def relerr(aj, a64):
        an = np.asarray(aj, np.float64)
        return float(np.max(np.abs(an - a64) / (1e-3 + np.abs(a64))))

    # forward — NOTE the fresh lambda wrappers: jax.jit keeps a global trace
    # cache keyed on the wrapped callable, so jitting the module-level
    # custom_vjp objects directly would reuse the first mode's trace and
    # silently ignore the GPMPC_SYM_KERNEL switch between modes.
    res['fwd_tied'] = relerr(
        jax.jit(lambda *a: vt.variance_trace_batched_tied(*a))(
            uj, m2j, xj, blj), t64_tied)
    res['fwd_untied'] = relerr(
        jax.jit(lambda *a: vt.variance_trace_batched(*a))(
            uj, m2ej, xj, blj), t64_untied)

    # VJP vs f64 central finite differences of the f64 oracle (on u only;
    # du is the gradient the solver consumes).
    ct = rng.uniform(0.5, 1.5, (b, e))

    def loss_tied(u_, m2_):
        return jnp.sum(jnp.asarray(ct, jnp.float32)
                       * vt.variance_trace_batched_tied(u_, m2_, xj, blj))

    du = np.asarray(jax.jit(jax.grad(loss_tied))(uj, m2j), np.float64)
    eps = 1e-5
    du_fd = np.zeros_like(du)
    for k in range(d):
        up = u.copy(); up[:, k] += eps
        um = u.copy(); um[:, k] -= eps
        m2b = np.broadcast_to(m2[:, None], m2e.shape)
        fp = np.sum(ct * _np_reference(up, m2b, x, blam), axis=1)
        fm = np.sum(ct * _np_reference(um, m2b, x, blam), axis=1)
        du_fd[:, k] = (fp - fm) / (2 * eps)
    res['vjp_du_tied'] = float(np.max(np.abs(du - du_fd)
                                      / (1e-3 + np.abs(du_fd))))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--round', type=int, default=3)
    args = ap.parse_args()
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    backend = jax.default_backend()

    shapes = [
        dict(b=16, n=256, d=3, e=2),     # headline
        dict(b=8, n=1024, d=5, e=4),     # config-3 scale
        dict(b=8, n=384, d=3, e=2),      # odd tile count
    ]
    out = {'backend': backend, 'shapes': []}
    for mode, env in (('column', {'GPMPC_SYM_KERNEL': '0'}),
                      ('sym', {'GPMPC_SYM_KERNEL': '1'})):
        for k, v in env.items():
            os.environ[k] = v
        for s in shapes:
            try:
                r = run_shape(**s)
            except Exception as ex:                      # pragma: no cover
                r = {'error': str(ex)[:200]}
            out['shapes'].append({'mode': mode, **s, **r})
            print(json.dumps(out['shapes'][-1]))
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'results')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'KERNEL_TPU_r{args.round:02d}.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()

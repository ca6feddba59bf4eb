"""Microbenchmark of variance-trace kernel variants (tied-lambdas layout,
headline shape B=256, N=256, d=3, E=2), timed as a scan chain so per-call
dispatch overhead amortizes. Slope between two chain lengths isolates the
per-call cost.

Variants:
  base      — production kernel (_make_rw_tied_kernel: p on MXU @ HIGHEST)
  vpu_p     — p built from d outer-product accumulations on the VPU (no
              K=d matmul, exact f32)
  vpu_3p    — vpu_p + rw dot as a manual bf16x3 split (3 DEFAULT passes
              instead of HIGHEST's 6; Mosaic rejects precision=HIGH)
  vpu_def   — vpu_p + rw dot at DEFAULT (1 bf16 pass; accuracy probe)
"""

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D, E = 256, 256, 3, 2
    BT = 8
    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT

    def make_kernel(mode):
        def kernel(g_ref, a_ref, dv_ref, ao_ref, blam_ref, rw_ref):
            for k in range(BT):
                a = a_ref[k]                                      # (N, d)
                dv = dv_ref[k]                                    # (N, 1)
                if mode == 'base':
                    p = jnp.dot(g_ref[k], a.T,
                                preferred_element_type=jnp.float32,
                                precision=HI)
                else:
                    g = g_ref[k]
                    p = g[:, 0:1] * a[:, 0:1].T
                    for kk in range(1, D):
                        p += g[:, kk:kk + 1] * a[:, kk:kk + 1].T
                emat = jnp.exp(-0.25 * p)
                aod = ao_ref[k] * dv                              # (N, 1+d)
                if mode == 'vpu_3p':
                    ao_hi = aod.astype(jnp.bfloat16).astype(jnp.float32)
                    ao_lo = aod - ao_hi
                for e in range(E):
                    w = blam_ref[e] * emat
                    if mode == 'vpu_def':
                        rw = jnp.dot(w, aod,
                                     preferred_element_type=jnp.float32,
                                     precision=DEF)
                    elif mode == 'vpu_3p':
                        w_hi = w.astype(jnp.bfloat16).astype(jnp.float32)
                        w_lo = w - w_hi
                        rw = (jnp.dot(w_hi, ao_hi,
                                      preferred_element_type=jnp.float32,
                                      precision=DEF)
                              + jnp.dot(w_hi, ao_lo,
                                        preferred_element_type=jnp.float32,
                                        precision=DEF)
                              + jnp.dot(w_lo, ao_hi,
                                        preferred_element_type=jnp.float32,
                                        precision=DEF))
                    else:
                        rw = jnp.dot(w, aod,
                                     preferred_element_type=jnp.float32,
                                     precision=HI)
                    rw_ref[k, e] = dv * rw
        return kernel

    def call(mode, g, a, dv, ao, blam):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(B // BT,),
            in_specs=[
                pl.BlockSpec((BT, N, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, N, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, N, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, N, 1 + D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E, N, N), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BT, E, N, 1 + D), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, E, N, 1 + D), jnp.float32),
        )(g, a, dv, ao, blam)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, (N, D)), jnp.float32)
    blam = jnp.asarray(rng.uniform(-0.1, 0.1, (E, N, N)), jnp.float32)
    blam = 0.5 * (blam + jnp.swapaxes(blam, 1, 2))

    def chain(mode, length, u0):
        m2 = jnp.eye(D, dtype=jnp.float32) * 0.3

        def body(u, _):
            a = u[:, None, :] - x[None]
            g = jnp.einsum('bnd,dk->bnk', a, m2)
            q = jnp.sum(g * a, axis=-1)
            dv = jnp.exp(-0.125 * q)[..., None]
            ao = jnp.concatenate([jnp.ones(a.shape[:-1] + (1,), a.dtype), a],
                                 axis=-1)
            rw = call(mode, g, a, dv, ao, blam)
            t = jnp.sum(rw[..., 0], axis=-1)                       # (B, E)
            return u + 1e-4 * jnp.pad(t, ((0, 0), (0, D - E))), None

        u, _ = jax.lax.scan(body, u0, None, length=length)
        return u

    results = {}
    for mode in ('base', 'vpu_p', 'vpu_3p', 'vpu_def'):
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
        us_per_call = (results[f'{mode}_L96'] - results[f'{mode}_L24']) / 72.0
        results[f'{mode}_us_per_call'] = round(us_per_call * 1e3, 1)
        print(json.dumps(results))

    # accuracy vs f64 oracle (one call)
    u0 = jnp.asarray(rng.uniform(-1, 1, (B, D)), jnp.float32)
    m2 = jnp.eye(D, dtype=jnp.float32) * 0.3
    a = u0[:, None, :] - x[None]
    g = jnp.einsum('bnd,dk->bnk', a, m2)
    q = jnp.sum(g * a, axis=-1)
    dv = jnp.exp(-0.125 * q)[..., None]
    ao = jnp.concatenate([jnp.ones(a.shape[:-1] + (1,), a.dtype), a], axis=-1)
    a64, g64, dv64 = (np.asarray(v, np.float64) for v in (a, g, dv))
    p64 = np.einsum('bnk,bmk->bnm', g64, a64)
    w64 = np.asarray(blam, np.float64)[None] * np.exp(-0.25 * p64)[:, None]
    t64 = np.einsum('bn,benm,bm->be', dv64[..., 0], w64, dv64[..., 0])
    for mode in ('base', 'vpu_p', 'vpu_3p', 'vpu_def'):
        rw = np.asarray(call(mode, g, a, dv, ao, blam))
        t = np.einsum('ben->be', rw[..., 0])
        rel = np.max(np.abs(t - t64) / (np.abs(t64) + 1e-9))
        results[f'{mode}_max_rel_err'] = float(f'{rel:.3e}')
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()

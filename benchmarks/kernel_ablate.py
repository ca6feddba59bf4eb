"""Ablation probe for the streamed tied variance-trace kernel: time kernel
variants with individual stages disabled to locate where the ~350 us/call
goes at the headline shape (B=256, N=256, d=3, E=2).

Variants (all same grid/BlockSpecs/memory traffic unless noted):
  full      the production body (p outer products + exact exp + blam mul +
            bf16x3/highest MXU reduction + acc store)
  hwexp     exp chain via jnp.exp (hardware approximation)
  noexp     emat_t = -0.25 * p_t (no exp at all; keeps everything else)
  nop       emat_t = broadcast of one gt row (skips the d outer products AND
            the exp; keeps blam mul + dots + stores)
  nodots    full chain, but the MXU reduction replaced by a (W1, N) slice of
            w (keeps the acc store traffic; removes the dot work)
  nomul     full chain, dots contract emat directly (blam multiply skipped)
  empty     loads operands, accumulates a trivial slice (grid + DMA floor)

Writes benchmarks/results/kernel_ablate.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpmpc_tpu.ops.pallas import variance_trace as vt

    B, N, D, E = 256, 256, 3, 2
    W1 = 1 + D
    TJ = 128
    BT = vt._btile_streamed(B, N, TJ, E, W1)

    def make_kernel(variant, btile, e_total):
        def kernel(gt_ref, dvrt_ref, comb_ref, blam_ref, rwt_ref, acc_ref):
            j = pl.program_id(1)
            nj = pl.num_programs(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            def body(k, carry):
                comb = comb_ref[k]                            # (TJ, d+W1)
                d = comb.shape[-1] - acc_ref.shape[2]
                if variant == 'empty':
                    for e in range(e_total):
                        acc_ref[k, e] += jnp.broadcast_to(
                            blam_ref[e][0:1, :], acc_ref.shape[2:])
                    return carry
                if variant == 'nop':
                    emat_t = jnp.broadcast_to(gt_ref[k, 0:1, :],
                                              (comb.shape[0],
                                               gt_ref.shape[-1]))
                else:
                    p_t = comb[:, 0:1] * gt_ref[k, 0:1, :]
                    for kk in range(1, d):
                        p_t += comb[:, kk:kk + 1] * gt_ref[k, kk:kk + 1, :]
                    if variant == 'noexp':
                        emat_t = -0.25 * p_t
                    elif variant == 'hwexp':
                        emat_t = jnp.exp(-0.25 * p_t)
                    else:
                        emat_t = vt._exp(-0.25 * p_t)
                if variant == 'dott':
                    # Transposed MXU orientation: (N, W1) = W^T-contraction
                    # with the big N axis as the streamed M dimension.
                    aod = comb[:, d:]                         # (TJ, W1)
                    aod_hi, aod_lo = vt._split_bf16(aod)
                    dn = (((0,), (0,)), ((), ()))
                    for e in range(e_total):
                        w = blam_ref[e] * emat_t              # (TJ, N)
                        w_hi, w_lo = vt._split_bf16(w)

                        def dg(x, y):
                            return jax.lax.dot_general(
                                x, y, dn, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                        out_nw = (dg(w_hi, aod_hi) + dg(w_lo, aod_hi)
                                  + dg(w_hi, aod_lo))         # (N, W1)
                        acc_ref[k, e] += out_nw[
                            0:acc_ref.shape[2], 0:1]          # placeholder acc
                    return carry
                if variant == 'vpured':
                    w1 = acc_ref.shape[2]
                    aod = comb[:, d:]                         # (TJ, W1)
                    for e in range(e_total):
                        w = blam_ref[e] * emat_t              # (TJ, N)
                        rows = [
                            jnp.sum(aod[:, c:c + 1] * w, axis=0,
                                    keepdims=True)            # (1, N)
                            for c in range(w1)]
                        acc_ref[k, e] += jnp.concatenate(rows, axis=0)
                    return carry
                ao_hi, ao_lo = vt._split_bf16(comb[:, d:])    # (TJ, W1)
                for e in range(e_total):
                    if variant == 'nomul':
                        w = emat_t
                    else:
                        w = blam_ref[e] * emat_t              # (TJ, N)
                    if variant == 'nodots':
                        acc_ref[k, e] += w[0:acc_ref.shape[2], :]
                    else:
                        acc_ref[k, e] += vt._dot3_t(ao_hi, ao_lo, w)
                return carry

            jax.lax.fori_loop(0, btile, body, 0)

            @pl.when(j == nj - 1)
            def _():
                def out_body(k, carry):
                    for e in range(e_total):
                        rwt_ref[k, e] = dvrt_ref[k] * acc_ref[k, e]
                    return carry
                jax.lax.fori_loop(0, btile, out_body, 0)
        return kernel

    def call_variant(variant, g, a, dvec, ao, blam, bt, TJ=TJ):
        b, n, d = g.shape
        e = blam.shape[0]
        w1 = ao.shape[-1]
        kernel = make_kernel(variant, bt, e)
        g_t = jnp.swapaxes(g, 1, 2)
        dvr_t = dvec[:, None, :]
        comb = jnp.concatenate([a, ao * dvec[..., None]], axis=-1)
        rw_t = pl.pallas_call(
            kernel,
            grid=(b // bt, n // TJ),
            in_specs=[
                pl.BlockSpec((bt, d, n), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1, n), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, TJ, d + w1), lambda b, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e, TJ, n), lambda b, j: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, e, w1, n), lambda b, j: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, e, w1, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bt, e, w1, n), jnp.float32)],
            interpret=vt._interpret(),
        )(g_t, dvr_t, comb, blam)
        return jnp.swapaxes(rw_t, 2, 3)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, (N, D)), jnp.float32)
    blam = jnp.asarray(rng.uniform(-0.1, 0.1, (E, N, N)), jnp.float32)
    blam = 0.5 * (blam + jnp.swapaxes(blam, 1, 2))
    m2 = jnp.eye(D, dtype=jnp.float32) * 0.3

    def chain(variant, bt, length, u0, tj=TJ):
        def body(u, _):
            a = u[:, None, :] - x[None]
            g = jnp.einsum('bnd,dk->bnk', a, m2)
            q = jnp.sum(g * a, axis=-1)
            dv = jnp.exp(-0.125 * q)
            ao = jnp.concatenate([jnp.ones(a.shape[:-1] + (1,), a.dtype), a],
                                 axis=-1)
            rw = call_variant(variant, g, a, dv, ao, blam, bt, TJ=tj)
            t = jnp.sum(rw[..., 0], axis=-1)
            return u + 1e-4 * jnp.pad(t, ((0, 0), (0, D - E))), None

        u, _ = jax.lax.scan(body, u0, None, length=length)
        return u

    results = {'btile_default': BT}
    if os.environ.get('ABLATE_SET') == 'contenders':
        variants = [('full', BT, 128), ('full_tj256', 16, 256),
                    ('vpured', BT, 128), ('vpured_tj256', 16, 256)]
        n_rounds = 6
    else:
        variants = [('full', BT, 128), ('dott', BT, 128),
                    ('vpured', BT, 128),
                    ('vpured_tj256', 16, 256), ('full_tj256', 16, 256),
                    ('hwexp', BT, 128), ('noexp', BT, 128), ('nop', BT, 128),
                    ('nodots', BT, 128), ('nomul', BT, 128),
                    ('empty', BT, 128)]
        n_rounds = 3

    # Compile all first, then interleave timing rounds (tunnel latency noise
    # is ~10%; interleaving decorrelates it from the variant).
    fns = {}
    for name, bt, tj in variants:
        variant = name.split('_tj')[0].split('_bt')[0]
        for length in (24, 96):
            fn = jax.jit(functools.partial(chain, variant, bt, length, tj=tj))
            u0 = jnp.asarray(rng.uniform(-1, 1, (B, D)), jnp.float32)
            _ = np.asarray(fn(u0))
            fns[(name, length)] = fn

    times = {k: [] for k in fns}
    for _ in range(n_rounds):
        for key, fn in fns.items():
            u0 = jnp.asarray(rng.uniform(-1, 1, (B, D)), jnp.float32)
            jax.block_until_ready(u0)
            t0 = time.perf_counter()
            _ = np.asarray(fn(u0))
            times[key].append(time.perf_counter() - t0)

    for name, bt, tj in variants:
        us_per_call = (min(times[(name, 96)]) - min(times[(name, 24)])) \
            / (96 - 24) * 1e6
        results[name] = round(us_per_call, 1)
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(REPO, 'benchmarks', 'results', 'kernel_ablate.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()

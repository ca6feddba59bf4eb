"""Roofline / MFU artifact for the headline solve (VERDICT r4 item 4).

"Actually fast, or just correct?" — this script answers it with numbers:

1. Measures THIS chip's practical ceilings empirically (datasheet peaks are
   not verifiable through this environment's remote tunnel):
     - MXU: big bf16 matmul TFLOP/s,
     - VPU exp pipeline: chained exp throughput (Gexp/s), both the exact
       2-ulp polynomial (utils.accurate.exp_f32, the production kernel's
       chain exp) and the hardware approximation,
     - HBM: big-array copy bandwidth (GB/s).
2. Counts the per-solver-iteration work of the headline objective
   analytically (B=256, E=2, H=20, N=256 capacity, d=3) from the kernel
   contract (ops/pallas/variance_trace.py "rw formulation"):
     - chain exps per iteration:        B*E*H*N^2      (fwd only; the VJP
       reuses the kernel's rw residual — nothing N^2 is recomputed),
     - MXU flops per iteration:         B*E*H*2N^2(2d+1)   (p = g a^T and
       rw = w'(dv o AO); the backward is O(N d) einsums),
     - VPU non-exp chain flops:         ~2 * B*E*H*N^2  (blam multiply +
       dv scaling),
     - HBM bytes (lower bound):         per step: blam read E N^2 * 4,
       rw residual write+read B E N (1+d) * 4 * 2, prep tensors
       ~B E N (2d+1) * 4.
3. Measures the true per-iteration time (fixed-40-iteration lockstep solve,
   tol=0 — iter_cost_probe methodology) and reports utilization of each
   resource; the max is the binding resource.

Writes benchmarks/results/roofline.json; bench.py quotes the mfu/bound
fields.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = os.path.join(REPO, 'benchmarks', 'results')


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp

    from benchmarks.problems import make_headline_problem
    from benchmarks.provenance import provenance
    from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
    from gpmpc_tpu.mpc.cost import risk_sensitive_cost
    from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory_batched
    from gpmpc_tpu.parallel import batch as pbatch
    from gpmpc_tpu.utils.accurate import exp_f32

    rng = np.random.default_rng(5)

    def timed(fn, *args, n_rep=3):
        # Fresh first operand per rep (identical buffers can hit the axon
        # execution cache); outputs are scalar (ceiling kernels) or small
        # (the solve's u) so materializing costs ~nothing but forces
        # execution on the deferred backend.
        o = fn(*args)
        jax.block_until_ready(o)
        variants = [jnp.asarray(np.asarray(args[0])
                                * (1.0 + 1e-6 * (i + 1)), args[0].dtype)
                    for i in range(n_rep)]
        jax.block_until_ready(variants)
        reps = []
        for i in range(n_rep):
            t0 = time.perf_counter()
            o = fn(variants[i], *args[1:])
            _ = np.asarray(jax.tree.leaves(o)[0])
            reps.append(time.perf_counter() - t0)
        return min(reps)

    out = {'ceilings': {}, 'per_iter': {}, 'utilization': {}}

    # All ceiling kernels REDUCE to a scalar inside the jit: fetching a large
    # output through this environment's remote tunnel costs seconds and
    # otherwise dominates the measurement (the first cut of this script
    # "measured" 0.6 TFLOP/s — it was timing a 1 GiB host transfer).

    # ---- ceiling 1: MXU bf16 matmul ------------------------------------
    mm_n = 8192
    a = jnp.asarray(rng.normal(size=(mm_n, mm_n)), jnp.bfloat16)
    bmat = jnp.asarray(rng.normal(size=(mm_n, mm_n)), jnp.bfloat16)

    @jax.jit
    def mm(a, bmat):
        # 4 chained matmuls amortize dispatch; scalar output.
        x = a @ bmat
        x = x @ bmat
        x = x @ bmat
        x = x @ bmat
        return jnp.sum(x.astype(jnp.float32))

    t = timed(mm, a, bmat)
    mm_tflops = 4 * 2 * mm_n ** 3 / t / 1e12
    out['ceilings']['matmul_bf16_tflops'] = round(mm_tflops, 1)

    # ---- ceiling 2: exp pipelines. 16 chained exps per element (each
    # depends on the previous — not fusable away); XLA fuses chain + sum
    # into one pass, so HBM traffic is one read — compute-bound. -----------
    ex_shape = (4096, 4096)
    xin = jnp.asarray(rng.uniform(-1, 0, ex_shape), jnp.float32)

    def chain(fn):
        @jax.jit
        def run(x):
            acc = x
            for _ in range(16):
                acc = fn(acc * jnp.float32(-0.9) - jnp.float32(0.05))
            return jnp.sum(acc)
        return run

    n_exp = 16 * ex_shape[0] * ex_shape[1]
    t = timed(chain(exp_f32), xin)
    exp_exact_gexps = n_exp / t / 1e9
    t = timed(chain(jnp.exp), xin)
    exp_hw_gexps = n_exp / t / 1e9
    out['ceilings']['exp_exact_gexp_s'] = round(exp_exact_gexps, 1)
    out['ceilings']['exp_hw_gexp_s'] = round(exp_hw_gexps, 1)

    # ---- ceiling 3: HBM stream-read bandwidth: matvec reads the 1 GiB
    # operand once (2N^2 flops — trivially bandwidth-bound), tiny output. --
    big = jnp.asarray(rng.normal(size=(16384, 16384)), jnp.float32)  # 1 GiB
    ones = jnp.ones((16384,), jnp.float32)

    @jax.jit
    def mv(x, v):
        return jnp.sum(x @ v)

    t = timed(mv, big, ones)
    hbm_gbs = big.size * 4 / t / 1e9
    out['ceilings']['hbm_read_gb_s'] = round(hbm_gbs, 1)

    # ---- per-iteration analytic counts at the headline shape ------------
    b, horizon = 256, 20
    prob = make_headline_problem(b=b)
    n_cap = int(prob.gp.x.shape[0])
    e = int(prob.gp.beta.shape[0])
    d = int(prob.gp.x.shape[1])
    bhe = b * e * horizon
    n2 = n_cap * n_cap
    exps_per_iter = bhe * n2
    mxu_per_iter = bhe * 2 * n2 * (2 * d + 1)
    vpu_nonexp_per_iter = bhe * 2 * n2
    hbm_per_step = (e * n2 * 4                       # blam read
                    + b * e * n_cap * (1 + d) * 4 * 2  # rw write + bwd read
                    + b * e * n_cap * (2 * d + 1) * 4)  # prep tensors
    hbm_per_iter = horizon * hbm_per_step
    out['shape'] = {'B': b, 'E': e, 'H': horizon, 'N_capacity': n_cap, 'd': d}
    out['per_iter'] = {
        'chain_exps': exps_per_iter,
        'mxu_flops': mxu_per_iter,
        'vpu_nonexp_flops': vpu_nonexp_per_iter,
        'hbm_bytes_lower_bound': hbm_per_iter,
    }

    # ---- measured iteration time (fixed-iteration lockstep solve) -------
    cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
    params_axes = pbatch._params_axes(prob.params)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))
    solver = SolverConfig(max_iters=40, tol=0.0)

    @jax.jit
    def run40(x0s, u_init):
        def obj(u):
            m, c = rollout_batched(cache, x0s, u)
            return cost_b(prob.params, m, c, u)
        return solve_trajectory_batched(obj, u_init, prob.lb, prob.ub,
                                        solver).u

    u0 = jnp.zeros((b, horizon, prob.action_dim), jnp.float32)
    t = timed(run40, prob.x0s, u0)
    iter_s = t / 40
    out['per_iter']['iter_ms_measured'] = round(iter_s * 1e3, 3)

    # ---- utilization ----------------------------------------------------
    import gpmpc_tpu.ops.pallas.variance_trace as vt
    exp_ceiling = (exp_hw_gexps if vt._EXP_MODE == 'hw'
                   else exp_exact_gexps) * 1e9
    util = {
        'exp_pipe': exps_per_iter / iter_s / exp_ceiling,
        'mxu': mxu_per_iter / iter_s / (mm_tflops * 1e12),
        'hbm_read': hbm_per_iter / iter_s / (hbm_gbs * 1e9),
    }
    out['utilization'] = {k: round(v, 3) for k, v in util.items()}
    out['bound'] = max(util, key=util.get)
    out['exp_mode'] = vt._EXP_MODE
    out['note'] = (
        'utilization = analytic useful work per measured solver iteration / '
        'empirically measured ceiling on this chip; the max entry is the '
        'binding resource. Ceilings are practical (measured), not datasheet '
        'peaks. The iteration includes the O(B mem H da) L-BFGS two-loop and '
        'O(N d) mean-prop/cost work not counted as "useful" here, so the '
        'binding utilization understates true pipe occupancy.')
    out['provenance'] = provenance()

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, 'roofline.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()

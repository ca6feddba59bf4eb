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

    # Every ceiling is measured by DIFFERENCING two inner-repetition counts:
    # ceiling = extra work / (t(k2) - t(k1)). Per-dispatch overhead through
    # this environment's remote tunnel is ~30 ms and otherwise pollutes any
    # single measurement (the first two cuts of this script "measured"
    # 0.6 TFLOP/s / 10 Gexp/s — host-transfer resp. dispatch overhead).
    # All kernels reduce to a scalar inside jit.

    def slope(make_fn, work_per_k, args, k1=4, k2=16):
        t1 = timed(make_fn(k1), *args)
        t2 = timed(make_fn(k2), *args)
        return (k2 - k1) * work_per_k / max(t2 - t1, 1e-9)

    # ---- ceiling 1: MXU bf16 matmul (k chained matmuls) ------------------
    mm_n = 8192
    a = jnp.asarray(rng.normal(size=(mm_n, mm_n)), jnp.bfloat16)
    bmat = jnp.asarray(rng.normal(size=(mm_n, mm_n)) * 1e-2, jnp.bfloat16)

    def make_mm(k):
        @jax.jit
        def run(a, bmat):
            x = a
            for _ in range(k):
                x = x @ bmat
            return jnp.sum(x.astype(jnp.float32))
        return run

    mm_tflops = slope(make_mm, 2 * mm_n ** 3, (a, bmat)) / 1e12
    out['ceilings']['matmul_bf16_tflops'] = round(mm_tflops, 1)

    # ---- ceiling 2: exp pipelines (k chained exps per element; each
    # depends on the previous — not fusable away; one HBM read total) ------
    ex_shape = (4096, 4096)
    xin = jnp.asarray(rng.uniform(-1, 0, ex_shape), jnp.float32)

    # 8 INDEPENDENT accumulator streams per element: a single dependent
    # chain measures op LATENCY, not throughput (measured: 1-FMA chain gave
    # 327 Gops/s = ~3 cycles/op latency-bound; the production kernel's
    # elementwise work is across independent tile elements and pipelines
    # fully).
    def make_chain(fn):
        def make(k):
            @jax.jit
            def run(x):
                accs = [x * jnp.float32(1.0 + 0.01 * i) for i in range(8)]
                for _ in range(k // 8):
                    accs = [fn(a * jnp.float32(-0.9) - jnp.float32(0.05))
                            for a in accs]
                return sum(jnp.sum(a) for a in accs)
            return run
        return make

    n_el = ex_shape[0] * ex_shape[1]
    exp_exact_gexps = slope(make_chain(exp_f32), n_el, (xin,),
                            k1=16, k2=64) / 1e9
    # k large enough that the extra work clears dispatch noise.
    exp_hw_gexps = slope(make_chain(jnp.exp), n_el, (xin,),
                         k1=64, k2=512) / 1e9
    out['ceilings']['exp_exact_gexp_s'] = round(exp_exact_gexps, 1)
    out['ceilings']['exp_hw_gexp_s'] = round(exp_hw_gexps, 1)

    # ---- ceiling 2b: VPU elementwise FMA rate (the generic op ceiling the
    # kernel's non-exp chain work is measured against; hw exp turns out to
    # be ~10 cycles, so it cannot proxy the 1-op/cycle rate) ---------------
    def make_fma(k):
        @jax.jit
        def run(x):
            accs = [x * jnp.float32(1.0 + 0.01 * i) for i in range(8)]
            for _ in range(k // 8):
                accs = [a * jnp.float32(0.999) + x for a in accs]
            return sum(jnp.sum(a) for a in accs)
        return run

    vpu_fma_gops = slope(make_fma, n_el, (xin,), k1=256, k2=2048) / 1e9
    # The interleaved hw-exp chain measures ~1 op/lane/cycle (TPU exp is a
    # single-slot VPU op); it is the more robust generic-ops ceiling when
    # the FMA chain's slope is noise-limited (a near-zero slope reads as an
    # absurd rate — discard anything beyond 8 ops/cycle/lane ~ 8000 Gops).
    candidates = [g for g in (vpu_fma_gops, exp_hw_gexps) if g < 8000.0]
    vpu_ops_ceiling = max(candidates) if candidates else exp_hw_gexps
    out['ceilings']['vpu_fma_gops_s'] = round(vpu_fma_gops, 1)
    out['ceilings']['vpu_ops_ceiling_gops_s'] = round(vpu_ops_ceiling, 1)

    # ---- ceiling 3: HBM stream-read bandwidth: k dependent matvecs each
    # re-read the 1 GiB operand (2N^2 flops each — bandwidth-bound) --------
    big = jnp.asarray(rng.normal(size=(16384, 16384)), jnp.float32)  # 1 GiB
    ones = jnp.ones((16384,), jnp.float32)

    def make_mv(k):
        @jax.jit
        def run(x, v):
            acc = jnp.float32(0.0)
            vv = v
            for _ in range(k):
                r = x @ vv                       # full read of x
                acc = acc + r[0]
                vv = vv * (1.0 + acc * jnp.float32(1e-30))  # serialize reads
            return acc
        return run

    hbm_gbs = slope(make_mv, big.size * 4, (big, ones), k1=4, k2=12) / 1e9
    out['ceilings']['hbm_read_gb_s'] = round(hbm_gbs, 1)

    # ---- per-iteration analytic counts at the headline shape ------------
    # The headline GP is TIED (shared lengthscales, gp.config.tied_lambdas)
    # and dispatches the SYMMETRIC PAIR kernel (variance_trace.py
    # _rw_call_sym): the O(N^2) exp chain runs once per (scenario, step) —
    # not per output — over tile PAIRS i <= j, i.e. (nt+1)/(2nt) of the full
    # N^2 (nt = N/128 column tiles). Each chain element costs ~9 VPU
    # FMA-class ops (exp_f32's Cody-Waite degree-6 polynomial as Mosaic
    # lowers it) + ~3 chain mults (blam o exp o dv scaling).
    b, horizon = 256, 20
    prob = make_headline_problem(b=b)
    n_cap = int(prob.gp.x.shape[0])
    e = int(prob.gp.beta.shape[0])
    d = int(prob.gp.x.shape[1])
    n2 = n_cap * n_cap
    # PRODUCTION KERNEL (round-5 default): streamed column sweep, tied
    # chain, MXU W1 reduction (GPMPC_KERNEL_RED=mxu — the quality-paired
    # recipe's arithmetic; the measured-faster pure-VPU reduction is the
    # opt-in, see variance_trace._rw_call_tied). The full N^2 chain runs
    # once per (scenario, step), shared across outputs. The kernel ablation
    # (kernel_ablate.json) decomposes the call: the MXU reduction is the
    # largest component (~45%), exp ~15-20%, grid/DMA/control floor ~30%.
    exps_per_iter = b * horizon * n2                    # tied: E-independent
    # VPU ops per chain element: d outer-product FMAs (p) + ~12 exact-exp
    # polynomial ops + 1 scale, shared across outputs; per OUTPUT a blam
    # multiply.
    vpu_ops_per_iter = exps_per_iter * (d + 13) + e * exps_per_iter
    # MXU: the in-kernel W' @ AOD reductions (HIGHEST = 6 passes, counted
    # once as useful f32 MACs: 2 * W1 per element per output).
    mxu_per_iter = b * e * horizon * 2 * n2 * (1 + d)
    hbm_per_step = (e * n2 * 4                       # blam read
                    + b * e * n_cap * (1 + d) * 4 * 2  # rw write + bwd read
                    + b * e * n_cap * (2 * d + 1) * 4)  # prep tensors
    hbm_per_iter = horizon * hbm_per_step
    out['shape'] = {'B': b, 'E': e, 'H': horizon, 'N_capacity': n_cap, 'd': d,
                    'kernel': 'streamed column sweep, tied chain, '
                              'MXU W1 reduction (default)'}
    out['per_iter'] = {
        'chain_exps': exps_per_iter,
        'vpu_ops_est': vpu_ops_per_iter,
        'mxu_flops': mxu_per_iter,
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

    # ---- empirical iteration split: rerun the same 40-iteration solve with
    # the 1-op hardware exp in a subprocess (GPMPC_KERNEL_EXP is read at
    # import). The delta IS the exact-exp chain's share of the iteration —
    # no op-count model needed. (hw exp breaks solution quality — measured,
    # quality_ms_sweep.json prod_pf_hwexp — this is a measurement probe
    # only.)
    import subprocess
    probe = (
        "import sys, time, numpy as np\n"
        "sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir', %r)\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)\n"
        "import jax.numpy as jnp\n"
        "from benchmarks.problems import make_headline_problem\n"
        "from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched\n"
        "from gpmpc_tpu.mpc.cost import risk_sensitive_cost\n"
        "from gpmpc_tpu.mpc.solver import SolverConfig, "
        "solve_trajectory_batched\n"
        "from gpmpc_tpu.parallel import batch as pbatch\n"
        "prob = make_headline_problem(b=256)\n"
        "cache = build_rollout_cache(prob.gp, prob.state_dim, "
        "prob.action_dim)\n"
        "axes = pbatch._params_axes(prob.params)\n"
        "cost_b = jax.vmap(risk_sensitive_cost, in_axes=(axes, 0, 0, 0))\n"
        "solver = SolverConfig(max_iters=40, tol=0.0)\n"
        "@jax.jit\n"
        "def run40(x0s, u_init):\n"
        "    def obj(u):\n"
        "        m, c = rollout_batched(cache, x0s, u)\n"
        "        return cost_b(prob.params, m, c, u)\n"
        "    return solve_trajectory_batched(obj, u_init, prob.lb, prob.ub, "
        "solver).u\n"
        "u0 = jnp.zeros((256, 20, 1), jnp.float32)\n"
        "_ = np.asarray(run40(prob.x0s, u0))\n"
        "ts = []\n"
        "rng = np.random.default_rng(5)\n"
        "for _ in range(3):\n"
        "    x0f = jnp.asarray(rng.uniform(-1, 1, (256, 2)), jnp.float32)\n"
        "    x0f.block_until_ready()\n"
        "    t0 = time.perf_counter()\n"
        "    _ = np.asarray(run40(x0f, u0))\n"
        "    ts.append(time.perf_counter() - t0)\n"
        "print('HWEXP_MS', min(ts) / 40 * 1e3)\n"
    ) % (REPO, '/root/.cache/jax_gpmpc')
    env = dict(os.environ, GPMPC_KERNEL_EXP='hw')
    iter_hw_ms = None
    try:
        r = subprocess.run([sys.executable, '-c', probe], env=env,
                           capture_output=True, text=True, timeout=1800)
        for ln in r.stdout.splitlines():
            if ln.startswith('HWEXP_MS'):
                iter_hw_ms = float(ln.split()[1])
    except Exception:
        pass
    out['per_iter']['iter_ms_hw_exp'] = (round(iter_hw_ms, 3)
                                         if iter_hw_ms else None)
    if iter_hw_ms:
        out['per_iter']['exact_exp_chain_ms'] = round(
            out['per_iter']['iter_ms_measured'] - iter_hw_ms, 3)

    # ---- utilization ----------------------------------------------------
    import gpmpc_tpu.ops.pallas.variance_trace as vt
    # VPU accounting: the exp chain's share of the iteration is MEASURED
    # (exact-vs-hw A/B, model-free); the non-exp chain work (3 chain mults
    # shared + ~8 per-output tile ops per pair element) is counted at the
    # measured FMA rate. Their sum over the measured iteration time is the
    # VPU-occupancy estimate.
    nonexp_ops = exps_per_iter * (d + 1) + e * exps_per_iter
    nonexp_s = nonexp_ops / (vpu_ops_ceiling * 1e9)
    chain_s = (out['per_iter'].get('exact_exp_chain_ms') or 0.0) / 1e3
    out['per_iter']['nonexp_vpu_ms_est'] = round(nonexp_s * 1e3, 3)
    util = {
        'vpu_chain': (chain_s + nonexp_s) / iter_s,
        'mxu': mxu_per_iter / iter_s / (mm_tflops * 1e12),
        'hbm_read': hbm_per_iter / iter_s / (hbm_gbs * 1e9),
    }
    out['utilization'] = {k: round(v, 3) for k, v in util.items()}
    out['bound'] = max(util, key=util.get)
    out['exp_mode'] = vt._EXP_MODE
    out['note'] = (
        'utilization = analytic useful work per measured solver iteration / '
        'empirically measured ceiling on this chip (differenced '
        'microbenchmarks; matmul and HBM land within ~7% of v5e datasheet '
        'peaks). vpu_chain counts the streamed column-sweep kernel default '
        '(p outer products + exact exp + blam multiply; the W1 reduction '
        'rides the MXU); iter_ms_hw_exp gives the measured (model-free) '
        'split of the iteration into exp-chain vs everything else. The '
        'kernel ablation (kernel_ablate.json) additionally measured a '
        '~115 us/call grid/DMA/control floor — ~30% of each kernel call is '
        'not arithmetic at all, so the arithmetic utilizations understate '
        'true occupancy. Work outside the kernel (mean prop, small-chol '
        'cost, L-BFGS two-loop, bwd einsums, scan overhead) is also not '
        'counted as useful. exp_exact_gexp_s is the XLA-lowered '
        'polynomial chain — Mosaic lowers the same polynomial several times '
        'better in-kernel; it is recorded for context, not used as the '
        'ceiling.')
    out['provenance'] = provenance()

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, 'roofline.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()

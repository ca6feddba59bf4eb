"""Phase-level cost + convergence forensics of the production recipe at B=256
(round 5): where does prod_pf's 1.22 s actually go, what is the refine
iteration histogram (how much would lane retirement save), and how many lanes
does the shift gate admit at which margin.

Writes benchmarks/results/phase_probe.json.
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
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    b = 256
    prob = make_headline_problem(b=b)
    refine = SolverConfig(max_iters=60, tol=1e-4, noise_rel=3e-4,
                          progress_window=24)
    rng = np.random.default_rng(11)
    out = {}

    def timed(fn, n_rep=2, fetch=lambda o: np.asarray(o[0])):
        o = fn(prob.x0s)
        jax.block_until_ready(o)
        reps = []
        for _ in range(n_rep):
            x0f = jnp.asarray(rng.uniform(-1, 1, (b, 2)), jnp.float32)
            x0f.block_until_ready()
            t0 = time.perf_counter()
            o = fn(x0f)
            _ = fetch(o)
            reps.append(time.perf_counter() - t0)
        return min(reps), o

    ms_kw = dict(n_starts=8, prune_to=4)

    # 1. phase 0 only (basin selection; refine budget 1 iteration).
    f_p0 = jax.jit(lambda x0s: pbatch.solve_batch_multistart(
        prob.gp, prob.state_dim, prob.action_dim, x0s, prob.params,
        prob.horizon, prob.lb, prob.ub, refine.replace(max_iters=1),
        **ms_kw).u)
    t, _ = timed(f_p0)
    out['phase0_plus1_s'] = round(t, 3)

    # 2. phase 0 + refine(60), no shift — fetch iters/converged histograms.
    f_ref = jax.jit(lambda x0s: pbatch.solve_batch_multistart(
        prob.gp, prob.state_dim, prob.action_dim, x0s, prob.params,
        prob.horizon, prob.lb, prob.ub, refine, **ms_kw))
    t, res = timed(f_ref, fetch=lambda o: np.asarray(o.u))
    iters = np.asarray(res.iters)
    conv = np.asarray(res.converged)
    out['phase0_refine60_s'] = round(t, 3)
    out['refine_iters_hist'] = {
        'p50': float(np.percentile(iters, 50)),
        'p90': float(np.percentile(iters, 90)),
        'max': int(iters.max()),
        'n_at_cap': int(np.sum(iters >= 60)),
        'n_converged': int(conv.sum()),
        'n_le_36': int(np.sum(iters <= 36)),
        'n_le_48': int(np.sum(iters <= 48)),
    }

    # 3. full prod_pf (phase0 + refine + in-jit shift).
    f_full = jax.jit(lambda x0s: pbatch.solve_batch_multistart(
        prob.gp, prob.state_dim, prob.action_dim, x0s, prob.params,
        prob.horizon, prob.lb, prob.ub, refine,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_prune=2,
        shift_prune_frozen_iters=8, **ms_kw).u)
    t, _ = timed(f_full)
    out['prod_pf_full_s'] = round(t, 3)

    # 4. shift-gate admission curve: smoothed shift scores vs incumbent at
    # several margins (uses the retired driver's _shift_score program).
    u_inc = jnp.asarray(res.u)
    cost_inc = np.asarray(res.cost)
    u_sh, j_pre = pbatch._shift_score(
        prob.gp, prob.x0s, prob.params, u_inc,
        jnp.asarray(prob.lb, jnp.float32), jnp.asarray(prob.ub, jnp.float32),
        refine, prob.state_dim, prob.action_dim, False, (1, -1, 2, -2), 8)
    j_pre = np.asarray(j_pre)
    best_shift = np.min(j_pre[1:], axis=0)
    out['shift_gate'] = {}
    for margin in (0.0, 0.002, 0.005, 0.01, 0.02, 0.05):
        n = int(np.sum(best_shift < cost_inc + margin * (1 + np.abs(cost_inc))))
        out['shift_gate'][str(margin)] = n
    # How many lanes would a refined shift ACTUALLY improve by >0.1%/1%?
    improve = (cost_inc - best_shift) / (1.0 + np.abs(cost_inc))
    out['shift_smoothed_improve'] = {
        'n_gt0': int(np.sum(improve > 0)),
        'n_gt0.1pct': int(np.sum(improve > 0.001)),
        'n_gt1pct': int(np.sum(improve > 0.01)),
    }

    out['provenance'] = provenance()
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, 'phase_probe.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()

"""True per-iteration cost of the three objective tiers + batch-width scaling.

Per-dispatch overhead through this environment's remote-execution tunnel is
~30 ms — single-shot op timings (profile_parts.py) are overhead-dominated, so
each tier is measured as a WHOLE fixed-iteration lockstep solve (one dispatch,
max_iters iterations inside the while_loop) and differenced:

  full    — production objective (moment-matched mean + variance trace)
  frozen  — frozen-covariance surrogate (mean prop at a fixed cov sequence)
  mean    — mean-only surrogate (variance floor, basin structure only)

Writes benchmarks/results/iter_cost.json with per-iteration ms per tier and a
plain-solve batch-width sweep (the honest single-chip scaling curve,
VERDICT r3 item 8).
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

    rng = np.random.default_rng(3)
    out = {}

    def timed(fn, *args, n_rep=3):
        o = fn(*args)
        jax.block_until_ready(o)
        reps = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            o = fn(*args)
            _ = np.asarray(jax.tree.leaves(o)[0])
            reps.append(time.perf_counter() - t0)
        return min(reps)

    # --- tier cost at B=256, fixed 40 iterations (no early termination:
    # tol=0 keeps every lane live so iteration count is exactly max_iters) ---
    b = 256
    prob = make_headline_problem(b=b)
    cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
    params_axes = pbatch._params_axes(prob.params)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))
    solver = SolverConfig(max_iters=40, tol=0.0)
    u0 = jnp.zeros((b, prob.horizon, prob.action_dim), jnp.float32)

    def make_solver(mode):
        @jax.jit
        def run(x0s, u_init):
            if mode == 'frozen':
                _, covs = rollout_batched(cache, x0s, u_init)
                fro = jax.lax.stop_gradient(
                    jnp.diagonal(covs, axis1=2, axis2=3))

                def obj(u):
                    m, c = rollout_batched(cache, x0s, u,
                                           frozen_cov_diag=fro)
                    return cost_b(prob.params, m, c, u)
            elif mode == 'mean':
                def obj(u):
                    m, c = rollout_batched(cache, x0s, u, mean_only=True)
                    return cost_b(prob.params, m, c, u)
            else:
                def obj(u):
                    m, c = rollout_batched(cache, x0s, u)
                    return cost_b(prob.params, m, c, u)
            return solve_trajectory_batched(obj, u_init, prob.lb, prob.ub,
                                            solver).u
        return run

    for mode in ('full', 'frozen', 'mean'):
        t = timed(make_solver(mode), prob.x0s, u0)
        out[f'solve40_{mode}_ms'] = round(t * 1e3, 1)
        out[f'iter_{mode}_ms'] = round(t * 1e3 / 40, 3)
        print(mode, round(t * 1e3, 1), 'ms', flush=True)

    # --- batch-width sweep of the full solve (fixed 40 iters) ---
    sweep = {}
    for bw in (64, 128, 256, 512, 1024, 2048):
        probw = make_headline_problem(b=bw)
        cachew = build_rollout_cache(probw.gp, probw.state_dim,
                                     probw.action_dim)
        axesw = pbatch._params_axes(probw.params)
        costw = jax.vmap(risk_sensitive_cost, in_axes=(axesw, 0, 0, 0))

        @jax.jit
        def runw(x0s, u_init):
            def obj(u):
                m, c = rollout_batched(cachew, x0s, u)
                return costw(probw.params, m, c, u)
            return solve_trajectory_batched(obj, u_init, probw.lb, probw.ub,
                                            solver).u

        u0w = jnp.zeros((bw, probw.horizon, probw.action_dim), jnp.float32)
        t = timed(runw, probw.x0s, u0w)
        sweep[str(bw)] = {'ms': round(t * 1e3, 1),
                          'solves_per_s_at_40it': round(bw / t, 1)}
        print('B', bw, round(t * 1e3, 1), 'ms =', round(bw / t, 1),
              'solves/s @40it', flush=True)
    out['batch_sweep_full40'] = sweep
    out['provenance'] = provenance()

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, 'iter_cost.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()

"""Solution-quality regression harness (VERDICT r1 item 5).

Measures the production f32 fixed-budget solve against a high-budget f64
reference solve on the SAME headline workload (benchmarks/problems.py), so
every throughput change in bench.py runs behind a quality guard.

Protocol: both solvers minimize the identical objective; both solutions are
then re-evaluated under the f64 objective, and the per-scenario relative cost
excess  (J64(u_f32) - J64(u_f64)) / (1 + |J64(u_f64)|)  is reported at
p50/p90/max, along with the control-trajectory MAE. A NEGATIVE excess means
the f32 solve found a better basin than the reference budget did.

Run: python benchmarks/quality.py [--b 64] [--iters 40 25 20] — prints one
JSON line per budget and writes benchmarks/results/quality.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(b: int = 64, iters_list=(40, 25, 20), seed: int = 0):
    import jax
    jax.config.update('jax_platforms', 'cpu')       # f64 reference needs CPU
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.mpc.cost import risk_sensitive_cost
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
    from gpmpc_tpu.parallel import batch as pbatch

    # f64 problem is the ground-truth instance; the f32 problem is its cast.
    prob64 = make_headline_problem(b=b, dtype=jnp.float64, seed=seed)
    prob32 = make_headline_problem(b=b, dtype=jnp.float32, seed=seed)

    cache64 = build_rollout_cache(prob64.gp, prob64.state_dim,
                                  prob64.action_dim)
    params_axes = pbatch._params_axes(prob64.params, b)
    cost_b64 = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    @jax.jit
    def j64(u):                                  # (B, H, da) f64 -> (B,)
        means, covs = rollout_batched(cache64, prob64.x0s, u)
        return cost_b64(prob64.params, means, covs, u)

    # High-budget f64 reference solve.
    ref_solver = SolverConfig(method='lbfgs', max_iters=600, tol=1e-9)
    res_ref = pbatch.solve_batch(prob64.gp, prob64.state_dim,
                                 prob64.action_dim, prob64.x0s, prob64.params,
                                 prob64.horizon, prob64.lb, prob64.ub,
                                 ref_solver)
    u_ref = jnp.asarray(res_ref.u, jnp.float64)
    c_ref = np.asarray(j64(u_ref))

    results = {}
    for iters in iters_list:
        solver = SolverConfig(method='lbfgs', max_iters=iters, tol=1e-4)
        res32 = pbatch.solve_batch(prob32.gp, prob32.state_dim,
                                   prob32.action_dim, prob32.x0s,
                                   prob32.params, prob32.horizon,
                                   prob32.lb, prob32.ub, solver)
        u32 = jnp.asarray(np.asarray(res32.u), jnp.float64)
        c32 = np.asarray(j64(u32))
        excess = (c32 - c_ref) / (1.0 + np.abs(c_ref))
        mae = np.mean(np.abs(np.asarray(res32.u, np.float64)
                             - np.asarray(u_ref)), axis=(1, 2))
        results[f'it{iters}'] = {
            'excess_p50': float(np.percentile(excess, 50)),
            'excess_p90': float(np.percentile(excess, 90)),
            'excess_max': float(np.max(excess)),
            'ctrl_mae_p50': float(np.percentile(mae, 50)),
            'ctrl_mae_p90': float(np.percentile(mae, 90)),
        }
        print(json.dumps({f'it{iters}': results[f'it{iters}']}))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=64)
    ap.add_argument('--iters', type=int, nargs='+', default=[40, 30, 25, 20])
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()
    results = measure(b=args.b, iters_list=tuple(args.iters), seed=args.seed)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'results')
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'quality.json'), 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()

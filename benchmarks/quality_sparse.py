"""Quality pairing for the SPARSE (FITC) headline numbers (VERDICT r4 item 5):
suite config 3b (cartpole N=1000 through M=128 FITC, 2332 solves/s) and
config 4 (M=128 FITC, full cross-output covariance, H=50, 1201 solves/s) were
throughput-only. This harness gives each a cost-excess-vs-f64-reference
sidecar, exactly like the exact-GP headline:

  A (CPU subprocess, f64): same workload (backend-independent numpy data,
    benchmarks/problems.py), 600-iteration tol-1e-9 reference solve.
  B (this process, TPU): the suite's production solve (plain 40-iter
    lockstep — the configuration whose throughput the suite quotes).
  C (CPU subprocess, f64): score both control sets under the f64 objective.

The reference optimum here is the f64 solve of the SAME FITC posterior (the
reference codebase has no sparse GP — the quality bar is repo-internal by
necessity, but the harness/tolerances mirror the exact-GP pairing).

Writes benchmarks/results/quality_sparse.json; suite.py quotes it.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = os.path.join(REPO, 'benchmarks', 'results')

WORKLOADS = {
    '3b_sparse_cartpole': dict(maker='make_sparse_cartpole_problem',
                               b=256, full_cov=False),
    '4_sparse_fullcov': dict(maker='make_sparse_fullcov_problem',
                             b=64, full_cov=True),
}

_PHASE_A = r'''
import sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
sys.path.insert(0, sys.argv[1])
maker = sys.argv[2]; b = int(sys.argv[3]); full_cov = sys.argv[4] == '1'
out = sys.argv[5]
import benchmarks.problems as problems
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch
prob = getattr(problems, maker)(b=b, dtype=jnp.float64)
res = pbatch.solve_batch(prob.gp, prob.state_dim, prob.action_dim, prob.x0s,
                         prob.params, prob.horizon, prob.lb, prob.ub,
                         SolverConfig(method='lbfgs', max_iters=600, tol=1e-9),
                         full_cov=full_cov)
np.savez(out, u_ref=np.asarray(res.u, np.float64))
print('ref saved')
'''

_PHASE_C = r'''
import json, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
sys.path.insert(0, sys.argv[1])
maker = sys.argv[2]; b = int(sys.argv[3]); full_cov = sys.argv[4] == '1'
ref_path = sys.argv[5]; u_path = sys.argv[6]
import benchmarks.problems as problems
from gpmpc_tpu.mpc.cost import risk_sensitive_cost
from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
from gpmpc_tpu.parallel import batch as pbatch
prob = getattr(problems, maker)(b=b, dtype=jnp.float64)
cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
params_axes = pbatch._params_axes(prob.params, b)
cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

@jax.jit
def j64(u):
    means, covs = rollout_batched(cache, prob.x0s, u, full_cov=full_cov)
    return cost_b(prob.params, means, covs, u)

c_ref = np.asarray(j64(jnp.asarray(np.load(ref_path)['u_ref'], jnp.float64)))
c = np.asarray(j64(jnp.asarray(np.load(u_path)['u'], jnp.float64)))
ex = (c - c_ref) / (1.0 + np.abs(c_ref))
print('RESULT ' + json.dumps({
    'excess_p50': float(np.percentile(ex, 50)),
    'excess_p90': float(np.percentile(ex, 90)),
    'excess_max': float(np.max(ex)),
    'n_gt1pct': int(np.sum(ex > 0.01))}))
'''


def _cpu_env():
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', type=str, default='',
                    help='comma-separated workload subset')
    args = ap.parse_args()
    only = [w for w in args.only.split(',') if w]

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp
    import benchmarks.problems as problems
    from benchmarks.provenance import provenance
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    os.makedirs(RESULTS, exist_ok=True)
    out_rows = {}
    out_path = os.path.join(RESULTS, 'quality_sparse.json')
    if os.path.exists(out_path):
        with open(out_path) as f:
            out_rows.update(json.load(f))
    for name, wl in WORKLOADS.items():
        if only and name not in only:
            continue
        ref_path = os.path.join(RESULTS, f'quality_sparse_ref_{name}.npz')
        if not os.path.exists(ref_path):
            print(f'phase A ({name}): f64 reference (CPU subprocess)...',
                  flush=True)
            subprocess.run(
                [sys.executable, '-c', _PHASE_A, REPO, wl['maker'],
                 str(wl['b']), '1' if wl['full_cov'] else '0', ref_path],
                env=_cpu_env(), check=True, timeout=5400)

        prob = getattr(problems, wl['maker'])(b=wl['b'], dtype=jnp.float32)
        solver = SolverConfig(max_iters=40, tol=1e-4)   # the suite's solve
        fn = jax.jit(lambda x0s, prob=prob, fc=wl['full_cov']:
                     pbatch.solve_batch(prob.gp, prob.state_dim,
                                        prob.action_dim, x0s, prob.params,
                                        prob.horizon, prob.lb, prob.ub,
                                        solver, full_cov=fc).u)
        u = fn(prob.x0s)
        u.block_until_ready()
        t0 = time.perf_counter()
        u = fn(prob.x0s + 0.0)
        u_np = np.asarray(u, np.float64)
        dt_s = time.perf_counter() - t0
        u_path = os.path.join(RESULTS, f'quality_sparse_u_{name}.npz')
        np.savez(u_path, u=u_np)

        out = subprocess.run(
            [sys.executable, '-c', _PHASE_C, REPO, wl['maker'],
             str(wl['b']), '1' if wl['full_cov'] else '0', ref_path, u_path],
            env=_cpu_env(), capture_output=True, text=True, timeout=5400)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith('RESULT ')]
        if not line:
            print(f'phase C failed ({name}):', out.stderr[-2000:])
            sys.exit(1)
        row = json.loads(line[-1][len('RESULT '):])
        row.update({'b': wl['b'], 'solve_s': round(dt_s, 3),
                    'solves_per_s': round(wl['b'] / dt_s, 1)})
        out_rows[name] = row
        print(name, json.dumps(row), flush=True)

    out_rows['provenance'] = provenance()
    with open(os.path.join(RESULTS, 'quality_sparse.json'), 'w') as f:
        json.dump(out_rows, f, indent=1)
    print(json.dumps(out_rows, indent=1))


if __name__ == '__main__':
    main()

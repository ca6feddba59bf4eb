"""On-hardware solution-quality harness (VERDICT r2 weak #5): measures the
PRODUCTION solve — Pallas kernels, bf16x3 dots, f32 hot path, the exact
bench.py configuration — against the f64 reference optimum.

Round 2 measured quality only on CPU (forced jax_platforms=cpu), where the
Pallas kernels never execute; this harness closes that gap. Three phases:

  A (CPU subprocess, f64): build the headline problem, run the 600-iteration
    tol-1e-9 reference solve, cache u_ref to results/quality_ref_b{B}.npz.
  B (this process, default backend = TPU): the production solve
    (solve_batch_multistart at the bench operating point), kernels in the
    loop; u32 fetched to host.
  C (CPU subprocess, f64): evaluate both control sets under the f64
    objective; write per-budget excess percentiles to
    results/quality_tpu.json.

Run: python benchmarks/quality_tpu.py [--b 64] [--starts 4] [--iters 60]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = os.path.join(REPO, 'benchmarks', 'results')

_PHASE_A = r'''
import sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
sys.path.insert(0, sys.argv[1])
b = int(sys.argv[2]); out = sys.argv[3]
from benchmarks.problems import make_headline_problem
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch
prob = make_headline_problem(b=b, dtype=jnp.float64)
res = pbatch.solve_batch(prob.gp, prob.state_dim, prob.action_dim, prob.x0s,
                         prob.params, prob.horizon, prob.lb, prob.ub,
                         SolverConfig(method='lbfgs', max_iters=600, tol=1e-9))
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
b = int(sys.argv[2]); ref_path = sys.argv[3]; u_path = sys.argv[4]
from benchmarks.problems import make_headline_problem
from gpmpc_tpu.mpc.cost import risk_sensitive_cost
from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
from gpmpc_tpu.parallel import batch as pbatch
prob = make_headline_problem(b=b, dtype=jnp.float64)
cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
params_axes = pbatch._params_axes(prob.params, b)
cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

@jax.jit
def j64(u):
    means, covs = rollout_batched(cache, prob.x0s, u)
    return cost_b(prob.params, means, covs, u)

u_ref = jnp.asarray(np.load(ref_path)['u_ref'], jnp.float64)
c_ref = np.asarray(j64(u_ref))
u32 = jnp.asarray(np.load(u_path)['u'], jnp.float64)
c32 = np.asarray(j64(u32))
excess = (c32 - c_ref) / (1.0 + np.abs(c_ref))
mae = np.mean(np.abs(np.asarray(u32) - np.asarray(u_ref)), axis=(1, 2))
print('RESULT ' + json.dumps({
    'excess_p50': float(np.percentile(excess, 50)),
    'excess_p90': float(np.percentile(excess, 90)),
    'excess_max': float(np.max(excess)),
    'ctrl_mae_p50': float(np.percentile(mae, 50)),
    'n_gt1pct': int(np.sum(excess > 0.01)),
}))
'''


def _cpu_env():
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=64)
    ap.add_argument('--starts', type=int, default=4)
    ap.add_argument('--iters', type=int, default=60)
    ap.add_argument('--noise-rel', type=float, default=3e-3)
    ap.add_argument('--progress-window', type=int, default=12)
    args = ap.parse_args()
    os.makedirs(RESULTS, exist_ok=True)
    ref_path = os.path.join(RESULTS, f'quality_ref_b{args.b}.npz')

    if not os.path.exists(ref_path):
        print('phase A: computing f64 reference (CPU subprocess)...')
        subprocess.run([sys.executable, '-c', _PHASE_A, REPO, str(args.b),
                        ref_path], env=_cpu_env(), check=True, timeout=5400)

    # Phase B — production solve on the default backend (TPU when present).
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    # No x64 here: the f64 GP fit runs host-side (gp/state._factorize_host_f64)
    # because the Mosaic kernels reject x64-promoted index types.
    import jax.numpy as jnp
    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    prob = make_headline_problem(b=args.b, dtype=jnp.float32)
    solver = SolverConfig(max_iters=args.iters, tol=1e-4,
                          noise_rel=args.noise_rel,
                          progress_window=args.progress_window)
    res = pbatch.solve_batch_multistart(
        prob.gp, prob.state_dim, prob.action_dim, prob.x0s, prob.params,
        prob.horizon, prob.lb, prob.ub, solver, n_starts=args.starts)
    u_path = os.path.join(RESULTS, f'quality_tpu_u_b{args.b}.npz')
    np.savez(u_path, u=np.asarray(res.u, np.float64))
    backend = jax.default_backend()
    print(f'phase B done on backend={backend}')

    out = subprocess.run([sys.executable, '-c', _PHASE_C, REPO, str(args.b),
                          ref_path, u_path], env=_cpu_env(),
                         capture_output=True, text=True, timeout=5400)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('RESULT ')]
    if not line:
        print('phase C failed:', out.stderr[-2000:])
        sys.exit(1)
    result = json.loads(line[-1][len('RESULT '):])
    result.update({'backend': backend, 'b': args.b, 'n_starts': args.starts,
                   'refine_iters': args.iters, 'noise_rel': args.noise_rel,
                   'progress_window': args.progress_window})
    with open(os.path.join(RESULTS, 'quality_tpu.json'), 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()

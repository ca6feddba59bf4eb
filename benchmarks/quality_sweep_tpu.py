"""On-TPU quality-vs-budget sweep (round 3): the PRODUCTION solve_batch at
several iteration budgets / solver modes, scored under the f64 CPU objective
against the cached 600-iteration f64 reference (quality_ref_b{B}.npz from
quality_tpu.py phase A). All prior quality-vs-budget data was measured before
the kernel-prep precision fix (commit 9c86057) and is stale.

Writes benchmarks/results/quality_sweep_tpu.json.
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

_EVAL = r'''
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

c_ref = np.asarray(j64(jnp.asarray(np.load(ref_path)['u_ref'], jnp.float64)))
out = {}
data = np.load(u_path)
for name in data.files:
    c = np.asarray(j64(jnp.asarray(data[name], jnp.float64)))
    ex = (c - c_ref) / (1.0 + np.abs(c_ref))
    out[name] = {'excess_p50': float(np.percentile(ex, 50)),
                 'excess_p90': float(np.percentile(ex, 90)),
                 'excess_max': float(np.max(ex)),
                 'n_gt1pct': int(np.sum(ex > 0.01))}
print('RESULT ' + json.dumps(out))
'''


def _cpu_env():
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def main():
    b = 64
    ref_path = os.path.join(RESULTS, f'quality_ref_b{b}.npz')
    assert os.path.exists(ref_path), 'run quality_tpu.py phase A first'

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp
    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    prob = make_headline_problem(b=b, dtype=jnp.float32)
    candidates = {
        'it40': SolverConfig(max_iters=40, tol=1e-4),
        'it80': SolverConfig(max_iters=80, tol=1e-4),
        'it160': SolverConfig(max_iters=160, tol=1e-4),
        'it300': SolverConfig(max_iters=300, tol=1e-4),
        'it300_noise': SolverConfig(max_iters=300, tol=1e-4, noise_rel=3e-4,
                                    progress_window=24),
    }
    uu, times = {}, {}
    for name, solver in candidates.items():
        fn = jax.jit(lambda x0s, s=solver: pbatch.solve_batch(
            prob.gp, prob.state_dim, prob.action_dim, x0s, prob.params,
            prob.horizon, prob.lb, prob.ub, s).u)
        u = fn(prob.x0s)
        u.block_until_ready()
        t0 = time.perf_counter()
        u = fn(prob.x0s + 0.0)
        uu[name] = np.asarray(u, np.float64)
        times[name] = time.perf_counter() - t0
        print(name, 'solved in', round(times[name], 3), 's')
    u_path = os.path.join(RESULTS, 'quality_sweep_u.npz')
    np.savez(u_path, **uu)

    out = subprocess.run([sys.executable, '-c', _EVAL, REPO, str(b),
                          ref_path, u_path], env=_cpu_env(),
                         capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('RESULT ')]
    if not line:
        print('eval failed:', out.stderr[-2000:])
        sys.exit(1)
    res = json.loads(line[-1][len('RESULT '):])
    for name in res:
        res[name]['solve_s'] = round(times[name], 3)
    with open(os.path.join(RESULTS, 'quality_sweep_tpu.json'), 'w') as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()

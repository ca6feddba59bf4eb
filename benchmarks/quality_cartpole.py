"""Recipe-generalization quality check: the production multistart+shift
recipe (bench.py's prod_pf configuration, tuned entirely on the pendulum
headline workload) measured on the CARTPOLE workload (4-D state, true
step_physics data, gamma sweep, H=10) against a fresh f64 600-iteration
reference.

Phases mirror quality_tpu.py: (A) f64 CPU reference solve, cached; (B) the
production f32 TPU solve; (C) f64 CPU scoring of both control sets.

Writes benchmarks/results/quality_cartpole.json.
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

_PHASE_A = r'''
import sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
sys.path.insert(0, sys.argv[1])
b = int(sys.argv[2]); out = sys.argv[3]
from benchmarks.problems import make_cartpole_problem
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch
prob = make_cartpole_problem(b=b, dtype=jnp.float64)
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
from benchmarks.problems import make_cartpole_problem
from gpmpc_tpu.mpc.cost import risk_sensitive_cost
from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
from gpmpc_tpu.parallel import batch as pbatch
prob = make_cartpole_problem(b=b, dtype=jnp.float64)
cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
axes = pbatch._params_axes(prob.params)
cost_b = jax.vmap(risk_sensitive_cost, in_axes=(axes, 0, 0, 0))

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
    b = 32
    ref_path = os.path.join(RESULTS, f'quality_cartpole_ref_b{b}.npz')
    if not os.path.exists(ref_path):
        print('phase A: f64 reference (CPU subprocess)...', flush=True)
        subprocess.run([sys.executable, '-c', _PHASE_A, REPO, str(b),
                        ref_path], env=_cpu_env(), check=True, timeout=5400)

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp
    from benchmarks.problems import make_cartpole_problem
    from benchmarks.provenance import provenance
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    prob = make_cartpole_problem(b=b, dtype=jnp.float32)
    # bench.py's prod_pf configuration, verbatim.
    refine = SolverConfig(max_iters=60, tol=1e-4, noise_rel=3e-4,
                          progress_window=24)
    recipe = dict(n_starts=8, prune_to=4, shift_set=(1, -1, 2, -2),
                  shift_iters=32, shift_prune=2, shift_prune_frozen_iters=8)

    fn = jax.jit(lambda x0s: pbatch.solve_batch_multistart(
        prob.gp, prob.state_dim, prob.action_dim, x0s, prob.params,
        prob.horizon, prob.lb, prob.ub, refine, **recipe).u)
    u = fn(prob.x0s)
    u.block_until_ready()
    t0 = time.perf_counter()
    u = fn(prob.x0s + 0.0)
    u_np = np.asarray(u, np.float64)
    dt = time.perf_counter() - t0

    plain = jax.jit(lambda x0s: pbatch.solve_batch(
        prob.gp, prob.state_dim, prob.action_dim, x0s, prob.params,
        prob.horizon, prob.lb, prob.ub,
        SolverConfig(max_iters=40, tol=1e-4)).u)
    up = plain(prob.x0s)
    up.block_until_ready()
    up = np.asarray(plain(prob.x0s + 0.0), np.float64)

    u_path = os.path.join(RESULTS, 'quality_cartpole_u.npz')
    np.savez(u_path, prod_pf=u_np, plain_it40=up)

    out = subprocess.run([sys.executable, '-c', _PHASE_C, REPO, str(b),
                          ref_path, u_path], env=_cpu_env(),
                         capture_output=True, text=True, timeout=5400)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('RESULT ')]
    if not line:
        print('phase C failed:', out.stderr[-2000:])
        sys.exit(1)
    res = json.loads(line[-1][len('RESULT '):])
    res['prod_pf']['solve_s_b32'] = round(dt, 3)
    res['workload'] = ('cartpole 4D, N=200 (cap 256), H=10, gamma sweep '
                       '[-0.5, 0.5], force bounds +-1; recipe = bench.py '
                       'prod_pf, UNTUNED for this workload')
    res['provenance'] = provenance()
    with open(os.path.join(RESULTS, 'quality_cartpole.json'), 'w') as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()

"""Multistart recipe sweep on TPU (round 4): find the solve_batch_multistart
configuration that reaches p90 cost excess < 1% vs the 600-iteration f64
reference, and record its wall time so bench.py can adopt the quality-bearing
operating point (VERDICT r3 next-round item 1).

Each configuration runs the PRODUCTION solve (Pallas kernels, f32, TPU) at
B=64 against the cached f64 reference (quality_ref_b64.npz); controls are
scored under the f64 CPU objective in a subprocess. Wall time is measured at
B=64 AND at the bench batch B=256 (fresh-input + host-fetch hygiene, see
bench.py) so quality and throughput come from the same artifact.

Writes benchmarks/results/quality_ms_sweep.json.
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
    b_bench = 256
    ref_path = os.path.join(RESULTS, f'quality_ref_b{b}.npz')
    assert os.path.exists(ref_path), 'run quality_tpu.py phase A first'

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp
    from benchmarks.problems import make_headline_problem
    from benchmarks.provenance import provenance
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    prob = make_headline_problem(b=b, dtype=jnp.float32)
    prob_bench = make_headline_problem(b=b_bench, dtype=jnp.float32)

    refine_a = SolverConfig(max_iters=60, tol=1e-4, noise_rel=3e-4,
                            progress_window=24)
    refine_b = SolverConfig(max_iters=120, tol=1e-4, noise_rel=3e-4,
                            progress_window=24)
    refine_f = SolverConfig(max_iters=40, tol=1e-4, noise_rel=3e-4,
                            progress_window=20)
    # (name, n_starts, refine, extra multistart kwargs). The shift_set
    # time-shift phase is the round-4 tail fix (see solve_batch_multistart).
    refine_48 = SolverConfig(max_iters=48, tol=1e-4, noise_rel=3e-4,
                             progress_window=20)
    import gpmpc_tpu.ops.pallas.variance_trace as _vt
    suffix = '_hwexp' if _vt._EXP_MODE == 'hw' else ''
    configs = [
        ('prod_pf' + suffix, 8, refine_a,
         {'shift_set': (1, -1, 2, -2), 'shift_iters': 32, 'shift_prune': 2,
          'shift_prune_frozen_iters': 8, 'prune_to': 4}),
    ]
    rng = np.random.default_rng(7)
    uu, times64, times256 = {}, {}, {}
    for name, k, refine, kw in configs:
        def run(probx, x0s, k=k, refine=refine, kw=kw, probref=None):
            return pbatch.solve_batch_multistart(
                probx.gp, probx.state_dim, probx.action_dim, x0s,
                probx.params, probx.horizon, probx.lb, probx.ub, refine,
                n_starts=k, **kw).u

        fn64 = jax.jit(lambda x0s, k=k, refine=refine, kw=kw:
                       pbatch.solve_batch_multistart(
                           prob.gp, prob.state_dim, prob.action_dim, x0s,
                           prob.params, prob.horizon, prob.lb, prob.ub,
                           refine, n_starts=k, **kw).u)
        u = fn64(prob.x0s)
        u.block_until_ready()
        t0 = time.perf_counter()
        u = fn64(prob.x0s + 0.0)
        uu[name] = np.asarray(u, np.float64)
        times64[name] = time.perf_counter() - t0

        fn256 = jax.jit(lambda x0s, k=k, refine=refine, kw=kw:
                        pbatch.solve_batch_multistart(
                            prob_bench.gp, prob_bench.state_dim,
                            prob_bench.action_dim, x0s, prob_bench.params,
                            prob_bench.horizon, prob_bench.lb, prob_bench.ub,
                            refine, n_starts=k, **kw).u)
        u2 = fn256(prob_bench.x0s)
        u2.block_until_ready()
        reps = []
        for _ in range(2):
            x0f = jnp.asarray(rng.uniform(-1, 1, (b_bench, 2)), jnp.float32)
            x0f.block_until_ready()
            t0 = time.perf_counter()
            u2 = fn256(x0f)
            _ = np.asarray(u2[:, 0])
            reps.append(time.perf_counter() - t0)
        times256[name] = min(reps)
        print(name, 'b64', round(times64[name], 3), 's; b256',
              round(times256[name], 3), 's =',
              round(b_bench / times256[name], 1), 'solves/s', flush=True)

    u_path = os.path.join(RESULTS, 'quality_ms_sweep_u.npz')
    np.savez(u_path, **uu)

    out = subprocess.run([sys.executable, '-c', _EVAL, REPO, str(b),
                          ref_path, u_path], env=_cpu_env(),
                         capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('RESULT ')]
    if not line:
        print('eval failed:', out.stderr[-2000:])
        sys.exit(1)
    res = json.loads(line[-1][len('RESULT '):])
    prov = provenance()
    for name in res:
        res[name]['solve_s_b64'] = round(times64[name], 3)
        res[name]['solve_s_b256'] = round(times256[name], 3)
        res[name]['solves_per_s_b256'] = round(256 / times256[name], 1)
        res[name]['commit'] = prov['commit']
    # MERGE into the existing artifact: the file accumulates the recipe
    # frontier across sweep runs (per-entry commit records which code
    # measured each row); same-named configs are updated in place.
    out_path = os.path.join(RESULTS, 'quality_ms_sweep.json')
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(res)
    merged['provenance'] = prov
    with open(out_path, 'w') as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged, indent=1))


if __name__ == '__main__':
    main()

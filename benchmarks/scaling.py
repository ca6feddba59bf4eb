"""Scaling-efficiency harness (BASELINE north_star: solves/s at 1 chip /
1 host / >=2 hosts with >=80% efficiency).

This machine exposes ONE real TPU chip, so true multi-device scaling cannot
be measured here. Virtual CPU devices share the same physical cores, which
makes naive weak scaling meaningless (it measures core contention). What IS
measurable and transferable is the framework's SHARDING OVERHEAD: at a fixed
total batch, the sharded program (shard_map over n virtual devices) runs the
same total compute on the same cores as the unsharded one — any slowdown is
partitioning/dispatch overhead introduced by the sharding machinery, the
quantity that would eat scaling efficiency on real hardware. The DP fan-out
itself has zero collectives by construction, so on real chips the efficiency
ceiling is (1 - overhead).

Each configuration runs in a fresh subprocess (device count is fixed at
backend init). Writes benchmarks/results/SCALING_r02.json.

The multi-PROCESS execution path (jax.distributed.initialize, 2 OS
processes) is exercised by tests/test_multiprocess.py.

Run: python benchmarks/scaling.py [--b 64] [--devices 1 2 4 8]
"""

import argparse
import json
import os
import subprocess
import sys

_WORKER = r'''
import json, os, sys, time
import numpy as np
n_dev = int(sys.argv[1]); b = int(sys.argv[2])
os.environ['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n_dev}'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
sys.path.insert(0, sys.argv[3])
from benchmarks.problems import make_headline_problem
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch, mesh as pmesh

prob = make_headline_problem(b=b, dtype=jnp.float32)
solver = SolverConfig(method='lbfgs', max_iters=15, tol=1e-4)

if n_dev == 1:
    @jax.jit
    def run(x0s):
        return pbatch.solve_batch(prob.gp, prob.state_dim, prob.action_dim,
                                  x0s, prob.params, prob.horizon,
                                  prob.lb, prob.ub, solver).cost
else:
    mesh = pmesh.make_mesh()

    @jax.jit
    def run(x0s):
        return pbatch.solve_batch_sharded(mesh, prob.gp, prob.state_dim,
                                          prob.action_dim, x0s, prob.params,
                                          prob.horizon, prob.lb, prob.ub,
                                          solver).cost

rng = np.random.default_rng(0)
_ = np.asarray(run(prob.x0s))
ts = []
for _i in range(3):
    x0s = jnp.asarray(rng.uniform(-1, 1, (b, prob.state_dim)), jnp.float32)
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    out = run(x0s)
    _ = np.asarray(out)
    ts.append(time.perf_counter() - t0)
print(json.dumps({"n_dev": n_dev, "b": b, "t_ms": round(min(ts) * 1e3, 2)}))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=64)
    ap.add_argument('--devices', type=int, nargs='+', default=[1, 2, 4, 8])
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    rows = []
    for n in args.devices:
        env = dict(os.environ)
        env.pop('JAX_PLATFORMS', None)
        env['PALLAS_AXON_POOL_IPS'] = ''
        out = subprocess.run(
            [sys.executable, '-c', _WORKER, str(n), str(args.b), repo],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
        if not line:
            print(f'n_dev={n} FAILED:\n{out.stderr[-2000:]}')
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1])

    if rows and rows[0]['n_dev'] == 1:
        t1 = rows[0]['t_ms']
        for r in rows:
            # fixed total work on fixed cores: sharding overhead is any
            # slowdown vs the unsharded program
            r['overhead_vs_unsharded'] = round(r['t_ms'] / t1 - 1.0, 3)
        out_path = os.path.join(repo, 'benchmarks', 'results',
                                'SCALING_r02.json')
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, 'w') as f:
            json.dump({'mode': f'fixed total batch {args.b} on shared CPU '
                               'cores; overhead_vs_unsharded isolates the '
                               'sharding machinery cost (DP efficiency '
                               'ceiling on real chips = 1 - overhead)',
                       'rows': rows}, f, indent=1)
        print(json.dumps(rows, indent=1))


if __name__ == '__main__':
    main()

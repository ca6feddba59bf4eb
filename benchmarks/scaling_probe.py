"""One-off probe: solve time vs batch size and iteration budget, to locate
the throughput ceiling (dispatch overhead vs per-iter compute vs batch
saturation). Slope over max_iters isolates per-iteration cost from the
remote-dispatch constant; slope over B shows whether the chip is saturated.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp

    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    out = {}
    for b, iters in [(256, 40), (256, 20), (1024, 40), (1024, 20)]:
        prob = make_headline_problem(b=b, dtype=dtype)
        solver = SolverConfig(method='lbfgs', max_iters=iters, tol=1e-4)

        @jax.jit
        def run(gp, x0s, params):
            res = pbatch.solve_batch(gp, prob.state_dim, prob.action_dim,
                                     x0s, params, prob.horizon,
                                     prob.lb, prob.ub, solver)
            return res.u, res.cost

        u, c = run(prob.gp, prob.x0s, prob.params)
        _ = np.asarray(c)
        times = []
        for _ in range(3):
            x0s_k = jnp.asarray(rng.uniform(-1, 1, (b, prob.state_dim)), dtype)
            jax.block_until_ready(x0s_k)
            t0 = time.perf_counter()
            u, c = run(prob.gp, x0s_k, prob.params)
            _ = np.asarray(c)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        out[f'b{b}_it{iters}'] = round(dt * 1e3, 2)
        out[f'b{b}_it{iters}_solves_per_s'] = round(b / dt, 1)
        print(json.dumps(out))

    # derived: per-iteration slope and dispatch constant at each batch size
    for b in (256, 1024):
        t40, t20 = out[f'b{b}_it40'], out[f'b{b}_it20']
        out[f'b{b}_ms_per_iter'] = round((t40 - t20) / 20.0, 3)
        out[f'b{b}_overhead_ms'] = round(t20 - 20 * (t40 - t20) / 20.0, 2)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()

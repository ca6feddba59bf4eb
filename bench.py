"""Headline benchmark: concurrent GP-MPC solves/s on one chip.

Workload (BASELINE.json north star / config 1-3 scale): B independent
risk-sensitive GP-MPC trajectory optimizations against a shared exact-GP
dynamics posterior — pendulum dimensions (ds=2, da=1), N=200 training points
(capacity 256), horizon H=20, projected L-BFGS with a 40-iteration cap and the
reference's 1e-4 first-order tolerance (mpc.py:313-320 runs IPOPT at tol 1e-4,
max 300 iterations). Solution quality at this budget is tracked by
benchmarks/quality.py against a 600-iteration f64 reference (recorded in
benchmarks/results/quality.json): p50 relative cost excess ~3.5% at 40
iterations; the residual gap is iteration count, not precision or basins
(f64 at the same budget is equally far off, and the solver at the
reference's own budget semantics — 300 iterations, tol 1e-4 — reaches the
strong reference exactly).

Prints ONE JSON line:
  {"metric": "gpmpc_solves_per_s_per_chip", "value": N, "unit": "solves/s",
   "vs_baseline": r}
vs_baseline is the ratio against the BASELINE.json target of 1000 concurrent
solves/s per host (the reference publishes no absolute numbers — SURVEY.md §6).
"""

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: the solve program takes minutes to compile
    # through this environment's remote-compile tunnel; cache hits make
    # repeated bench runs start in seconds.
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

    import jax.numpy as jnp

    from benchmarks.problems import (BASELINE_TARGET_SOLVES_PER_S,
                                     make_headline_problem)
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    dtype = jnp.float32
    b = 256
    prob = make_headline_problem(b=b, dtype=dtype)
    gp, ds, da = prob.gp, prob.state_dim, prob.action_dim
    x0s, params, horizon = prob.x0s, prob.params, prob.horizon
    solver = SolverConfig(method='lbfgs', max_iters=40, tol=1e-4)

    rng = np.random.default_rng(0)

    @jax.jit
    def run(gp, x0s, params):
        res = pbatch.solve_batch(gp, ds, da, x0s, params, horizon,
                                 prob.lb, prob.ub, solver)
        return res.u, res.cost

    u, c = run(gp, x0s, params)
    _ = np.asarray(c)                      # compile + warmup

    # Measurement hygiene for this environment's remote-execution backend:
    # (a) fresh inputs per repetition — identical argument buffers hit an
    #     execution cache; (b) a HOST FETCH inside the timed region —
    #     execution is deferred until results are materialized, so
    #     block_until_ready alone measures only dispatch.
    n_rep = 3
    batches = [jnp.asarray(rng.uniform(-1, 1, (b, ds)), dtype)
               for _ in range(n_rep)]
    jax.block_until_ready(batches)
    times = []
    cs = []
    for x0s_k in batches:
        t0 = time.perf_counter()
        u, c = run(gp, x0s_k, params)
        cs.append(np.asarray(c))           # forces execution + fetch (~1 KB)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    assert all(np.all(np.isfinite(ck)) for ck in cs), "non-finite solve costs"
    solves_per_s = b / dt
    print(json.dumps({
        "metric": "gpmpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_TARGET_SOLVES_PER_S, 3),
    }))


if __name__ == '__main__':
    main()

"""Headline benchmark: QUALITY-PAIRED concurrent GP-MPC solves/s on one chip.

Workload (BASELINE.json north star / config 1-3 scale): B = 256 independent
risk-sensitive GP-MPC trajectory optimizations against a shared exact-GP
dynamics posterior — pendulum dimensions (ds=2, da=1), N=200 training points
(capacity 256), horizon H=20, gamma sweep.

The measured solve is the PRODUCTION QUALITY RECIPE
(parallel.batch.solve_batch_multistart: 8 wide starts -> frozen-surrogate
basin selection with top-4 pruning -> full-objective scoring -> noise-
tolerant L-BFGS refinement -> time-shift tail correction), i.e. the
configuration whose controls match the f64 600-iteration reference:
round-4 on-TPU artifact benchmarks/results/quality_ms_sweep.json measures
p50/p90 cost excess vs that reference for THIS configuration at B=64 —
the quality sidecar below quotes it. The north star is a conjunction
("controls match the reference IPOPT solution within tolerance ... with
>=1000 concurrent solves/s"), so quality and throughput are quoted for the
SAME operating point (VERDICT r3 item 1); the plain 40-iteration descent the
earlier rounds benchmarked (775 solves/s but p90 cost excess ~36% — a speed
point, not a solution) is reported as a secondary field.

Prints ONE JSON line:
  {"metric": "gpmpc_quality_solves_per_s_per_chip", "value": N,
   "unit": "solves/s", "vs_baseline": r, "quality": {...}, "fast_point": {...}}
vs_baseline is the ratio against the BASELINE.json target of 1000 concurrent
solves/s per host (the reference publishes no absolute numbers — SURVEY.md §6;
its own stack measures p50 ~88 s PER SOLVE on this workload,
benchmarks/results/ref_anchor.json — this bench is ~4 orders of magnitude
faster per solve at reference-matching quality).
"""

import json
import os
import time

import numpy as np


# The production quality operating point (benchmarks/quality_ms_sweep.py
# config of the same name — keep in sync with the artifact). Round-4
# frontier: p50 excess ~0, p90 0.81% vs the f64 reference at 207.8 solves/s
# (prod16_pf gives p90 0.46% at 137/s; the unpruned prod 0.34% at 122/s).
RECIPE_NAME = 'prod_pf'
RECIPE = dict(n_starts=8, prune_to=4, shift_set=(1, -1, 2, -2),
              shift_iters=32, shift_prune=2, shift_prune_frozen_iters=8)
REFINE = dict(max_iters=60, tol=1e-4, noise_rel=3e-4, progress_window=24)


def _quality_sidecar():
    """Quote the committed on-TPU quality artifact for RECIPE_NAME."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'benchmarks', 'results', 'quality_ms_sweep.json')
    try:
        with open(path) as f:
            art = json.load(f)
        q = art[RECIPE_NAME]
        return {
            'excess_p50_vs_f64ref': q['excess_p50'],
            'excess_p90_vs_f64ref': q['excess_p90'],
            'n_gt1pct_of_64': q['n_gt1pct'],
            'artifact': 'benchmarks/results/quality_ms_sweep.json',
            # per-entry commit (the code that measured THIS row), not the
            # merged file's last-writer provenance
            'artifact_commit': q.get(
                'commit', art.get('provenance', {}).get('commit')),
        }
    except Exception as e:                       # pragma: no cover
        return {'error': f'quality artifact unavailable: {e}'}


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
    params, horizon = prob.params, prob.horizon
    refine = SolverConfig(method='lbfgs', **REFINE)
    fast_solver = SolverConfig(method='lbfgs', max_iters=40, tol=1e-4)

    rng = np.random.default_rng(0)

    @jax.jit
    def run_quality(x0s):
        res = pbatch.solve_batch_multistart(
            gp, ds, da, x0s, params, horizon, prob.lb, prob.ub, refine,
            **RECIPE)
        return res.u, res.cost

    @jax.jit
    def run_fast(x0s):
        res = pbatch.solve_batch(gp, ds, da, x0s, params, horizon,
                                 prob.lb, prob.ub, fast_solver)
        return res.u, res.cost

    def measure(run, n_rep=3):
        # Measurement hygiene for this environment's remote-execution
        # backend: (a) fresh inputs per repetition — identical argument
        # buffers hit an execution cache; (b) a HOST FETCH inside the timed
        # region — execution is deferred until results are materialized, so
        # block_until_ready alone measures only dispatch.
        u, c = run(prob.x0s)
        _ = np.asarray(c)                        # compile + warmup
        batches = [jnp.asarray(rng.uniform(-1, 1, (b, ds)), dtype)
                   for _ in range(n_rep)]
        jax.block_until_ready(batches)
        times, cs = [], []
        for x0s_k in batches:
            t0 = time.perf_counter()
            u, c = run(x0s_k)
            cs.append(np.asarray(c))             # forces execution + fetch
            times.append(time.perf_counter() - t0)
        assert all(np.all(np.isfinite(ck)) for ck in cs), "non-finite costs"
        return b / min(times)

    quality_sps = measure(run_quality)
    fast_sps = measure(run_fast)

    print(json.dumps({
        "metric": "gpmpc_quality_solves_per_s_per_chip",
        "value": round(quality_sps, 2),
        "unit": "solves/s",
        "vs_baseline": round(quality_sps / BASELINE_TARGET_SOLVES_PER_S, 3),
        "quality": _quality_sidecar(),
        "fast_point": {
            "solves_per_s": round(fast_sps, 2),
            "note": "plain 40-iter descent (rounds 1-3 headline); p90 cost "
                    "excess ~36% vs f64 ref (quality_sweep_tpu.json) - a "
                    "speed point, not a solution",
        },
    }))


if __name__ == '__main__':
    main()

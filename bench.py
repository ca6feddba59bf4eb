"""Headline benchmark: QUALITY-PAIRED concurrent GP-MPC solves/s on one chip.

Workload (BASELINE.json north star / config 1-3 scale): B = 256 independent
risk-sensitive GP-MPC trajectory optimizations against a shared exact-GP
dynamics posterior — pendulum dimensions (ds=2, da=1), N=200 training points
(capacity 256), horizon H=20, gamma sweep.

The measured solve is the round-5 PRODUCTION RECIPE
(parallel.batch.solve_batch_multistart_retired): frozen-surrogate basin
selection -> full-width noise-tolerant refinement -> gain-ranked
NEIGHBOR-EXCHANGE rounds (time-shift + neighbor-incumbent + smoothed
proposals, seam-smoothed scoring, gated chunked refinement) -> pg-ranked
final polish. Quality and throughput are quoted for the SAME B=256 operating
point against the 600-iteration f64 reference
(benchmarks/results/quality_retired.json + quality_ref_b256.npz) — round 4
quoted B=64 quality against B=256 throughput (advisor r4, low); measured at
B=256 the round-4 recipe's tail was 34 lanes >1% (p90 1.45%), which this
recipe cuts to 17 with max excess 3.3% (p90 0.58%). The quality_max_point
sidecar quotes ret_r5m2 (prefilter pregate + neighborhood-outlier rescue,
3 exchange rounds): p90 0.35%, n>1% 12/256, max 2.9% at 71.4 solves/s — the
residual tail is
basin-search-limited (QUALITY_NOTES_r05.md; the per-lane ensemble floor
across diverse configs is ~8 lanes).

Also quoted: the roofline sidecar (benchmarks/results/roofline.json —
measured ceilings, the exact-exp chain's measured share of the solver
iteration, binding resource) and the plain 40-iteration descent as a
speed-only point.

Prints ONE JSON line:
  {"metric": "gpmpc_quality_solves_per_s_per_chip", "value": N,
   "unit": "solves/s", "vs_baseline": r, "quality": {...}, "roofline": {...},
   "fast_point": {...}}
vs_baseline is the ratio against BASELINE.json's target of 1000 concurrent
solves/s per host (the reference publishes no absolute numbers — SURVEY.md
§6; its own stack measures ~1.2 s PER CALLBACK / minutes per solve on this
workload where it does not NaN outright, benchmarks/results/ref_anchor.json).
"""

import json
import os
import subprocess
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# The production operating point (benchmarks/quality_retired.py config of the
# same name — keep in sync with the artifact): the round-5a exchange recipe
# (legacy full-width smoothed scoring, pregate=False) — measured the best
# solves/s at p90 < 1% (112.9 at p90 0.58%). The QUALITY-MAX sidecar quotes
# ret_r5m2 (prefilter pregate + neighbor-incumbent rescue, 3 exchange
# rounds: p90 0.35%, n>1% 12/256, max 2.9% at 71.4 solves/s — the lowest
# tail measured; ret_r5m3 reaches p90 0.19% / n 12 at 63).
RECIPE_NAME = 'ret_prod_nopre'
RECIPE = dict(n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
              shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
              shift_smooth_iters=8, shift_margin=0.005,
              shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
              neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
              polish_lanes=64, polish_iters=96, pregate=False)
QUALITY_MAX_NAME = 'ret_r5m2'
REFINE = dict(max_iters=60, tol=1e-4, noise_rel=3e-4, progress_window=24)


def _stale_paths(artifact_commit):
    """Library paths changed since the quality artifact's commit — a non-empty
    list means the artifact may not describe current code (advisor r4, low:
    fail loud instead of quoting silently stale quality)."""
    try:
        out = subprocess.run(
            ['git', 'diff', '--name-only', f'{artifact_commit}..HEAD',
             '--', 'gpmpc_tpu/'],
            cwd=REPO, capture_output=True, text=True, timeout=10)
        return [p for p in out.stdout.split() if p]
    except Exception:
        return ['<git unavailable>']


def _quality_sidecar(name=None):
    """Quote the committed on-TPU B=256 quality artifact for RECIPE_NAME."""
    path = os.path.join(REPO, 'benchmarks', 'results', 'quality_retired.json')
    try:
        with open(path) as f:
            art = json.load(f)
        q = art[name or RECIPE_NAME]
        side = {
            'excess_p50_vs_f64ref': q['excess_p50'],
            'excess_p90_vs_f64ref': q['excess_p90'],
            'excess_max_vs_f64ref': q['excess_max'],
            'n_gt1pct_of_256': q['n_gt1pct'],
            'b': q.get('b', 256),
            'artifact': 'benchmarks/results/quality_retired.json',
            'artifact_commit': q.get('commit'),
        }
        stale = _stale_paths(q.get('commit'))
        if stale:
            side['stale_vs_head'] = stale[:8]
            side['stale_note'] = ('library files changed since the artifact '
                                  'was measured — regenerate via '
                                  'benchmarks/quality_retired.py')
        return side
    except Exception as e:                       # pragma: no cover
        return {'error': f'quality artifact unavailable: {e}'}


def _roofline_sidecar():
    path = os.path.join(REPO, 'benchmarks', 'results', 'roofline.json')
    try:
        with open(path) as f:
            r = json.load(f)
        return {
            'bound': r['bound'],
            'iter_ms': r['per_iter']['iter_ms_measured'],
            'exact_exp_chain_ms': r['per_iter'].get('exact_exp_chain_ms'),
            'utilization': r['utilization'],
            'ceilings': r['ceilings'],
            'artifact': 'benchmarks/results/roofline.json',
        }
    except Exception as e:                       # pragma: no cover
        return {'error': f'roofline artifact unavailable: {e}'}


def main():
    import jax

    # Persistent compilation cache: the solve programs take minutes to compile
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

    def run_quality(x0s):
        res = pbatch.solve_batch_multistart_retired(
            gp, ds, da, x0s, params, horizon, prob.lb, prob.ub, refine,
            **RECIPE)
        return np.asarray(res.u), np.asarray(res.cost)

    fast_jit = jax.jit(lambda x0s: pbatch.solve_batch(
        gp, ds, da, x0s, params, horizon, prob.lb, prob.ub, fast_solver).cost)

    def run_fast(x0s):
        return None, np.asarray(fast_jit(x0s))

    def measure(run, n_rep=3):
        # Measurement hygiene for this environment's remote-execution
        # backend: fresh inputs per repetition (identical argument buffers
        # hit an execution cache) and host fetches inside the timed region
        # (execution is deferred until results materialize).
        _, c = run(prob.x0s)                     # compile + warmup
        batches = [jnp.asarray(rng.uniform(-1, 1, (b, ds)), dtype)
                   for _ in range(n_rep)]
        jax.block_until_ready(batches)
        times = []
        for x0s_k in batches:
            t0 = time.perf_counter()
            _, c = run(x0s_k)
            times.append(time.perf_counter() - t0)
            assert np.all(np.isfinite(c)), "non-finite costs"
        return b / min(times)

    quality_sps = measure(run_quality)
    fast_sps = measure(run_fast)

    print(json.dumps({
        "metric": "gpmpc_quality_solves_per_s_per_chip",
        "value": round(quality_sps, 2),
        "unit": "solves/s",
        "vs_baseline": round(quality_sps / BASELINE_TARGET_SOLVES_PER_S, 3),
        "quality": _quality_sidecar(),
        "roofline": _roofline_sidecar(),
        "quality_max_point": {
            **_quality_sidecar(QUALITY_MAX_NAME),
            "solves_per_s_artifact": _artifact_sps(QUALITY_MAX_NAME),
            "note": "ret_r5m2: prefilter pregate + neighbor-incumbent "
                    "rescue, 3 exchange rounds - the lowest "
                    "measured B=256 tail",
        },
        "fast_point": {
            "solves_per_s": round(fast_sps, 2),
            "note": "plain 40-iter descent; p90 cost excess ~36% vs f64 ref "
                    "(quality_sweep_tpu.json) - a speed point, not a "
                    "solution; GPMPC_KERNEL_RED=vpu raises this +22% "
                    "(946 solves/s, iter_cost.json@5f2dd98) at the quality "
                    "cost documented in QUALITY_NOTES_r05.md section 6",
        },
    }))


def _artifact_sps(name):
    path = os.path.join(REPO, 'benchmarks', 'results', 'quality_retired.json')
    try:
        with open(path) as f:
            return json.load(f)[name].get('solves_per_s')
    except Exception:                            # pragma: no cover
        return None


if __name__ == '__main__':
    main()

"""Round-5 sweep: the RETIRED multistart recipe (converged-lane retirement +
gated shift refinement, parallel.batch.solve_batch_multistart_retired) vs the
round-4 in-jit recipe (prod_pf), BOTH measured at the bench batch B=256 with
quality evaluated at B=256 against the 600-iteration f64 reference
(benchmarks/results/quality_ref_b256.npz) — closing VERDICT r4 items 1+2
(quality and throughput at the SAME B=256 operating point; previous rounds
measured quality only at B=64).

Writes benchmarks/results/quality_retired.json (merged across runs; per-entry
commit provenance).

Run on the TPU: python benchmarks/quality_retired.py [--configs name1,name2]
"""

import argparse
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
                 'n_gt1pct': int(np.sum(ex > 0.01)),
                 'n_gt2pct': int(np.sum(ex > 0.02))}
print('RESULT ' + json.dumps(out))
'''


def _cpu_env():
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    return env


# Shared refine budget semantics (the bench RECIPE's solver).
REFINE = dict(max_iters=60, tol=1e-4, noise_rel=3e-4, progress_window=24)

# name -> (kind, kwargs[, refine_overrides]).  kind 'injit' =
# solve_batch_multistart (round-4 recipe), 'retired' =
# solve_batch_multistart_retired (round-5 recipe).
#
# Phase forensics (benchmarks/results/phase_probe.json, B=256 on TPU):
# phase0 0.22 s, +refine60 0.652 s, +in-jit shift 1.221 s; the shift gate is
# BINARY — exactly 51/256 lanes have a smoothed shift beating their incumbent
# (margin-insensitive 0 -> 1%), 50 of them by >1% — so gating the shift
# refinement to the admitted set removes ~80% of the shift phase's cost.
# 167/256 lanes hit the refine cap (still descending), so lane retirement
# inside the refine phase does NOT pay; budget1 = max_iters skips the tail.
CONFIGS = {
    # Round-4 production point, now at B=256 quality (was B=64 only).
    'prod_pf_b256': ('injit', dict(
        n_starts=8, prune_to=4, shift_set=(1, -1, 2, -2), shift_iters=32,
        shift_prune=2, shift_prune_frozen_iters=8)),
    # The retirement composition at matched budgets (round-5 first cut:
    # SLOWER — budget1 24 <= progress_window 24 retires nothing and 5%
    # margin admitted 162 lanes; kept for the record).
    'ret_b24_m05': ('retired', dict(
        n_starts=8, prune_to=4, budget1=24, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.05)),
    # GATED-SHIFT design from the probe: full-width refine (no tail), shift
    # refinement only for admitted lanes, one wide dispatch.
    'ret_gated': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64)),
    # + trimmed phase 0 (2 frozen rounds instead of 3).
    'ret_gated_f2': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        frozen_rounds=2,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64)),
    # + refine budget 48 (the freed shift budget may cover the quality).
    'ret_gated_r48': ('retired', dict(
        n_starts=8, prune_to=4, budget1=48, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64), dict(max_iters=48)),
    # + second shift round (iterate-until-dry on the tail fix).
    'ret_gated_s2': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2)),
    # FROZEN-HEAVY refine: most of the descent on the 1/9-cost frozen
    # objective (2 rounds x 24 iters, cov refreshed per round), 24 full
    # polish iterations, gated shift.
    'ret_gated_fz24': ('retired', dict(
        n_starts=8, prune_to=4, budget1=24, tail_divisor=4,
        frozen_rounds=2, refine_frozen_rounds=2, refine_frozen_iters=24,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64), dict(max_iters=24)),
    'ret_gated_fz32': ('retired', dict(
        n_starts=8, prune_to=4, budget1=32, tail_divisor=4,
        frozen_rounds=2, refine_frozen_rounds=2, refine_frozen_iters=24,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64), dict(max_iters=32)),
    # NEIGHBOR EXCHANGE (round-5 basin fix): propose (x0, gamma)-neighbor
    # incumbents alongside the shifts; 2 rounds propagate found basins.
    'ret_nb4': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, neighbor_set=4)),
    # + jittered-zero starts (descent-path diversity toward the f64
    # reference's cold-start basin family).
    'ret_nb4_z': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        n_zero_starts=3,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, neighbor_set=4)),
    # Quality-max probe: 8 neighbors, 3 propagation rounds.
    'ret_nb8_s3': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, neighbor_set=8)),
    # Changed-lane-filtered exchange + shifted neighbors (the churn fix):
    # fast point and max point.
    'ret_nbf': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=24, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, neighbor_set=4,
        neighbor_shifted=1)),
    'ret_nbmax': ('retired', dict(
        n_starts=16, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2, 3, -3, 4, -4), shift_iters=32, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, neighbor_set=8,
        neighbor_shifted=2)),
    # Gain-ranked per-round cap: the tail (percent-scale predicted gains)
    # repairs first at a fixed per-round cost.
    'ret_nbx': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2, 4, -4), shift_iters=24, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=8, neighbor_shifted=1)),
    'ret_nbx_r48': ('retired', dict(
        n_starts=8, prune_to=4, budget1=48, tail_divisor=4,
        shift_set=(1, -1, 2, -2, 4, -4), shift_iters=24, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=8, neighbor_shifted=1), dict(max_iters=48)),
    # Round-5 production candidate: exchange with smoothed proposals + LONG
    # winner refinement (f32 valley descent is slow — measured via warm f64
    # refine closing 6/14 tail lanes) + pg-ranked final polish.
    'ret_prod': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96)),
    # Speed-trimmed variants of ret_prod.
    'ret_prod2': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=40, shift_top=2,
        shift_smooth_iters=5, shift_margin=0.002,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=48,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=48, polish_iters=80)),
    'ret_prod3': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=40, shift_top=2,
        shift_smooth_iters=5, shift_margin=0.002,
        shift_lanes_per_chunk=64, shift_rounds=1, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=48, polish_iters=80)),
    # ---- round-5b: VPU-reduction kernel + frozen pre-gate + tail rescue ----
    # ret_prod re-measured under the new kernel + pregate gives the fresh
    # baseline; _r adds the neighborhood-outlier rescue (basin-floor attack);
    # _rx is the quality-max point (wider rescue + 3 rounds).
    'ret_prod_r': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96,
        rescue_lanes=24, rescue_starts=6, rescue_iters=48)),
    'ret_prod_rx': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2, 3, -3), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=8, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96,
        rescue_lanes=32, rescue_starts=8, rescue_iters=60)),
    # Kernel-isolation control: ret_prod with the legacy full-width exchange
    # (pregate off) — separates the VPU-reduction kernel's quality effect
    # from the pre-gate's.
    'ret_prod_nopre': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, pregate=False)),
    # ---- round-5c: production candidates under the VPU kernel. The kernel
    # is numerically equivalent to the MXU path (p50 rel err vs f64 8.8e-6
    # vs 7.8e-6 on the real blam) but the changed arithmetic reshuffles
    # basin outcomes; these configs lean on the strengthened rescue
    # (neighbor-incumbent starts) + exchange rounds for robust tail repair.
    'ret_r5b_a': ('retired', dict(     # legacy exchange + strong rescue
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, pregate=False,
        rescue_lanes=32, rescue_starts=6, rescue_iters=60)),
    'ret_r5b_b': ('retired', dict(     # prefilter-6 pregate + strong rescue
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, prefilter=6,
        rescue_lanes=32, rescue_starts=6, rescue_iters=60)),
    'ret_r5b_c': ('retired', dict(     # quality-max: 3 rounds, 8 neighbors
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2, 3, -3), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=8, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, prefilter=6,
        rescue_lanes=32, rescue_starts=8, rescue_iters=60)),
    # Round-5 FINAL production candidate (restored mxu kernel arithmetic):
    # ret_prod + prefilter pregate + neighbor-incumbent rescue.
    'ret_r5m': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, prefilter=6,
        rescue_lanes=32, rescue_starts=6, rescue_iters=60)),
    # Quality-max probes on the final production family (mxu arithmetic).
    'ret_r5m2': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, prefilter=6,
        rescue_lanes=32, rescue_starts=6, rescue_iters=60)),
    'ret_r5m3': ('retired', dict(
        n_starts=8, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=96, prefilter=6,
        rescue_lanes=48, rescue_starts=10, rescue_iters=60)),
    # Final production tuning: start diversity (12 starts incl. 3 jittered
    # zeros — the descent-path diversity measured to recover cold-start-family
    # basins) + wider, deeper polish (the 1-2%% residual band is the VALLEY
    # class that warm refinement closes).
    'ret_r5c_d': ('retired', dict(
        n_starts=12, n_zero_starts=3, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=96, polish_iters=128, pregate=False,
        rescue_lanes=32, rescue_starts=6, rescue_iters=60)),
    'ret_r5c_e': ('retired', dict(
        n_starts=12, n_zero_starts=3, prune_to=4, budget1=60, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=48, shift_top=2,
        shift_smooth_iters=8, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=3, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=96, polish_iters=128, prefilter=6,
        rescue_lanes=32, rescue_starts=6, rescue_iters=60)),
    # Speed point: trimmed refine + single exchange round + light polish +
    # small rescue.
    'ret_fast_r': ('retired', dict(
        n_starts=8, prune_to=4, budget1=48, tail_divisor=4,
        shift_set=(1, -1, 2, -2), shift_iters=40, shift_top=2,
        shift_smooth_iters=6, shift_margin=0.005,
        shift_lanes_per_chunk=64, shift_rounds=2, shift_max_lanes=64,
        neighbor_set=6, neighbor_shifted=1, propose_smoothed=True,
        polish_lanes=64, polish_iters=64,
        rescue_lanes=16, rescue_starts=6, rescue_iters=40),
        dict(max_iters=48)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=256)
    ap.add_argument('--configs', type=str, default='')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--skip-eval', action='store_true')
    args = ap.parse_args()
    b = args.b
    names = ([n for n in args.configs.split(',') if n] or list(CONFIGS))
    ref_path = os.path.join(RESULTS, f'quality_ref_b{b}.npz')

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp
    from benchmarks.problems import make_headline_problem
    from benchmarks.provenance import provenance
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    prob = make_headline_problem(b=b, dtype=jnp.float32)
    refine = SolverConfig(**REFINE)
    rng = np.random.default_rng(7)

    uu, rows = {}, {}
    for name in names:
        cfg = CONFIGS[name]
        kind, kw = cfg[0], cfg[1]
        refine_c = refine.replace(**cfg[2]) if len(cfg) > 2 else refine
        diag = {}

        if kind == 'injit':
            fn = jax.jit(lambda x0s, refine_c=refine_c, kw=kw:
                         pbatch.solve_batch_multistart(
                             prob.gp, prob.state_dim, prob.action_dim, x0s,
                             prob.params, prob.horizon, prob.lb, prob.ub,
                             refine_c, **kw).u)

            def run(x0s, fn=fn):
                return np.asarray(fn(x0s))
        else:
            def run(x0s, kw=kw, diag=diag, refine_c=refine_c):
                res = pbatch.solve_batch_multistart_retired(
                    prob.gp, prob.state_dim, prob.action_dim, x0s,
                    prob.params, prob.horizon, prob.lb, prob.ub, refine_c,
                    diag=diag, **kw)
                return np.asarray(res.u)

        t0 = time.perf_counter()
        u_q = run(prob.x0s)                      # compile + the quality u
        t_compile = time.perf_counter() - t0
        uu[name] = np.asarray(u_q, np.float64)

        times = []
        for _ in range(args.reps):
            x0f = jnp.asarray(rng.uniform(-1, 1, (b, 2)), jnp.float32)
            x0f.block_until_ready()
            t0 = time.perf_counter()
            _ = run(x0f)                         # np.asarray inside = fetch
            times.append(time.perf_counter() - t0)
        rows[name] = {
            'solve_s': round(min(times), 3),
            'solves_per_s': round(b / min(times), 1),
            'all_times': [round(t, 3) for t in times],
            'compile_plus_first_s': round(t_compile, 1),
            **{k: v for k, v in diag.items()},
        }
        print(name, json.dumps(rows[name]), flush=True)

    # MERGE into the u archive: sweeps run config subsets; eval passes can
    # then cover every accumulated config.
    u_path = os.path.join(RESULTS, f'quality_retired_u_b{b}.npz')
    if os.path.exists(u_path):
        old = np.load(u_path)
        for nm in old.files:
            uu.setdefault(nm, old[nm])
    np.savez(u_path, **uu)

    if not args.skip_eval:
        assert os.path.exists(ref_path), f'missing {ref_path} (run phase A)'
        out = subprocess.run([sys.executable, '-c', _EVAL, REPO, str(b),
                              ref_path, u_path], env=_cpu_env(),
                             capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith('RESULT ')]
        if not line:
            print('eval failed:', out.stderr[-2000:])
            sys.exit(1)
        res = json.loads(line[-1][len('RESULT '):])
        for name in res:
            if name in rows:
                rows[name].update(res[name])
            else:
                # u came from the accumulated archive (an earlier sweep run);
                # quality freshly evaluated, timing fields from that run.
                rows[name] = dict(res[name], quality_of_archived_u=True)

    prov = provenance()
    for name in rows:
        rows[name]['commit'] = prov['commit']
        rows[name]['b'] = b
    out_path = os.path.join(RESULTS, 'quality_retired.json')
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(rows)
    merged['provenance'] = prov
    with open(out_path, 'w') as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged, indent=1))


if __name__ == '__main__':
    main()

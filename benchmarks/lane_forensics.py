"""Per-lane forensics on the quality tail (VERDICT r4 item 2): for every lane
whose cost excess vs the f64 reference exceeds a threshold, classify the
deficit:

  - 'switch-time': some time-shift of the reference profile is close to the
    lane's solution (the round-4 basin-indexing failure mode) — fixable by a
    wider shift_set / more shift rounds;
  - 'basin': the solution is far from the reference profile in u-space and no
    shift aligns it — needs better phase-0 exploration (more starts);
  - 'refinement': the solution is close to the reference profile but the
    cost gap persists — local descent precision, needs more iterations.

Runs entirely on CPU f64. Usage:
  python benchmarks/lane_forensics.py --u benchmarks/results/quality_retired_u_b256.npz \
      --name ret_gated --ref benchmarks/results/quality_ref_b256.npz [--thresh 0.01]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--u', required=True)
    ap.add_argument('--name', default=None,
                    help='entry inside the npz (default: first)')
    ap.add_argument('--ref', required=True)
    ap.add_argument('--b', type=int, default=256)
    ap.add_argument('--thresh', type=float, default=0.01)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
    from gpmpc_tpu.mpc.cost import risk_sensitive_cost
    from gpmpc_tpu.parallel import batch as pbatch

    b = args.b
    prob = make_headline_problem(b=b, dtype=jnp.float64)
    cache = build_rollout_cache(prob.gp, prob.state_dim, prob.action_dim)
    params_axes = pbatch._params_axes(prob.params, b)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    @jax.jit
    def j64(u):
        means, covs = rollout_batched(cache, prob.x0s, u)
        return cost_b(prob.params, means, covs, u)

    u_ref = np.load(args.ref)['u_ref']
    data = np.load(args.u)
    name = args.name or data.files[0]
    u = np.asarray(data[name], np.float64)
    c_ref = np.asarray(j64(jnp.asarray(u_ref)))
    c = np.asarray(j64(jnp.asarray(u)))
    ex = (c - c_ref) / (1.0 + np.abs(c_ref))

    bad = np.nonzero(ex > args.thresh)[0]
    gammas = np.asarray(prob.params.gamma)
    x0s = np.asarray(prob.x0s)
    span = float(np.asarray(prob.ub) - np.asarray(prob.lb))

    def shifted(uu, k):
        if k == 0:
            return uu
        if k > 0:
            return np.concatenate([np.repeat(uu[:1], k, 0), uu[:-k]], 0)
        k = -k
        return np.concatenate([uu[k:], np.repeat(uu[-1:], k, 0)], 0)

    rows = []
    for i in bad:
        # distance of the lane's solution to every shift of the ref profile
        dists = {k: float(np.mean(np.abs(u[i] - shifted(u_ref[i], k))) / span)
                 for k in range(-4, 5)}
        k_best = min(dists, key=dists.get)
        d_best, d_0 = dists[k_best], dists[0]
        if d_0 < 0.03:
            kind = 'refinement'
        elif d_best < 0.03 and k_best != 0:
            kind = f'switch-time (k={k_best})'
        else:
            kind = 'basin'
        rows.append({
            'lane': int(i), 'excess': round(float(ex[i]), 4),
            'gamma': round(float(gammas[i]), 4),
            'x0': np.round(x0s[i], 3).tolist(),
            'kind': kind,
            'dist_to_ref': round(d_0, 4),
            'best_shift_dist': round(d_best, 4),
        })
    rows.sort(key=lambda r: -r['excess'])
    print(json.dumps({
        'entry': name,
        'n_gt_thresh': len(bad), 'thresh': args.thresh,
        'excess_p50': float(np.percentile(ex, 50)),
        'excess_p90': float(np.percentile(ex, 90)),
        'excess_max': float(np.max(ex)),
        'lanes': rows}, indent=1))


if __name__ == '__main__':
    main()

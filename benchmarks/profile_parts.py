"""Per-stage timing breakdown of the headline solve (VERDICT r1: 'no
jax.profiler trace harness or per-stage cost breakdown tooling').

Times, on the current backend, with the measurement hygiene bench.py
documents (fresh inputs per rep + host fetch inside the timed region):

  rollout_fwd    — one batched 20-step uncertain rollout (forward only)
  objective_vg   — one value_and_grad of the full batched objective
  solve          — the full 40-iteration lockstep L-BFGS solve
  vt_kernel      — 20 sequential calls of just the batched variance-trace op
  mean_prop      — 20 sequential calls of just the batched mean prop

Run: python benchmarks/profile_parts.py [--trace DIR] (trace emits a
jax.profiler trace viewable in TensorBoard/XProf).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, fresh_args, n_rep=3):
    """fn(*args) -> array(s); fresh_args() -> new argument tuple per rep."""
    import jax
    reps = []
    args0 = fresh_args()
    out = fn(*args0)
    jax.block_until_ready(out)                     # compile + warm
    for _ in range(n_rep):
        args = fresh_args()
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])    # force execution + fetch
        reps.append(time.perf_counter() - t0)
    return min(reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace', default=None, help='jax.profiler trace dir')
    ap.add_argument('-b', type=int, default=256)
    args_cli = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_gpmpc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    import jax.numpy as jnp

    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched
    from gpmpc_tpu.mpc.cost import risk_sensitive_cost
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.ops import moments
    from gpmpc_tpu.parallel import batch as pbatch

    b = args_cli.b
    prob = make_headline_problem(b=b)
    gp, ds, da = prob.gp, prob.state_dim, prob.action_dim
    horizon = prob.horizon
    rng = np.random.default_rng(1)
    dtype = jnp.float32

    def fresh_x0():
        return (jnp.asarray(rng.uniform(-1, 1, (b, ds)), dtype),)

    def fresh_u():
        return (jnp.asarray(rng.uniform(-1, 1, (b, horizon, da)), dtype),)

    cache = build_rollout_cache(gp, ds, da)
    params_axes = pbatch._params_axes(prob.params, b)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    results = {}

    # --- rollout forward ---
    @jax.jit
    def rollout_fwd(x0s, u):
        means, covs = rollout_batched(cache, x0s, u)
        return means[:, -1]

    results['rollout_fwd'] = _timeit(
        lambda u: rollout_fwd(prob.x0s, u), fresh_u)

    # --- objective value_and_grad ---
    def objective_b(x0s, u):
        means, covs = rollout_batched(cache, x0s, u)
        return jnp.sum(cost_b(prob.params, means, covs, u))

    obj_vg = jax.jit(jax.value_and_grad(objective_b, argnums=1))
    results['objective_vg'] = _timeit(
        lambda u: obj_vg(prob.x0s, u), fresh_u)

    # --- full solve ---
    solver = SolverConfig(method='lbfgs', max_iters=40, tol=1e-4)

    @jax.jit
    def solve(x0s):
        res = pbatch.solve_batch(gp, ds, da, x0s, prob.params, horizon,
                                 prob.lb, prob.ub, solver)
        return res.cost

    results['solve'] = _timeit(solve, fresh_x0)

    # --- variance-trace op alone, chained H times (forward only) ---
    @jax.jit
    def vt_chain(u0):
        s_diag = jnp.full((b, ds + da), 1e-3, dtype)

        def body(carry, _):
            um = carry
            means = jnp.zeros((b, ds), dtype)
            var = moments.variance_prop_multi_batched_diag(
                um, s_diag, cache.x, cache.b_lam, cache.log_lambdas,
                cache.log_sigma_f, means, tied=cache.tied_lambdas)
            um = um + 1e-3 * jnp.pad(var, ((0, 0), (0, da)))
            return um, None

        um, _ = jax.lax.scan(body, u0, None, length=horizon)
        return um

    results['vt_chain_fwd'] = _timeit(
        lambda u: vt_chain(u), lambda: (jnp.asarray(
            rng.uniform(-1, 1, (b, ds + da)), dtype),))

    # --- variance-trace chain with gradient ---
    vt_vg = jax.jit(jax.value_and_grad(lambda u0: jnp.sum(vt_chain(u0))))
    results['vt_chain_vg'] = _timeit(
        lambda u: vt_vg(u), lambda: (jnp.asarray(
            rng.uniform(-1, 1, (b, ds + da)), dtype),))

    # --- mean-prop chain alone ---
    @jax.jit
    def mean_chain(u0):
        s_diag = jnp.full((b, ds + da), 1e-3, dtype)

        def body(carry, _):
            um = carry
            m, _l = moments.mean_prop_batched_diag(
                um, s_diag, cache.x, cache.beta, cache.log_lambdas,
                cache.log_sigma_f, cache.mask, tied=cache.tied_lambdas)
            um = um + 1e-3 * jnp.pad(m, ((0, 0), (0, da)))
            return um, None

        um, _ = jax.lax.scan(body, u0, None, length=horizon)
        return um

    results['mean_chain_fwd'] = _timeit(
        lambda u: mean_chain(u), lambda: (jnp.asarray(
            rng.uniform(-1, 1, (b, ds + da)), dtype),))

    if args_cli.trace:
        with jax.profiler.trace(args_cli.trace):
            c = solve(*fresh_x0())
            _ = np.asarray(c)

    per_iter = results['solve'] / 40.0
    results['solve_per_iter'] = per_iter
    results['solves_per_s'] = b / results['solve']
    print(json.dumps({k: round(v * 1e3, 3) if k != 'solves_per_s' else round(v, 1)
                      for k, v in results.items()}, indent=1))


if __name__ == '__main__':
    main()

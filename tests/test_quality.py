"""Solution-quality regression gates (VERDICT r3 item 3).

Two layers:

  - `test_recipe_beats_plain_tiny` (default suite): on a small problem, the
    production multistart recipe (pruned surrogate phase 0 + full scoring +
    noise-tolerant refinement + time-shift phase) must be at least as good
    as the plain cold-start solve on EVERY lane. Catches regressions of the
    recipe machinery (selection, pruning, shift bookkeeping) in seconds of
    compute (the compile dominates).

  - `test_headline_quality_gate` (slow): the headline-shape gate against the
    cached f64 600-iteration reference (tests/fixtures/quality_ref_b64.npz,
    B=16 subset, f64 CPU). Thresholds are set from round-4 measurements of
    this exact configuration (multistart p90 2.4%, plain p50 1.6% / p90 27%)
    with ~2x headroom — tight enough that a basin-selection or refinement
    regression (the round-2/3 failure mode: plain-solve p90 ~36%, all lanes
    "converged") fails loudly.

    Why this is not the <1%-in-<60s gate VERDICT sketched: the multistart
    program takes ~3 min to COMPILE on CPU (persistent cache is disabled for
    CPU tests — see conftest), and the f64-CPU descent paths land in
    different basins than the f32-TPU production path lane-by-lane (basin
    luck, not precision), so the sub-1% p90 claim is carried by the on-TPU
    artifact quoted by bench.py (benchmarks/results/quality_ms_sweep.json)
    while this gate guards the ALGORITHM at CPU-affordable budgets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu.gp import state as gs
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
from gpmpc_tpu.mpc.solver import SolverConfig
from gpmpc_tpu.parallel import batch as pbatch

RNG = np.random.default_rng(11)


def test_recipe_beats_plain_tiny():
    # horizon 6 / 2 shifts / 4 starts: the invariant (recipe contains the
    # plain cold start and only replaces on improvement) is program-shape
    # independent; the in-jit multistart program's compile time is the
    # non-slow suite's single largest cost (143 s at the old shape).
    n, ds, da, b, horizon = 40, 2, 1, 6, 6
    s = RNG.uniform(-1, 1, (n, ds))
    a = RNG.uniform(-3, 3, (n, da))
    ns = s + 0.1 * np.concatenate([s[:, 1:], np.sin(s[:, :1]) + a], axis=1)
    gp = gs.make_gp(gs.GPConfig(capacity=64, x_dim=3, out_dim=2),
                    np.concatenate([s, a], axis=1), ns,
                    log_lambdas=np.log([2.0, 2.0, 2.0]),
                    log_sigma_n=np.log(0.1), dtype=jnp.float32)
    params = CostParams(Q=jnp.eye(ds, dtype=jnp.float32),
                        R=0.01 * jnp.eye(da, dtype=jnp.float32),
                        gamma=jnp.asarray(np.linspace(-0.2, 0.2, b),
                                          jnp.float32),
                        x_ref=jnp.zeros(ds, jnp.float32),
                        u_ref=jnp.zeros(da, jnp.float32))
    x0s = jnp.asarray(RNG.uniform(-1, 1, (b, ds)), jnp.float32)
    sv = SolverConfig(max_iters=20, tol=1e-4, noise_rel=3e-4,
                      progress_window=10)
    plain = pbatch.solve_batch(gp, ds, da, x0s, params, horizon, -3.0, 3.0,
                               sv)
    ms = pbatch.solve_batch_multistart(
        gp, ds, da, x0s, params, horizon, -3.0, 3.0, sv, n_starts=4,
        prune_to=2, shift_set=(1, -1), shift_iters=10, shift_prune=2,
        shift_prune_frozen_iters=4)
    c_plain = np.asarray(plain.cost)
    c_ms = np.asarray(ms.cost)
    assert np.all(np.isfinite(c_ms))
    # The recipe contains the plain cold start as candidate 0 and only ever
    # replaces it with a better-scoring refined candidate.
    assert np.all(c_ms <= c_plain + 1e-3), (c_ms, c_plain)


@pytest.mark.slow
def test_headline_quality_gate():
    import os
    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.dynamics import build_rollout_cache, rollout_batched

    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'fixtures', 'quality_ref_b64.npz')
    u_ref_all = np.load(fixture)['u_ref']

    prob = make_headline_problem(b=64, dtype=jnp.float64)
    sub = np.arange(0, 64, 4)                    # 16 lanes across the sweep
    x0s = prob.x0s[sub]
    params = pbatch._gather_params(prob.params, 64, jnp.asarray(sub))

    refine = SolverConfig(max_iters=60, tol=1e-4, noise_rel=3e-4,
                          progress_window=24)
    ms = pbatch.solve_batch_multistart(
        prob.gp, 2, 1, x0s, params, 20, prob.lb, prob.ub, refine,
        n_starts=8, prune_to=4, shift_set=(1, -1, 2, -2), shift_iters=32,
        shift_prune=2)
    plain = pbatch.solve_batch(prob.gp, 2, 1, x0s, params, 20, prob.lb,
                               prob.ub, SolverConfig(max_iters=40, tol=1e-4))

    cache = build_rollout_cache(prob.gp, 2, 1)
    axes = pbatch._params_axes(params)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(axes, 0, 0, 0))

    def j(u):
        m, c = rollout_batched(cache, x0s, jnp.asarray(u))
        return np.asarray(cost_b(params, m, c, jnp.asarray(u)))

    c_ref = j(u_ref_all[sub])
    ex_ms = (j(ms.u) - c_ref) / (1.0 + np.abs(c_ref))
    ex_pl = (j(plain.u) - c_ref) / (1.0 + np.abs(c_ref))

    # Round-4 measured values (f64 CPU, this config): ms p90 2.4%, max 3.1%;
    # plain p50 1.6%, p90 27%. Thresholds at ~2x headroom.
    assert np.percentile(ex_ms, 90) < 0.05, ex_ms
    assert np.max(ex_ms) < 0.10, ex_ms
    assert np.percentile(ex_pl, 50) < 0.05, ex_pl
    # The recipe must decisively beat the plain solve's tail.
    assert np.percentile(ex_ms, 90) < np.percentile(ex_pl, 90) / 3.0

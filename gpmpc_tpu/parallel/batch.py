"""Batched and sharded GP-MPC solves — the scenario fan-out layer.

The unit of work is one full trajectory optimization (BASELINE.json's metric is
solves/s/chip). Everything in the solve is already pure and static-shape, so
batching is `vmap` and scaling across chips is a NamedSharding on the leading
scenario axis: XLA SPMD partitions the batch over the mesh with zero
communication (solves are independent; collectives only appear if a sharded
'model' axis is used inside the linear algebra).

Three fan-out axes (composable because they are just leading array axes):
  - initial states   x0s (B, ds)
  - risk parameters  gammas (B,)
  - GP posteriors    a GPState with a leading (B,) axis on its arrays
                     (hyperparameter / dataset draws — `stack_gps`)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import (RolloutCache, build_rollout_cache, rollout,
                                rollout_batched)
from gpmpc_tpu.gp.state import GPState
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
from gpmpc_tpu.mpc.solver import (SolverConfig, SolveResult, solve_trajectory,
                                  solve_trajectory_batched)


def _single_solve(cache: RolloutCache, params: CostParams, x0, u_init, lb, ub,
                  solver: SolverConfig, full_cov: bool,
                  delta: bool = False) -> SolveResult:
    def objective(u):
        means, covs = rollout(cache, x0, u, full_cov=full_cov, delta=delta)
        return risk_sensitive_cost(params, means, covs, u)

    return solve_trajectory(objective, u_init, lb, ub, solver)


# Per-scenario leaves are detected by RANK, never by comparing shape[0] to B:
# a leading-size test is ambiguous whenever a shared leaf's first dim happens
# to equal B (e.g. B = 1, or da == B), which silently tiled/mapped the wrong
# leaves. Canonical ranks: Q (ds, ds) | (B, ds, ds); gamma () | (B,);
# x_ref/u_ref/u_prev (d,) | (B, d); R and R_delta are always shared.
def _is_batched_leaves(params: CostParams) -> CostParams:
    def rank_is(v, r):
        return v is not None and hasattr(v, 'ndim') and v.ndim == r

    return CostParams(
        Q=rank_is(params.Q, 3), R=False,
        gamma=rank_is(params.gamma, 1),
        x_ref=rank_is(params.x_ref, 2), u_ref=rank_is(params.u_ref, 2),
        R_delta=False, u_prev=rank_is(params.u_prev, 2))


def _params_axes(params: CostParams, b: int = 0) -> CostParams:
    """Per-leaf vmap axes: 0 where a cost parameter carries a leading (B,)
    scenario axis (rank-detected), None where it is shared. `b` is unused
    (kept for caller compatibility)."""
    batched = _is_batched_leaves(params)
    return jax.tree.map(lambda is_b: 0 if is_b else None, batched,
                        is_leaf=lambda v: isinstance(v, bool))


def solve_batch(gp: GPState, state_dim: int, action_dim: int,
                x0s: jax.Array,                  # (B, ds)
                params: CostParams,              # gamma may be (B,) for sweeps
                horizon: int,
                lb, ub,
                solver: SolverConfig = SolverConfig(),
                u_init: Optional[jax.Array] = None,   # (B, H, da) or None
                full_cov: bool = False,
                delta: bool = False,
                impl: str = 'auto') -> SolveResult:
    """B independent solves against one shared GP posterior.

    The rollout cache (beta, trace matrices) is built ONCE and broadcast — the
    dominant per-solve precomputation is amortized across the whole batch.
    gamma (and u_prev/x_ref/u_ref) may carry a leading (B,) axis to sweep
    per-scenario cost parameters; scalar entries broadcast.

    impl: 'fused' runs the explicitly-batched rollout + lockstep L-BFGS (the
    production path — enables the batched Pallas kernels); 'vmap' vmaps the
    single-scenario solve (the oracle twin); 'auto' picks 'fused' whenever the
    configuration supports it (diag covariance + L-BFGS).
    """
    b = x0s.shape[0]
    cache = build_rollout_cache(gp, state_dim, action_dim)
    if u_init is None:
        u_init = jnp.zeros((b, horizon, action_dim), x0s.dtype)

    if impl == 'auto':
        impl = ('fused' if solver.method == 'lbfgs' and cache.nominal_fn is None
                else 'vmap')
    elif impl == 'fused' and solver.method != 'lbfgs':
        raise ValueError(
            "impl='fused' runs under the lockstep L-BFGS solver; it cannot "
            f"honor solver.method={solver.method!r}. Use impl='vmap' (or "
            "'auto').")

    params_axes = _params_axes(params, b)

    if impl == 'fused':
        cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

        def objective_b(u):                       # (B, H, da) -> (B,)
            means, covs = rollout_batched(cache, x0s, u, delta=delta,
                                          full_cov=full_cov)
            return cost_b(params, means, covs, u)

        return solve_trajectory_batched(objective_b, u_init, lb, ub, solver)

    fn = jax.vmap(_single_solve,
                  in_axes=(None, params_axes, 0, 0, None, None, None, None,
                           None))
    return fn(cache, params, x0s, u_init, lb, ub, solver, full_cov, delta)


def _tile_params(params: CostParams, b: int, k: int) -> CostParams:
    """Tile the per-scenario ((B,)-leading, rank-detected) leaves of `params`
    k times along the batch axis (for start-multiplexed super-batches); shared
    leaves pass through."""
    batched = _is_batched_leaves(params)

    def leaf(v, is_b):
        if is_b:
            return jnp.tile(v, (k,) + (1,) * (v.ndim - 1))
        return v

    return jax.tree.map(leaf, params, batched,
                        is_leaf=lambda v: v is None)


def _multistart_phase0(cache: RolloutCache, x0s: jax.Array,
                       params: CostParams, horizon: int, action_dim: int,
                       lb, ub, surrogate: SolverConfig, surrogate_mode: str,
                       frozen_rounds: int, start_scale: float, seed: int,
                       delta: bool, n_zero_starts: int, zero_jitter: float,
                       prune_to: int,
                       extra_starts: Optional[jax.Array],
                       n_starts: int) -> jax.Array:
    """Global (basin-selection) phase of the multistart recipe: build the
    start set, surrogate-descend every candidate, optionally prune, score the
    survivors under the FULL objective, and return the per-scenario winner
    u0 (B, H, da). Shared by solve_batch_multistart (in-jit recipe) and
    solve_batch_multistart_retired (host-orchestrated lane retirement)."""
    b = x0s.shape[0]
    k = n_starts
    # Starts: u = 0 (the reference's cold start, mpc.py:292-293), optional
    # JITTERED-ZERO starts, and wide box draws. The jittered zeros are
    # descent-PATH diversity, not position diversity: the f64 reference's
    # basins are by construction reachable by cold-start descent, and the
    # chaotic rollout amplifies an O(zero_jitter) perturbation of the start
    # into a different descent path — measured (round 4) to recover basins
    # that wide uniform draws miss at any n_starts.
    key = jax.random.PRNGKey(seed)
    dt = x0s.dtype
    lo = jnp.broadcast_to(jnp.asarray(lb, dt), (horizon, action_dim))
    hi = jnp.broadcast_to(jnp.asarray(ub, dt), (horizon, action_dim))
    mid, span = 0.5 * (lo + hi), 0.5 * (hi - lo)
    n_zero = min(n_zero_starts, k - 1)
    key, kz = jax.random.split(key)
    parts = [jnp.zeros((1, b, horizon, action_dim), dt)]
    if n_zero > 0:
        zdraws = jax.random.normal(
            kz, (n_zero, b, horizon, action_dim), dt)
        parts.append(zero_jitter * span * zdraws)
    n_wide = k - 1 - n_zero
    if n_wide > 0:
        draws = jax.random.uniform(
            key, (n_wide, b, horizon, action_dim), dt, -1.0, 1.0)
        parts.append(mid + start_scale * span * draws)
    if extra_starts is not None:
        parts.append(jnp.asarray(extra_starts, dt).reshape(
            -1, b, horizon, action_dim))
    starts = jnp.concatenate(parts, axis=0)                  # (K, B, H, da)
    k = starts.shape[0]                # total width incl. extra_starts

    params_k = _tile_params(params, b, k)
    params_axes_k = _params_axes(params_k, k * b)
    cost_k = jax.vmap(risk_sensitive_cost, in_axes=(params_axes_k, 0, 0, 0))
    x0s_k = jnp.tile(x0s, (k, 1))

    def objective_surrogate(u):                   # (K*B, H, da) -> (K*B,)
        means, covs = rollout_batched(cache, x0s_k, u, delta=delta,
                                      mean_only=True)
        return cost_k(params_k, means, covs, u)

    def objective_full_k(u):
        means, covs = rollout_batched(cache, x0s_k, u, delta=delta)
        return cost_k(params_k, means, covs, u)

    u_cand = starts.reshape(k * b, horizon, action_dim)
    k_live = k
    if surrogate_mode == 'mean':
        u_cand = solve_trajectory_batched(objective_surrogate, u_cand,
                                          lb, ub, surrogate).u
    elif surrogate_mode == 'frozen':
        for rnd in range(frozen_rounds):
            kb = k_live * b
            x0s_r = x0s_k[:kb]
            params_r = params_k if k_live == k else _tile_params(params, b,
                                                                 k_live)
            axes_r = _params_axes(params_r)
            cost_r = jax.vmap(risk_sensitive_cost,
                              in_axes=(axes_r, 0, 0, 0))
            _, covs = rollout_batched(cache, x0s_r, u_cand, delta=delta)
            cov_d = jax.lax.stop_gradient(
                jnp.diagonal(covs, axis1=2, axis2=3))        # (KB, H+1, ds)

            def objective_frozen(u, cov_d=cov_d, x0s_r=x0s_r,
                                 params_r=params_r, cost_r=cost_r):
                means, cv = rollout_batched(cache, x0s_r, u, delta=delta,
                                            frozen_cov_diag=cov_d)
                return cost_r(params_r, means, cv, u)

            res_f = solve_trajectory_batched(objective_frozen, u_cand,
                                             lb, ub, surrogate)
            u_cand = res_f.u
            # Optional candidate pruning after the first round: the
            # surrogate solve's own costs (comparable per lane as
            # approximations of the full objective) rank the K starts;
            # only the top `prune_to` pay the remaining rounds and the
            # full-objective scoring — phase 0's cost driver at large K.
            if (rnd == 0 and prune_to and prune_to < k_live
                    and frozen_rounds > 1):
                j_f = jnp.where(jnp.isfinite(res_f.cost), res_f.cost,
                                jnp.inf).reshape(k_live, b)
                order = jnp.argsort(j_f, axis=0)[:prune_to]  # (P, B)
                u_kb = u_cand.reshape(k_live, b, horizon, action_dim)
                u_cand = u_kb[order, jnp.arange(b)[None, :]].reshape(
                    prune_to * b, horizon, action_dim)
                k_live = prune_to
    else:
        raise ValueError(f'unknown surrogate_mode {surrogate_mode!r}')
    # Score the K candidates per scenario under the full objective. Finite
    # guard: a candidate whose full-objective cost is NaN/inf (the surrogate
    # can accept iterates outside the PD cone for extreme gamma) must never
    # win the argmin — replace with +inf so any finite candidate beats it
    # (u = 0 always evaluates finite on the reference-style workloads).
    if k_live != k:
        params_l = _tile_params(params, b, k_live)
        axes_l = _params_axes(params_l)
        cost_l = jax.vmap(risk_sensitive_cost, in_axes=(axes_l, 0, 0, 0))
        x0s_l = x0s_k[:k_live * b]

        def objective_full_k(u):                  # noqa: F811 (live width)
            means, covs = rollout_batched(cache, x0s_l, u, delta=delta)
            return cost_l(params_l, means, covs, u)

    j_full = objective_full_k(u_cand).reshape(k_live, b)     # (K, B)
    j_full = jnp.where(jnp.isfinite(j_full), j_full, jnp.inf)
    best = jnp.argmin(j_full, axis=0)                        # (B,)
    return u_cand.reshape(k_live, b, horizon, action_dim)[
        best, jnp.arange(b)]                                 # (B, H, da)


def solve_batch_multistart(gp: GPState, state_dim: int, action_dim: int,
                           x0s: jax.Array, params: CostParams, horizon: int,
                           lb, ub,
                           solver: SolverConfig = SolverConfig(),
                           n_starts: int = 4,
                           surrogate: Optional[SolverConfig] = None,
                           surrogate_mode: str = 'frozen',
                           frozen_rounds: int = 3,
                           start_scale: float = 0.6,
                           seed: int = 0,
                           delta: bool = False,
                           refine_frozen_rounds: int = 0,
                           refine_frozen_iters: int = 12,
                           n_zero_starts: int = 0,
                           zero_jitter: float = 0.02,
                           shift_set: tuple = (),
                           shift_iters: int = 40,
                           shift_prune: int = 0,
                           shift_prune_frozen_iters: int = 0,
                           prune_to: int = 0,
                           extra_starts: Optional[jax.Array] = None
                           ) -> SolveResult:
    """Two-phase global-then-local batched solve — the production recipe for
    reference-matching solution quality at batch throughput.

    Measured motivation (round-3 probes on the headline workload): the f32
    solve's local machinery is essentially exact — warm-started at the f64
    reference solution it stays within 0.1% cost everywhere — but from the
    cold start u = 0 the chaotic f32 rollout sends ~1/3 of the lanes down a
    worse BASIN than the f64 path finds (p90 cost excess ~10% no matter how
    many local iterations are spent). Basin selection, not refinement, is
    the expensive-precision-critical part; and basin structure comes from
    the (mean) dynamics' multimodality, not from the uncertainty terms.

    Phase 0 therefore runs `n_starts` starts per scenario (u = 0 plus
    uniform draws over `start_scale` of the box) against a CHEAP surrogate
    whose per-iteration cost is O(B N d) instead of the full moment-matching
    O(B N^2):

      surrogate_mode='mean':   pure mean-only rollout (basin structure only;
                               gamma-blind — all risk settings see the same
                               surrogate landscape);
      surrogate_mode='frozen': `frozen_rounds` cycles of [one FULL rollout to
                               capture the variance trajectory -> cheap
                               L-BFGS iterations on the frozen-covariance
                               objective]. The cost keeps its gamma-weighted
                               (Q^{-1} + gamma Sigma)^{-1} state weighting,
                               so risk-averse and risk-seeking lanes shape
                               their candidates differently; only dSigma/du
                               is missing from the surrogate gradient.

    Candidates are then scored under the FULL objective (one O(N^2) rollout
    per start) and the per-scenario best warm-starts phase 1, the full
    noise-tolerant solve. Optional phases (the round-4 production recipe,
    measured in benchmarks/results/quality_ms_sweep.json):

      prune_to > 0:        after the first frozen round, only the top
                           `prune_to` candidates per scenario (by surrogate
                           cost) pay the remaining phase-0 rounds/scoring;
      shift_set:           TIME-SHIFT tail fix — the refined winner's
                           profile shifted by each k in the set is re-refined
                           `shift_iters` iterations and the per-scenario
                           best returned (see the phase comment below for
                           the measured switch-time-basin rationale);
      shift_prune > 0:     one full forward scores the shifted profiles and
                           only the top `shift_prune` pay the refinement;
      refine_frozen_*:     frozen-covariance pre-refinement of the winner
                           (cheap iterations; measured to underperform full
                           refinement on quality — off by default);
      n_zero_starts:       jittered-zero starts (measured to underperform
                           wide draws — off by default; kept for sweeps);
      extra_starts:        (E, B, H, da) caller-supplied candidate starts —
                           e.g. the receding-horizon warm start (previous
                           step's solved trajectory, typically the incumbent
                           basin) — appended to the start set so every
                           control step keeps its warm start in the running
                           without losing the cold-start/global draws.

    Everything is one jittable computation (no host round trips); combine
    with solve_batch_staged-style compaction by passing the result's
    `converged` mask downstream if desired.
    """
    b = x0s.shape[0]
    cache = build_rollout_cache(gp, state_dim, action_dim)
    if surrogate is None:
        # frozen mode iterates per round; mean mode runs once.
        surrogate = solver.replace(
            max_iters=(16 if surrogate_mode == 'frozen' else 80), tol=1e-3)

    u0 = _multistart_phase0(cache, x0s, params, horizon, action_dim, lb, ub,
                            surrogate, surrogate_mode, frozen_rounds,
                            start_scale, seed, delta, n_zero_starts,
                            zero_jitter, prune_to, extra_starts, n_starts)

    params_axes = _params_axes(params, b)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    def objective_full(u):
        means, covs = rollout_batched(cache, x0s, u, delta=delta)
        return cost_b(params, means, covs, u)

    # Optional frozen-heavy pre-refinement of the winner (the throughput
    # recipe): a frozen-covariance L-BFGS iteration costs ~1/9 of a full one
    # (benchmarks/results/iter_cost.json: 0.94 vs 8.29 ms at B=256), so most
    # of the local descent can run on the frozen objective — refreshing the
    # covariance trajectory from one full rollout per round — with only the
    # final `solver` budget paying full-objective prices. The frozen gradient
    # lacks only dSigma/du, which the refresh cycles and the full polish
    # recover.
    for _ in range(refine_frozen_rounds):
        _, covs_b = rollout_batched(cache, x0s, u0, delta=delta)
        cov_db = jax.lax.stop_gradient(
            jnp.diagonal(covs_b, axis1=2, axis2=3))              # (B, H+1, ds)

        def objective_frozen_b(u, cov_db=cov_db):
            means, cv = rollout_batched(cache, x0s, u, delta=delta,
                                        frozen_cov_diag=cov_db)
            return cost_b(params, means, cv, u)

        u0 = solve_trajectory_batched(
            objective_frozen_b, u0, lb, ub,
            solver.replace(max_iters=refine_frozen_iters)).u

    res = solve_trajectory_batched(objective_full, u0, lb, ub, solver)
    if not shift_set:
        return res

    # TIME-SHIFT phase (round-4 tail fix): the persistent >1% lanes of every
    # random-start recipe turned out to be SWITCH-TIME misalignment — their
    # incumbent was the f64 reference's control profile shifted by 1-2 steps
    # (basins are indexed by the discrete step at which the high-torque
    # phase hands over; a whole-profile shift is a far move in u-space that
    # neither local descent nor uniform draws ever make). Each k in
    # `shift_set` proposes the REFINED incumbent delayed (k > 0: first
    # action repeated) or advanced (k < 0: last action held); incumbent +
    # shifts are refined `shift_iters` full-objective iterations in lockstep
    # and the per-scenario best (finite-guarded) is returned. Measured on
    # the headline workload: p90 cost excess 3.4% -> 0.18% vs the f64
    # reference (benchmarks/results/quality_ms_sweep.json, round 4).
    def shift_u(u, kk):
        if kk > 0:
            return jnp.concatenate(
                [jnp.repeat(u[:, :1], kk, axis=1), u[:, :-kk]], axis=1)
        kk = -kk
        return jnp.concatenate(
            [u[:, kk:], jnp.repeat(u[:, -1:], kk, axis=1)], axis=1)

    u1 = res.u
    ks = 1 + len(shift_set)
    u_sh = jnp.concatenate([u1] + [shift_u(u1, kk) for kk in shift_set],
                           axis=0)                           # (Ks*B, H, da)

    def make_obj(kk, x0s_kk, params_kk):
        axes_kk = _params_axes(params_kk)
        cost_kk = jax.vmap(risk_sensitive_cost, in_axes=(axes_kk, 0, 0, 0))

        def objective(u):
            means, covs = rollout_batched(cache, x0s_kk, u, delta=delta)
            return cost_kk(params_kk, means, covs, u)
        return objective

    params_s = _tile_params(params, b, ks)
    x0s_s = jnp.tile(x0s, (ks, 1))
    objective_full_s = make_obj(ks, x0s_s, params_s)

    if shift_prune and shift_prune < ks:
        # Cheap pre-selection: ONE full forward scores all shifted profiles;
        # only the top `shift_prune` candidates per scenario (finite-guarded;
        # the refined incumbent is candidate 0 and scores its own refined
        # cost, so it survives unless a shift genuinely beats it) pay the
        # full lockstep refinement. Cuts the shift phase's cost from
        # Ks*B*shift_iters to B*fwd + shift_prune*B*shift_iters full-iteration
        # units — the phase's cost driver at Ks = 5.
        if shift_prune_frozen_iters > 0:
            # A raw shifted profile is seam-misaligned, so its unrefined
            # score can bury a shift that wins after refinement (observed: a
            # lane diverging to 29% excess under score-only pruning). A few
            # FROZEN-covariance iterations (~1/9 the cost of full ones)
            # smooth the seams first so the pre-selection scores rank the
            # refined potential.
            _, covs_sh = rollout_batched(cache, x0s_s, u_sh, delta=delta)
            cov_sh = jax.lax.stop_gradient(
                jnp.diagonal(covs_sh, axis1=2, axis2=3))
            cost_sh = jax.vmap(risk_sensitive_cost,
                               in_axes=(_params_axes(params_s), 0, 0, 0))

            def objective_frozen_s(u, cov_sh=cov_sh):
                means, cv = rollout_batched(cache, x0s_s, u, delta=delta,
                                            frozen_cov_diag=cov_sh)
                return cost_sh(params_s, means, cv, u)

            u_sh = solve_trajectory_batched(
                objective_frozen_s, u_sh, lb, ub,
                solver.replace(max_iters=shift_prune_frozen_iters)).u
        j_pre = objective_full_s(u_sh).reshape(ks, b)
        j_pre = jnp.where(jnp.isfinite(j_pre), j_pre, jnp.inf)
        order = jnp.argsort(j_pre, axis=0)[:shift_prune]     # (P, B)
        u_kb = u_sh.reshape(ks, b, horizon, action_dim)
        u_sh = u_kb[order, jnp.arange(b)[None, :]].reshape(
            shift_prune * b, horizon, action_dim)
        ks = shift_prune
        params_s = _tile_params(params, b, ks)
        x0s_s = jnp.tile(x0s, (ks, 1))
        objective_full_s = make_obj(ks, x0s_s, params_s)

    res_s = solve_trajectory_batched(
        objective_full_s, u_sh, lb, ub,
        solver.replace(max_iters=shift_iters))
    j_s = jnp.where(jnp.isfinite(res_s.cost), res_s.cost,
                    jnp.inf).reshape(ks, b)
    best_s = jnp.argmin(j_s, axis=0)
    pick = lambda v: v.reshape((ks, b) + v.shape[1:])[best_s, jnp.arange(b)]
    # The UNTOUCHED pre-shift incumbent joins the final selection: with
    # shift_prune_frozen_iters > 0 the incumbent profile is smoothed by
    # frozen-covariance iterations before pre-selection and the noise-
    # tolerant refinement is not monotone, so candidate 0 can be pruned or
    # degraded — without this guard the shift phase could return a lane
    # WORSE than the pre-shift solve (advisor r4, medium). Tie goes to the
    # incumbent (<=) so no-op shifts keep the incumbent's diagnostics.
    j_shift = pick(res_s.cost)
    j_inc = jnp.where(jnp.isfinite(res.cost), res.cost, jnp.inf)
    use_inc = j_inc <= jnp.where(jnp.isfinite(j_shift), j_shift, jnp.inf)
    sel = lambda a, bv: jnp.where(
        use_inc.reshape((b,) + (1,) * (a.ndim - 1)), a, bv)
    return SolveResult(u=sel(res.u, pick(res_s.u)),
                       cost=sel(res.cost, j_shift),
                       iters=res.iters + pick(res_s.iters),
                       pg_norm=sel(res.pg_norm, pick(res_s.pg_norm)),
                       converged=sel(res.converged, pick(res_s.converged)))


import functools as _functools


@_functools.partial(jax.jit, static_argnames=(
    'state_dim', 'action_dim', 'horizon', 'surrogate_mode', 'frozen_rounds',
    'n_starts', 'prune_to', 'n_zero_starts', 'delta', 'seed',
    'refine_frozen_rounds', 'refine_frozen_iters'))
def _retired_phase_a(gp, x0s, params, lb, ub, extra_starts, solver1,
                     surrogate, start_scale, zero_jitter,
                     state_dim, action_dim, horizon, surrogate_mode,
                     frozen_rounds, n_starts, prune_to, n_zero_starts,
                     delta, seed, refine_frozen_rounds=0,
                     refine_frozen_iters=16) -> SolveResult:
    """Jitted program A of the retired recipe: phase-0 basin selection +
    optional frozen-covariance pre-refinement rounds (a frozen iteration
    costs ~1/9 of a full one, iter_cost.json) + the first
    `solver1.max_iters` full-objective refinement iterations, all at full
    batch width."""
    cache = build_rollout_cache(gp, state_dim, action_dim)
    u0 = _multistart_phase0(cache, x0s, params, horizon, action_dim, lb, ub,
                            surrogate, surrogate_mode, frozen_rounds,
                            start_scale, seed, delta, n_zero_starts,
                            zero_jitter, prune_to, extra_starts, n_starts)
    params_axes = _params_axes(params)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    def objective_full(u):
        means, covs = rollout_batched(cache, x0s, u, delta=delta)
        return cost_b(params, means, covs, u)

    for _ in range(refine_frozen_rounds):
        _, covs_b = rollout_batched(cache, x0s, u0, delta=delta)
        cov_db = jax.lax.stop_gradient(
            jnp.diagonal(covs_b, axis1=2, axis2=3))          # (B, H+1, ds)

        def objective_frozen_b(u, cov_db=cov_db):
            means, cv = rollout_batched(cache, x0s, u, delta=delta,
                                        frozen_cov_diag=cov_db)
            return cost_b(params, means, cv, u)

        u0 = solve_trajectory_batched(
            objective_frozen_b, u0, lb, ub,
            solver1.replace(max_iters=refine_frozen_iters)).u

    return solve_trajectory_batched(objective_full, u0, lb, ub, solver1)


@_functools.partial(jax.jit, static_argnames=(
    'state_dim', 'action_dim', 'delta'))
def _refine_chunk(gp, x0s_c, params_c, u_init_c, lb, ub, solver_c,
                  state_dim, action_dim, delta) -> SolveResult:
    """Jitted warm-started full-objective refinement of a compacted lane
    chunk (programs B and D of the retired recipe — same program, two
    budgets)."""
    cache = build_rollout_cache(gp, state_dim, action_dim)
    params_axes = _params_axes(params_c)
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    def objective(u):
        means, covs = rollout_batched(cache, x0s_c, u, delta=delta)
        return cost_b(params_c, means, covs, u)

    return solve_trajectory_batched(objective, u_init_c, lb, ub, solver_c)


def _shift_u_batch(u, kk):
    """Whole-profile time shift of (B, H, da) trajectories: kk > 0 delays
    (first action repeated), kk < 0 advances (last action held)."""
    if kk > 0:
        return jnp.concatenate(
            [jnp.repeat(u[:, :1], kk, axis=1), u[:, :-kk]], axis=1)
    kk = -kk
    return jnp.concatenate(
        [u[:, kk:], jnp.repeat(u[:, -1:], kk, axis=1)], axis=1)


@_functools.partial(jax.jit, static_argnames=(
    'state_dim', 'action_dim', 'delta', 'shift_set'))
def _frozen_pre_score(gp, x0s, params, u_inc,
                      state_dim, action_dim, delta, shift_set,
                      extra_cands=None):
    """Jitted program C0 of the retired recipe (round-5 pre-gate): cheap
    frozen-objective scores for ALL proposals.

    Builds the same candidate set as _shift_score (incumbent at index 0,
    time shifts of it, optional extras), but scores the RAW candidates
    FORWARD-ONLY under the frozen-covariance objective, every candidate
    borrowing its lane INCUMBENT's covariance trajectory — so the expensive
    O(N^2) variance propagation runs once at width B (the incumbents)
    instead of Ks*B, and no smoothing iterations are spent on lanes that
    were never going to be admitted. Index 0's score is exact (the incumbent
    under its own covariance IS its full objective); candidate scores carry
    a frozen-covariance bias, which the caller absorbs with a looser
    admission margin before the precise (smooth + full-score) stage runs on
    the admitted subset only.

    Returns (u_cands (Ks, B, H, da), scores (Ks, B), finite-guarded)."""
    b, horizon, action_dim_u = u_inc.shape
    cache = build_rollout_cache(gp, state_dim, action_dim)
    parts = [u_inc] + [_shift_u_batch(u_inc, kk) for kk in shift_set]
    if extra_cands is not None:
        parts.extend(extra_cands[k] for k in range(extra_cands.shape[0]))
    ks = len(parts)
    u_c = jnp.concatenate(parts, axis=0)                      # (Ks*B, H, da)
    _, covs_inc = rollout_batched(cache, x0s, u_inc, delta=delta)
    cov_d = jax.lax.stop_gradient(
        jnp.diagonal(covs_inc, axis1=2, axis2=3))             # (B, H+1, ds)
    cov_t = jnp.tile(cov_d, (ks, 1, 1))
    x0s_t = jnp.tile(x0s, (ks, 1))
    params_t = _tile_params(params, b, ks)
    axes_t = _params_axes(params_t)
    cost_t = jax.vmap(risk_sensitive_cost, in_axes=(axes_t, 0, 0, 0))
    means, cv = rollout_batched(cache, x0s_t, u_c, delta=delta,
                                frozen_cov_diag=cov_t)
    j = cost_t(params_t, means, cv, u_c)
    j = jnp.where(jnp.isfinite(j), j, jnp.inf).reshape(ks, b)
    return u_c.reshape(ks, b, horizon, action_dim_u), j


@_functools.partial(jax.jit, static_argnames=(
    'state_dim', 'action_dim', 'delta', 'shift_set', 'smooth_iters'))
def _shift_score(gp, x0s, params, u_inc, lb, ub, smooth_solver,
                 state_dim, action_dim, delta, shift_set, smooth_iters,
                 extra_cands=None):
    """Jitted program C of the retired recipe: propose the incumbent's
    time-shifted profiles (plus optional extra candidates, e.g. NEIGHBOR
    incumbents — see solve_batch_multistart_retired's neighbor exchange),
    frozen-smooth the seams (`smooth_iters` cheap iterations — a raw
    proposal's score can bury one that wins after refinement), and score
    everything under the full objective.

    extra_cands: optional (Ke, B, H, da) additional per-lane proposals.
    Returns (u_sh (Ks, B, H, da) smoothed candidates incl. the incumbent at
    index 0, j_pre (Ks, B) finite-guarded full-objective scores)."""
    b, horizon, action_dim_u = u_inc.shape
    cache = build_rollout_cache(gp, state_dim, action_dim)
    parts = [u_inc] + [_shift_u_batch(u_inc, kk) for kk in shift_set]
    if extra_cands is not None:
        parts.extend(extra_cands[k] for k in range(extra_cands.shape[0]))
    ks = len(parts)
    u_sh = jnp.concatenate(parts, axis=0)                     # (Ks*B, H, da)
    params_s = _tile_params(params, b, ks)
    x0s_s = jnp.tile(x0s, (ks, 1))
    axes_s = _params_axes(params_s)
    cost_s = jax.vmap(risk_sensitive_cost, in_axes=(axes_s, 0, 0, 0))

    def objective_full_s(u):
        means, covs = rollout_batched(cache, x0s_s, u, delta=delta)
        return cost_s(params_s, means, covs, u)

    if smooth_iters > 0:
        _, covs_sh = rollout_batched(cache, x0s_s, u_sh, delta=delta)
        cov_sh = jax.lax.stop_gradient(
            jnp.diagonal(covs_sh, axis1=2, axis2=3))

        def objective_frozen_s(u):
            means, cv = rollout_batched(cache, x0s_s, u, delta=delta,
                                        frozen_cov_diag=cov_sh)
            return cost_s(params_s, means, cv, u)

        u_sh = solve_trajectory_batched(
            objective_frozen_s, u_sh, lb, ub,
            smooth_solver.replace(max_iters=smooth_iters)).u

    j_pre = objective_full_s(u_sh).reshape(ks, b)
    j_pre = jnp.where(jnp.isfinite(j_pre), j_pre, jnp.inf)
    return u_sh.reshape(ks, b, horizon, action_dim_u), j_pre


def solve_batch_multistart_retired(
        gp: GPState, state_dim: int, action_dim: int,
        x0s: jax.Array, params: CostParams, horizon: int,
        lb, ub,
        solver: SolverConfig = SolverConfig(),
        n_starts: int = 8,
        prune_to: int = 4,
        surrogate: Optional[SolverConfig] = None,
        surrogate_mode: str = 'frozen',
        frozen_rounds: int = 3,
        start_scale: float = 0.6,
        seed: int = 0,
        delta: bool = False,
        n_zero_starts: int = 0,
        zero_jitter: float = 0.02,
        extra_starts: Optional[jax.Array] = None,
        budget1: int = 24,
        tail_divisor: int = 4,
        shift_set: tuple = (1, -1, 2, -2),
        shift_iters: int = 32,
        shift_top: int = 2,
        shift_smooth_iters: int = 8,
        shift_margin: float = 0.005,
        shift_lanes_per_chunk: Optional[int] = None,
        shift_rounds: int = 1,
        shift_max_lanes: Optional[int] = None,
        neighbor_set: int = 0,
        neighbor_shifted: int = 0,
        propose_smoothed: bool = False,
        polish_lanes: int = 0,
        polish_iters: int = 96,
        refine_frozen_rounds: int = 0,
        refine_frozen_iters: int = 16,
        pregate: bool = True,
        prefilter: int = 4,
        rescue_lanes: int = 0,
        rescue_starts: int = 6,
        rescue_iters: int = 48,
        rescue_scale: float = 0.9,
        diag: Optional[dict] = None) -> SolveResult:
    """The multistart production recipe with CONVERGED-LANE RETIREMENT — the
    round-5 composition of solve_batch_multistart and solve_batch_staged
    (VERDICT r4 item 1). Host-orchestrated; four compiled programs.

    Where the in-jit recipe (solve_batch_multistart) spends its two expensive
    phases at full lockstep width regardless of per-lane state, this driver
    retires lanes as soon as they stop needing budget:

      A. phase-0 basin selection + `budget1` full-refinement iterations at
         full width B (jitted; identical math to the in-jit recipe);
      B. lanes NOT self-terminated after budget1 are GATHERED into compacted
         chunks of B // tail_divisor and continued warm-started up to the
         full `solver.max_iters` budget — converged lanes stop paying;
      C. shift proposal for ALL lanes (cheap: frozen seam-smoothing + one
         full forward score — the candidate generation of the round-4
         time-shift tail fix);
      D. the expensive `shift_iters` full-objective shift refinement runs
         ONLY for lanes where some smoothed shift scores within
         `shift_margin` (relative, 1+|cost| normalized) of the incumbent —
         measured, most lanes' shifts score far worse and were paying the
         full refinement for nothing. Selected lanes refine their
         `shift_top` best candidates in chunks sized so program D reuses
         program B's compiled shape. C+D iterate up to `shift_rounds` times
         (a basin jump can expose a further profitable shift); rounds stop
         early when no lane improves.

    Round-5 additions:
      - `pregate` (default True): the per-lane candidate set is first cut
        from Ks to 1 + `prefilter` by cheap frozen-objective scores of the
        RAW candidates (program C0, _frozen_pre_score: one full-covariance
        rollout at width B), and the smoothing + full-objective scoring of
        the original C runs at the reduced width; the gate and ranking then
        use SMOOTHED FULL scores exactly as in the legacy path. (Gating
        LANES on raw frozen scores instead was measured to nullify the
        neighbor exchange — see the in-loop comment.)
      - `rescue_lanes` > 0: a TAIL-RESCUE phase between the exchange rounds
        and the polish — the top neighborhood-cost-outlier lanes get
        `rescue_starts` fresh wide draws refined under the full objective at
        compacted width (see the phase comment for the basin-floor evidence).

    A lane's final result can never be worse than its phase-A/B incumbent:
    shift/rescue replacements apply only on strict cost improvement (the
    advisor-r4 incumbent guarantee holds by construction).
    """
    import numpy as np

    b = x0s.shape[0]
    if surrogate is None:
        surrogate = solver.replace(
            max_iters=(16 if surrogate_mode == 'frozen' else 80), tol=1e-3)
    budget1 = min(budget1, solver.max_iters)
    lb_j = jnp.asarray(lb, x0s.dtype)
    ub_j = jnp.asarray(ub, x0s.dtype)

    res1 = _retired_phase_a(
        gp, x0s, params, lb_j, ub_j, extra_starts,
        solver.replace(max_iters=budget1), surrogate,
        jnp.asarray(start_scale, x0s.dtype),
        jnp.asarray(zero_jitter, x0s.dtype),
        state_dim, action_dim, horizon, surrogate_mode, frozen_rounds,
        n_starts, prune_to, n_zero_starts, delta, seed,
        refine_frozen_rounds, refine_frozen_iters)

    u = np.array(res1.u)
    cost = np.array(res1.cost)
    iters = np.array(res1.iters)
    pg = np.array(res1.pg_norm)
    conv = np.asarray(res1.converged).copy()

    # B: compacted continuation of the unconverged tail (restart semantics —
    # fresh L-BFGS memory — matching solve_batch_staged).
    chunk = max(1, b // tail_divisor)
    todo = np.nonzero(~conv)[0]
    if diag is not None:
        diag['n_tail'] = int(todo.size)
    if todo.size and solver.max_iters > budget1:
        solver2 = solver.replace(max_iters=solver.max_iters - budget1)
        n_pad = (-todo.size) % chunk
        todo_p = np.concatenate([todo, np.full(n_pad, todo[0], todo.dtype)])
        for c0 in range(0, todo_p.size, chunk):
            idx = jnp.asarray(todo_p[c0:c0 + chunk])
            res2 = _refine_chunk(gp, x0s[idx], _gather_params(params, b, idx),
                                 res1.u[idx], lb_j, ub_j, solver2,
                                 state_dim, action_dim, delta)
            idx_np = np.asarray(idx)
            # Padded duplicates recompute the same deterministic result.
            u[idx_np] = np.asarray(res2.u)
            cost[idx_np] = np.asarray(res2.cost)
            iters[idx_np] = budget1 + np.asarray(res2.iters)
            pg[idx_np] = np.asarray(res2.pg_norm)
            conv[idx_np] = np.asarray(res2.converged)

    do_exchange = bool(shift_set) or neighbor_set > 0 or propose_smoothed
    if not do_exchange and not polish_lanes and not rescue_lanes:
        return SolveResult(u=jnp.asarray(u), cost=jnp.asarray(cost),
                           iters=jnp.asarray(iters), pg_norm=jnp.asarray(pg),
                           converged=jnp.asarray(conv))

    # NEIGHBOR EXCHANGE (round-5 basin fix): at B=256, 33/34 of the quality
    # tail's lanes are BASIN misses — their f64-reference profile is not a
    # time shift of the incumbent and no amount of local refinement reaches
    # it (lane_forensics.py on prod_pf_b256). But the batch is a POPULATION
    # of related problems (a gamma sweep x initial-state draw): the basin a
    # lane missed is usually found by a (x0, gamma)-NEIGHBOR. Each shift
    # round therefore also proposes the current incumbents of the
    # `neighbor_set` nearest lanes (z-scored (x0, gamma) metric); iterated
    # rounds let a good basin PROPAGATE through the neighborhood graph.
    nbr_idx = None
    if neighbor_set > 0 and b > 1:
        feats = [np.asarray(x0s, np.float64)]
        g = params.gamma
        if hasattr(g, 'ndim') and getattr(g, 'ndim', 0) == 1:
            feats.append(np.asarray(g, np.float64)[:, None])
        f = np.concatenate(feats, axis=1)
        f = (f - f.mean(0)) / (f.std(0) + 1e-12)
        d2 = ((f[:, None] - f[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        m = min(neighbor_set, b - 1)
        nbr_idx = np.argsort(d2, axis=1)[:, :m]              # (B, M)

    # C + D, iterated until dry (shift_rounds cap): a lane whose incumbent
    # just JUMPED basins via a shift can expose a further profitable shift
    # (switch-time misalignment can be >2 steps — outside shift_set's reach
    # in one application); re-proposing from the updated incumbents is cheap
    # because round r >= 2 admits only lanes still showing improving shifts.
    def _np_shift(uu, kk):
        # (M, B, H, da) or (B, H, da) whole-profile time shift, numpy.
        if kk > 0:
            return np.concatenate(
                [np.repeat(uu[..., :1, :], kk, axis=-2), uu[..., :-kk, :]],
                axis=-2)
        kk = -kk
        return np.concatenate(
            [uu[..., kk:, :], np.repeat(uu[..., -1:, :], kk, axis=-2)],
            axis=-2)

    def _proposals(u_now):
        """(Ke, B, H, da) extra candidates: neighbor incumbents + time-shifted
        copies of the nearest `neighbor_shifted` ones (a neighbor's basin
        usually needs a 1-step switch-time adjustment at a different x0) +
        optionally a SMOOTHED incumbent (3-tap moving average: bang-bang
        profiles stuck with a spurious pulse de-pulse into the neighboring
        smooth basin — observed on the headline stubborn lanes)."""
        parts = []
        if nbr_idx is not None:
            u_nbr = u_now[nbr_idx.T]                          # (M, B, H, da)
            parts.append(u_nbr)
            for m in range(min(neighbor_shifted, u_nbr.shape[0])):
                parts.append(_np_shift(u_nbr[m:m + 1], 1))
                parts.append(_np_shift(u_nbr[m:m + 1], -1))
        if propose_smoothed:
            pad = np.concatenate([u_now[:, :1], u_now, u_now[:, -1:]], axis=1)
            sm = (pad[:, :-2] + pad[:, 1:-1] + pad[:, 2:]) / 3.0
            parts.append(sm[None])
        if not parts:
            return None
        return jnp.asarray(np.concatenate(parts, axis=0))

    n_extra = int(propose_smoothed)
    if nbr_idx is not None:
        n_extra += nbr_idx.shape[1] + 2 * min(neighbor_shifted,
                                              nbr_idx.shape[1])
    shift_top = min(shift_top, 1 + len(shift_set) + n_extra)
    # Default chunking makes program D's batch width equal program B's
    # (chunk) so one compiled refinement program can serve both phases;
    # measured on TPU the shift-gate admission is ~20% of lanes
    # (phase_probe.json), so callers typically set shift_lanes_per_chunk
    # to cover the admitted set in ONE dispatch (width scaling is
    # sub-linear — one wide dispatch beats several narrow ones by the
    # ~30 ms/dispatch tunnel overhead).
    lanes_per_chunk = (shift_lanes_per_chunk
                       or max(1, chunk // shift_top))
    prev_u = None
    for rnd in range(shift_rounds if do_exchange else 0):
        extra = _proposals(u)
        # C: score every lane's proposals. With pregate (round-5 default) the
        # CANDIDATE SET is first cut from Ks to 1 + `prefilter` per lane by
        # cheap frozen-objective scores of the raw candidates (program C0:
        # every candidate borrows its incumbent's covariance, so the O(N^2)
        # variance prop runs once at width B), and the expensive smoothing +
        # full-objective scoring stage runs at the reduced width. The gate,
        # candidate ranking, and margins then operate on SMOOTHED FULL
        # scores exactly as in the legacy path — a first cut that gated
        # LANES on raw frozen scores was measured to nullify the neighbor
        # exchange entirely (raw basin-different proposals score far off
        # before smoothing; quality_retired.json commit 51a46d6: n_gt1pct
        # 17 -> 51). Per-lane top-P keeps every lane's best-looking
        # proposals in play while dropping the ~2/3 that score hopeless.
        if pregate:
            u_all, j0 = _frozen_pre_score(
                gp, x0s, params, jnp.asarray(u), state_dim, action_dim,
                delta, tuple(shift_set), extra)
            u_all = np.asarray(u_all)                         # (Ks, B, ...)
            j0 = np.asarray(j0)
            p_keep = min(prefilter, j0.shape[0] - 1)
            order0 = np.argsort(j0[1:], axis=0)[:p_keep]      # (P, B)
            cand = u_all[1:][order0, np.arange(b)[None]]      # (P, B, H, da)
            u_sh, j_pre = _shift_score(gp, x0s, params, jnp.asarray(u), lb_j,
                                       ub_j, solver, state_dim, action_dim,
                                       delta, (), shift_smooth_iters,
                                       jnp.asarray(cand))
        else:
            u_sh, j_pre = _shift_score(gp, x0s, params, jnp.asarray(u), lb_j,
                                       ub_j, solver, state_dim, action_dim,
                                       delta, tuple(shift_set),
                                       shift_smooth_iters, extra)
        u_sh_all = np.asarray(u_sh)                       # (Ks', B, H, da)
        j_all = np.asarray(j_pre)                         # (Ks', B)
        j_gate = j_all
        margin = shift_margin * (1.0 + np.abs(cost))

        # D-gate: only lanes where some candidate scores within the margin of
        # the incumbent pay the precise stage + full refinement. (The
        # incumbent's own score, j_gate[0], is excluded: it is always ~cost.)
        # Rounds >= 1 additionally require FRESH EVIDENCE: the lane's own
        # incumbent or one of its neighbors' moved last round — otherwise a
        # marginal-scoring proposal that already failed refinement re-admits
        # the lane every round (measured: ~80 re-admissions/round at B=256
        # with no quality gain).
        gate = np.min(j_gate[1:], axis=0) < cost + margin
        if prev_u is not None:
            changed = np.any(np.abs(u - prev_u) > 1e-6, axis=(1, 2))  # (B,)
            fresh = changed.copy()
            if nbr_idx is not None:
                fresh |= np.any(changed[nbr_idx], axis=1)
            gate &= fresh
        prev_u = u.copy()
        worthy = np.nonzero(gate)[0]
        # Per-round refinement cap, ranked by PREDICTED GAIN (incumbent cost
        # minus best proposal score, relative): the quality metric's tail
        # lanes carry percent-scale gaps and rank first, so a fixed
        # per-round budget repairs the tail before spending on micro-gains.
        if shift_max_lanes and worthy.size > shift_max_lanes:
            gain = (cost[worthy] - np.min(j_gate[1:, worthy], axis=0)) \
                / (1.0 + np.abs(cost[worthy]))
            worthy = worthy[np.argsort(-gain)[:shift_max_lanes]]
        if diag is not None:
            diag[f'n_shift_worthy_r{rnd}'] = int(worthy.size)
            if rnd == 0:
                diag['n_shift_worthy'] = int(worthy.size)
        if not worthy.size:
            break
        solver_d = solver.replace(max_iters=shift_iters)
        n_pad = (-worthy.size) % lanes_per_chunk
        worthy_p = np.concatenate(
            [worthy, np.full(n_pad, worthy[0], worthy.dtype)])
        u_cands = u_sh_all[:, worthy_p]
        j_cands = j_all[:, worthy_p]
        shift_top_e = min(shift_top, j_cands.shape[0])
        n_improved = 0
        for c0 in range(0, worthy_p.size, lanes_per_chunk):
            loc = np.arange(c0, min(c0 + lanes_per_chunk, worthy_p.size))
            lanes = worthy_p[loc]                             # (L,)
            j_loc = j_cands[:, loc]
            order = np.argsort(j_loc, axis=0)[:shift_top_e]   # (T, L)
            u_init_c = u_cands[order, loc[None, :]].reshape(
                shift_top_e * lanes.size, horizon, action_dim)
            idx_t = jnp.asarray(np.tile(lanes, shift_top_e))
            res_d = _refine_chunk(gp, x0s[idx_t],
                                  _gather_params(params, b, idx_t),
                                  jnp.asarray(u_init_c), lb_j, ub_j, solver_d,
                                  state_dim, action_dim, delta)
            j_d = np.asarray(res_d.cost).reshape(shift_top_e, lanes.size)
            j_d = np.where(np.isfinite(j_d), j_d, np.inf)
            best_t = np.argmin(j_d, axis=0)                   # (L,)
            j_best = j_d[best_t, np.arange(lanes.size)]
            u_d = np.asarray(res_d.u).reshape(
                shift_top_e, lanes.size, horizon, action_dim)
            improve = j_best < cost[lanes]
            upd = lanes[improve]
            n_improved += int(improve.sum())
            u[upd] = u_d[best_t[improve], np.nonzero(improve)[0]]
            cost[upd] = j_best[improve]
            iters[lanes] = iters[lanes] + np.asarray(res_d.iters).reshape(
                shift_top_e, lanes.size).max(axis=0)
        if n_improved == 0:
            break

    # TAIL RESCUE (round-5 basin floor fix): the residual >1% tail is
    # basin-search-limited — diverse expensive configs miss DIFFERENT lanes
    # and their per-lane ensemble-min nearly closes the tail
    # (QUALITY_NOTES_r05 §4). Lanes that missed their basin advertise
    # themselves as NEIGHBORHOOD COST OUTLIERS: cost sitting above the
    # (x0, gamma)-neighborhood median after the exchange rounds have
    # propagated good basins. Give the top `rescue_lanes` outliers
    # `rescue_starts` fresh wide draws (+ u = 0 and the incumbent as guards)
    # and refine ALL of them under the full objective at compacted width;
    # accept per lane on strict improvement only.
    if rescue_lanes > 0 and b > 1:
        if nbr_idx is None:
            feats = [np.asarray(x0s, np.float64)]
            g = params.gamma
            if hasattr(g, 'ndim') and getattr(g, 'ndim', 0) == 1:
                feats.append(np.asarray(g, np.float64)[:, None])
            f = np.concatenate(feats, axis=1)
            f = (f - f.mean(0)) / (f.std(0) + 1e-12)
            d2 = ((f[:, None] - f[None]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            nbr_idx = np.argsort(d2, axis=1)[:, :min(6, b - 1)]
        med = np.median(cost[nbr_idx], axis=1)
        proxy = (cost - med) / (1.0 + np.abs(cost))
        n_r = min(rescue_lanes, b)
        sel = np.argsort(-proxy)[:n_r]
        sel = sel[proxy[sel] > 1e-4]          # only genuine outliers pay
        if diag is not None:
            diag['n_rescue'] = int(sel.size)
        if sel.size:
            sel_p = np.concatenate(
                [sel, np.full(n_r - sel.size, sel[0], sel.dtype)])
            kr = rescue_starts + 2 + min(2, nbr_idx.shape[1])
            # starts: incumbent, u = 0, best <=2 neighbor incumbents, draws
            rngr = np.random.default_rng(seed + 7919)
            dt_np = np.asarray(x0s).dtype
            lo = np.broadcast_to(np.asarray(lb, dt_np),
                                 (horizon, action_dim))
            hi = np.broadcast_to(np.asarray(ub, dt_np),
                                 (horizon, action_dim))
            mid, span = 0.5 * (lo + hi), 0.5 * (hi - lo)
            draws = mid + rescue_scale * span * rngr.uniform(
                -1.0, 1.0, (rescue_starts, n_r, horizon, action_dim))
            # Best two neighbors' incumbents as DIRECT starts: the exchange
            # phase only reaches a neighbor's basin through smoothing +
            # scoring; full refinement from the raw neighbor profile is a
            # different (and sometimes the only successful) descent path.
            n_nb = min(2, nbr_idx.shape[1])
            nb_cost = cost[nbr_idx[sel_p]]                    # (nr, M)
            nb_rank = np.argsort(nb_cost, axis=1)[:, :n_nb]
            nb_starts = u[nbr_idx[sel_p][np.arange(n_r)[:, None],
                                         nb_rank]]           # (nr, n_nb, ...)
            starts = np.concatenate(
                [u[sel_p][None],
                 np.zeros((1, n_r, horizon, action_dim)),
                 np.swapaxes(nb_starts, 0, 1),
                 draws], axis=0).astype(dt_np)                # (kr, nr, H, da)
            solver_r = solver.replace(max_iters=rescue_iters)
            idx_t = jnp.asarray(np.tile(sel_p, kr))
            res_r = _refine_chunk(
                gp, x0s[idx_t], _gather_params(params, b, idx_t),
                jnp.asarray(starts.reshape(kr * n_r, horizon, action_dim)),
                lb_j, ub_j, solver_r, state_dim, action_dim, delta)
            j_r = np.asarray(res_r.cost).reshape(kr, n_r)
            j_r = np.where(np.isfinite(j_r), j_r, np.inf)
            best_k = np.argmin(j_r, axis=0)
            j_best = j_r[best_k, np.arange(n_r)]
            u_r = np.asarray(res_r.u).reshape(kr, n_r, horizon, action_dim)
            improve = j_best < cost[sel_p]
            upd = sel_p[improve]
            u[upd] = u_r[best_k[improve], np.nonzero(improve)[0]]
            cost[upd] = j_best[improve]
            iters[sel_p] = iters[sel_p] + np.asarray(res_r.iters).reshape(
                kr, n_r).max(axis=0)

    # FINAL POLISH (round-5 valley fix): some lanes stall far above their
    # basin floor — measured: warm f64 refinement from the f32 incumbent
    # fully closes ~40% of the >1% tail, i.e. the f32 noise-tolerant descent
    # quits a long curved valley early, not a basin problem. The lanes that
    # need it advertise themselves: projected-gradient residual still large.
    # Extend the top `polish_lanes` by pg_norm (unconverged first) with
    # `polish_iters` warm-started full iterations at compacted width.
    if polish_lanes > 0:
        # Unconverged lanes first, then by residual size.
        rank = np.where(np.isfinite(pg), pg, 0.0) \
            + 1e6 * (~conv).astype(np.float64)
        order = np.argsort(-rank)
        sel = order[:min(polish_lanes, b)]
        if diag is not None:
            diag['n_polish'] = int(sel.size)
        solver_p = solver.replace(max_iters=polish_iters)
        lanes_pc = shift_lanes_per_chunk or chunk
        n_pad = (-sel.size) % lanes_pc
        sel_p = np.concatenate([sel, np.full(n_pad, sel[0], sel.dtype)])
        for c0 in range(0, sel_p.size, lanes_pc):
            lanes = sel_p[c0:c0 + lanes_pc]
            idx = jnp.asarray(lanes)
            res_p = _refine_chunk(gp, x0s[idx], _gather_params(params, b, idx),
                                  jnp.asarray(u[lanes]), lb_j, ub_j, solver_p,
                                  state_dim, action_dim, delta)
            j_p = np.asarray(res_p.cost)
            j_p = np.where(np.isfinite(j_p), j_p, np.inf)
            improve = j_p < cost[lanes]
            upd = lanes[improve]
            u[upd] = np.asarray(res_p.u)[improve]
            cost[upd] = j_p[improve]
            pg[lanes] = np.asarray(res_p.pg_norm)
            conv[lanes] = np.asarray(res_p.converged)
            iters[lanes] = iters[lanes] + np.asarray(res_p.iters)

    return SolveResult(u=jnp.asarray(u), cost=jnp.asarray(cost),
                       iters=jnp.asarray(iters), pg_norm=jnp.asarray(pg),
                       converged=jnp.asarray(conv))


def _gather_params(params: CostParams, b: int, idx) -> CostParams:
    """Gather the per-scenario ((B,)-leading, rank-detected) leaves of
    `params` at `idx`; shared leaves pass through."""
    batched = _is_batched_leaves(params)

    def leaf(v, is_b):
        return v[idx] if is_b else v

    return jax.tree.map(leaf, params, batched,
                        is_leaf=lambda v: v is None)


def solve_batch_staged(gp: GPState, state_dim: int, action_dim: int,
                       x0s: jax.Array, params: CostParams, horizon: int,
                       lb, ub,
                       solver: SolverConfig = SolverConfig(),
                       budget1: int = 48,
                       budget_total: int = 320,
                       tail_divisor: int = 4,
                       full_cov: bool = False,
                       delta: bool = False) -> SolveResult:
    """Two-phase adaptive-budget batched solve (host-orchestrated).

    The lockstep batched solver's per-iteration cost scales with the live
    batch width, but lanes converge at very different speeds (the iteration
    histogram at the reference's tol 1e-4 is long-tailed). Running every lane
    to the reference budget wastes most of the fleet's cycles on frozen
    lanes, so: phase 1 runs all B lanes for `budget1` iterations; the lanes
    that have not self-terminated are then GATHERED into compacted chunks of
    B // tail_divisor and continued warm-started (fresh L-BFGS memory —
    restart semantics) up to `budget_total` total iterations. Tail lanes pay
    1/tail_divisor of the full-batch per-iteration cost, so total compute ~
    budget1 + (tail fraction) * (budget_total - budget1) full-batch
    iteration-equivalents while every lane still gets the reference budget
    semantics (tol 1e-4, max ~300 iterations, reference mpc.py:308-324).

    Two device round-trips (the convergence mask, the final scatter); the
    phase-2 chunk shape is fixed, so exactly two programs compile. Requires
    the fused lockstep path (solver.method='lbfgs').
    """
    import numpy as np

    b = x0s.shape[0]
    chunk = max(1, b // tail_divisor)
    s1 = solver.replace(max_iters=budget1)
    res1 = solve_batch(gp, state_dim, action_dim, x0s, params, horizon,
                       lb, ub, s1, full_cov=full_cov, delta=delta)
    conv = np.asarray(res1.converged)
    todo = np.nonzero(~conv)[0]
    if todo.size == 0:
        return res1

    u = np.array(res1.u)
    cost = np.array(res1.cost)
    iters = np.array(res1.iters)
    pg = np.array(res1.pg_norm)
    conv_out = conv.copy()

    s2 = solver.replace(max_iters=budget_total - budget1)
    # Pad the tail to a whole number of chunks by repeating the first
    # unconverged lane: duplicates recompute the same deterministic result.
    n_pad = (-todo.size) % chunk
    todo_p = np.concatenate([todo, np.full(n_pad, todo[0], todo.dtype)])
    for c0 in range(0, todo_p.size, chunk):
        idx = jnp.asarray(todo_p[c0:c0 + chunk])
        res2 = solve_batch(gp, state_dim, action_dim, x0s[idx],
                           _gather_params(params, b, idx), horizon, lb, ub,
                           s2, u_init=res1.u[idx], full_cov=full_cov,
                           delta=delta)
        idx_np = np.asarray(idx)
        u[idx_np] = np.asarray(res2.u)
        cost[idx_np] = np.asarray(res2.cost)
        iters[idx_np] = budget1 + np.asarray(res2.iters)
        pg[idx_np] = np.asarray(res2.pg_norm)
        conv_out[idx_np] = np.asarray(res2.converged)

    return SolveResult(u=jnp.asarray(u), cost=jnp.asarray(cost),
                       iters=jnp.asarray(iters), pg_norm=jnp.asarray(pg),
                       converged=jnp.asarray(conv_out))


def solve_batch_sharded(mesh, gp: GPState, state_dim: int, action_dim: int,
                        x0s: jax.Array, params: CostParams, horizon: int,
                        lb, ub, solver: SolverConfig = SolverConfig(),
                        full_cov: bool = False, delta: bool = False,
                        impl: str = 'auto',
                        axis: str = 'batch') -> SolveResult:
    """Multi-chip scenario fan-out: `solve_batch` under shard_map over the
    mesh's batch axis.

    NamedSharding alone cannot partition this program — the fused path's
    Pallas kernels are opaque custom calls XLA's SPMD partitioner would have
    to replicate — so the batch axis is split EXPLICITLY: each device runs the
    whole solve on its local B/n_devices scenario shard against the replicated
    GP posterior. Solves are independent, so no collectives are needed (the
    scaling-efficiency ceiling is pure DP; ICI stays idle by design).

    B must be divisible by the mesh's batch-axis size. Per-scenario leaves of
    `params` (leading dim == B) are sharded; shared leaves are replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map            # jax >= 0.4.35
    except ImportError:                      # pragma: no cover
        from jax.experimental.shard_map import shard_map

    b = x0s.shape[0]
    n_dev = mesh.shape[axis]
    if b % n_dev != 0:
        raise ValueError(f"batch {b} not divisible by mesh axis size {n_dev}")

    batched_leaves = _is_batched_leaves(params)
    params_spec = jax.tree.map(lambda v, is_b: P(axis) if is_b else P(),
                               params, batched_leaves,
                               is_leaf=lambda v: v is None)
    gp_spec = jax.tree.map(lambda _: P(), gp)

    def local_solve(gp, x0s, params):
        return solve_batch(gp, state_dim, action_dim, x0s, params, horizon,
                           lb, ub, solver, full_cov=full_cov, delta=delta,
                           impl=impl)

    # Disable the varying-manual-axes / replication checker: the solve mixes
    # replicated operands (the GP cache) into per-shard scan carries, which
    # the static checker cannot type without pcast annotations throughout.
    # The computation is embarrassingly parallel — no collectives to get wrong.
    import inspect
    kwargs = {}
    sig = inspect.signature(shard_map)
    if 'check_vma' in sig.parameters:
        kwargs['check_vma'] = False
    elif 'check_rep' in sig.parameters:
        kwargs['check_rep'] = False
    fn = shard_map(local_solve, mesh=mesh,
                   in_specs=(gp_spec, P(axis), params_spec),
                   out_specs=P(axis), **kwargs)
    return fn(gp, x0s, params)


def solve_batch_gp(gps: GPState, state_dim: int, action_dim: int,
                   x0s: jax.Array, params: CostParams, horizon: int,
                   lb, ub, solver: SolverConfig = SolverConfig(),
                   full_cov: bool = False) -> SolveResult:
    """B solves, each against its OWN GP draw (gps has a leading (B,) axis on
    every array leaf — see stack_gps). The Monte-Carlo hyperparameter config
    of BASELINE.json (config 5)."""
    b = x0s.shape[0]
    u_init = jnp.zeros((b, horizon, action_dim), x0s.dtype)

    def one(gp, x0, u0, gamma):
        cache = build_rollout_cache(gp, state_dim, action_dim)
        p = params._replace(gamma=gamma)
        return _single_solve(cache, p, x0, u0, lb, ub, solver, full_cov)

    gamma = params.gamma
    gamma_axis = 0 if (hasattr(gamma, 'ndim') and gamma.ndim == 1) else None
    gamma_b = gamma if gamma_axis == 0 else jnp.broadcast_to(gamma, (b,))
    return jax.vmap(one, in_axes=(0, 0, 0, 0))(gps, x0s, u_init, gamma_b)


def stack_gps(gp_list) -> GPState:
    """Stack GPStates (same config/shapes) into one with a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *gp_list)

"""Jitted box-constrained trajectory optimizer — the TPU-native replacement for
the reference's CPU IPOPT callback loop (mpc.py:269-330).

The reference already runs IPOPT deliberately degraded — line search disabled,
tol 1e-4, max_iter 300 (mpc.py:308-320) — i.e. it is used as a bounded-budget
first-order-ish descender. Here the solve is a single jitted `lax.while_loop` of
projected-Adam steps with the same budget semantics:

  - gradients come from `jax.grad` through the scan rollout + cost (the
    reference pays a Python<->C++ callback and a device sync per IPOPT iterate,
    SURVEY.md §3.2; here the whole solve stays on device),
  - box constraints are handled by projection (clip) — the reference has box
    bounds only, no state constraints (mpc.py:257-267, README.md:18),
  - convergence is declared on the projected-gradient residual
    ||u - clip(u - grad)||_inf < tol, the first-order optimality condition for
    box-constrained problems,
  - the whole solver is vmappable: thousands of independent solves batch across
    a mesh (see gpmpc_tpu.parallel).

Cold start at u = 0 mirrors the reference (mpc.py:292-293, which notes that
warm-starting from the previous trajectory caused local-minima issues); warm
starting is still available via `u_init`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from gpmpc_tpu.utils.linalg import f32_matmul_precision


@struct.dataclass
class SolverConfig:
    # 'lbfgs': projected L-BFGS with projected-Armijo backtracking (default —
    #          converges in tens of iterations and resolves flat directions the
    #          first-order method leaves behind).
    # 'adam':  projected Adam with a fixed step (the bounded-budget descender;
    #          closest in spirit to the reference's line-search-disabled IPOPT).
    method: str = struct.field(pytree_node=False, default='lbfgs')
    max_iters: int = struct.field(pytree_node=False, default=300)
    tol: float = struct.field(pytree_node=False, default=1e-4)
    learning_rate: float = struct.field(pytree_node=False, default=0.1)
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)
    # L-BFGS options.
    history: int = struct.field(pytree_node=False, default=8)
    max_backtracks: int = struct.field(pytree_node=False, default=20)
    # Nonmonotone Armijo window (Grippo-style): accept against the max of the
    # last `nonmonotone` accepted objective values instead of the current one.
    # 0 = monotone (classic). Nonmonotone acceptance lets L-BFGS traverse the
    # curved valleys of the risk-sensitive cost without collapsing the step
    # size — it cuts tail-lane iteration counts on the headline workload.
    nonmonotone: int = struct.field(pytree_node=False, default=0)
    # Relative objective-evaluation noise (Berahas-Byrd-Nocedal-style
    # noise-tolerant Armijo). The f32 uncertain rollout is chaotic: per-step
    # rounding (~1e-6 relative) amplifies through the H-step recurrence to
    # ~3e-3 relative objective noise (measured on the headline workload;
    # more with the bf16x3 kernel dots). With the default noise floor
    # (16 eps) the line search rejects every candidate whose true decrease
    # sits below the noise, underflows, and falsely declares stalled lanes
    # stationary — the round-2 quality gap (p90 cost excess 27% at 300
    # iterations, all "converged"). Setting noise_rel to the measured noise
    # accepts noise-neutral descent steps; termination then comes from the
    # no-progress window below, not step-size underflow.
    noise_rel: float = struct.field(pytree_node=False, default=0.0)
    # With noise_rel > 0: declare a lane done when its best objective has not
    # improved by more than the noise in this many consecutive iterations.
    progress_window: int = struct.field(pytree_node=False, default=12)
    # Final polishing: a few projected-gradient steps with decaying step size to
    # tighten boundary activity (useful after Adam; rarely needed for L-BFGS).
    polish_iters: int = struct.field(pytree_node=False, default=0)


class SolveResult(NamedTuple):
    u: jax.Array          # (H, da) optimal action trajectory
    cost: jax.Array       # () objective at u
    iters: jax.Array      # () iterations taken
    pg_norm: jax.Array    # () final projected-gradient residual (inf-norm)
    # True where the solve terminated on its own (tolerance reached, or
    # stationary at the arithmetic noise floor) rather than on the iteration
    # cap — the lanes a staged solve does NOT need to continue. None on
    # solver paths that predate the field.
    converged: Optional[jax.Array] = None


def solve_trajectory(objective: Callable[[jax.Array], jax.Array],
                     u_init: jax.Array, lb: jax.Array, ub: jax.Array,
                     config: SolverConfig = SolverConfig()) -> SolveResult:
    """Minimize `objective(u)` over the box [lb, ub] (broadcast against u).

    objective: (H, da) -> scalar, jax-differentiable.
    """
    if config.method == 'lbfgs':
        return _solve_lbfgs(objective, u_init, lb, ub, config)
    return _solve_adam(objective, u_init, lb, ub, config)


@f32_matmul_precision
def _solve_lbfgs(objective, u_init, lb, ub, config: SolverConfig) -> SolveResult:
    """Projected L-BFGS: two-loop recursion over a fixed-size history with
    projected-Armijo backtracking — the jitted, vmappable equivalent of the
    native box solver (native/box_solver.cpp) and of the role IPOPT plays in
    the reference. History buffers are static-shape (mem, n) with an
    oldest-to-newest shift on insert, so the whole solve is one lax.while_loop.
    """
    dt = u_init.dtype
    shape = u_init.shape
    n = u_init.size
    mem = config.history
    lb_f = jnp.broadcast_to(jnp.asarray(lb, dt), shape).ravel()
    ub_f = jnp.broadcast_to(jnp.asarray(ub, dt), shape).ravel()

    def f_flat(u):
        return objective(u.reshape(shape))

    vg = jax.value_and_grad(f_flat)

    def proj(u):
        return jnp.clip(u, lb_f, ub_f)

    def pg_res(u, g):
        return jnp.max(jnp.abs(u - proj(u - g)))

    def two_loop(g, s_h, y_h, rho_h, hlen):
        q = g
        alphas = jnp.zeros((mem,), dt)
        # newest entries live at the END of the history buffers
        for k in range(mem - 1, -1, -1):
            valid = k >= mem - hlen
            a = rho_h[k] * jnp.dot(s_h[k], q)
            a = jnp.where(valid, a, 0.0)
            alphas = alphas.at[k].set(a)
            q = q - a * y_h[k]
        sy = jnp.dot(s_h[mem - 1], y_h[mem - 1])
        yy = jnp.dot(y_h[mem - 1], y_h[mem - 1])
        scale = jnp.where(jnp.logical_and(hlen > 0, yy > 0.0),
                          sy / jnp.maximum(yy, 1e-30), 1.0)
        r = scale * q
        for k in range(mem):
            valid = k >= mem - hlen
            b = rho_h[k] * jnp.dot(y_h[k], r)
            b = jnp.where(valid, b, 0.0)
            r = r + (alphas[k] - b) * s_h[k]
        return r

    nm = config.nonmonotone
    noise = config.noise_rel

    def cond(carry):
        (u, f, fhist, g, t_ls, s_h, y_h, rho_h, hlen, resets, f_best,
         u_best, no_prog, t, done) = carry
        return jnp.logical_and(t < config.max_iters, jnp.logical_not(done))

    def body(carry):
        # One objective evaluation + one gradient per iteration: instead of an
        # inner backtracking loop (whose nested control flow also made the
        # remote TPU compile pathologically slow), Armijo tests a single
        # candidate at the carried step size t_ls — interpolated down on
        # rejection, doubled (capped) on acceptance; see the step-size policy
        # comment below. A rejected iteration costs one forward pass and
        # retries with the smaller step.
        (u, f, fhist, g, t_ls, s_h, y_h, rho_h, hlen, resets, f_best,
         u_best, no_prog, t, _) = carry
        # Two-metric projection (Gafni-Bertsekas): quasi-Newton directions are
        # built from the FREE gradient only; bound-active coordinates (at the
        # bound with the gradient pushing outward) take plain gradient steps
        # that projection handles. Feeding the full gradient to the two-loop
        # lets curvature pairs from clipped steps steer the direction into the
        # active set, where projection annihilates it — the solve then stalls
        # at step-size underflow with free coordinates far from optimal.
        eps_act = 1e-6 * (1.0 + jnp.abs(u))
        act = jnp.logical_or(
            jnp.logical_and(u <= lb_f + eps_act, g > 0.0),
            jnp.logical_and(u >= ub_f - eps_act, g < 0.0))
        gf = jnp.where(act, 0.0, g)
        d = -two_loop(gf, s_h, y_h, rho_h, hlen)
        d = jnp.where(act, -g, d)
        gd = jnp.dot(g, d)
        d = jnp.where(gd < -1e-16, d, -g)          # fall back to steepest

        # ONE value_and_grad per iteration (see solve_trajectory_batched): the
        # candidate's gradient doubles as the next iterate's gradient on
        # acceptance; the carried g stays valid on rejection.
        c1 = 1e-4
        u_try = proj(u + t_ls * d)
        f_try, g_try = vg(u_try)
        dec = jnp.dot(g, u_try - u)
        # Noise-tolerant Armijo: f32 rollouts carry ~eps-relative arithmetic
        # noise; demanding strict decrease below that noise floor halves t_ls
        # to underflow and latches `done` prematurely. Nonmonotone acceptance
        # (config.nonmonotone > 0) tests against the window max.
        f_acc = f if nm == 0 else jnp.max(fhist)
        eps_scale = (2.0 * noise) if noise > 0.0 else 16.0 * jnp.finfo(dt).eps
        eps_f = eps_scale * (1.0 + jnp.abs(f))
        accepted = jnp.logical_and(
            jnp.logical_and(f_try <= f_acc + c1 * dec + eps_f, dec < 0.0),
            jnp.isfinite(f_try))
        u_new = jnp.where(accepted, u_try, u)
        f_new = jnp.where(accepted, f_try, f)
        if nm > 0:
            fhist = jnp.where(accepted,
                              jnp.concatenate([fhist[1:], f_new[None]]), fhist)
        # Step-size policy (measured on the headline quality harness at the
        # 40-iteration budget; see commit message / benchmarks/quality.py):
        #   - growth capped at 4x the unit step: uncapped forward-tracking
        #     overshoots, and the halving recovery wastes the budget
        #     (p50 cost excess 13.7% uncapped vs 2.2% at cap 4);
        #   - rejection backtracks by QUADRATIC INTERPOLATION of
        #     phi(t) = f(proj(u + t d)) through (f, dec, f_try) instead of
        #     blind halving, safeguarded to [0.1, 0.5] t.
        # Flat-direction box traversal (the restart case) still works: the
        # post-restart L-BFGS pairs rebuild the scale within a few iterations.
        denom = f_try - f - dec
        t_q = jnp.where(denom > 0.0,
                        t_ls * (-0.5 * dec) / jnp.where(denom > 0.0, denom, 1.0),
                        0.5 * t_ls)
        t_down = jnp.clip(t_q, 0.1 * t_ls, 0.5 * t_ls)
        t_ls = jnp.where(accepted, jnp.minimum(2.0 * t_ls, 4.0), t_down)

        g_try = jnp.where(jnp.isfinite(g_try), g_try, 0.0)
        g_new = jnp.where(accepted, g_try, g)

        s = u_new - u
        y = g_new - g
        sy = jnp.dot(s, y)
        # Cosine curvature gate: near the arithmetic noise floor, accepted
        # micro-steps produce (s, y) pairs whose inner product is dominated by
        # gradient noise; admitting them poisons the inverse-Hessian metric.
        sy_ok = sy > jnp.maximum(
            1e-12,
            1e-8 * jnp.linalg.norm(s) * jnp.linalg.norm(y))
        keep = jnp.logical_and(accepted, sy_ok)
        s_h2 = jnp.where(keep, jnp.concatenate([s_h[1:], s[None]], 0), s_h)
        y_h2 = jnp.where(keep, jnp.concatenate([y_h[1:], y[None]], 0), y_h)
        rho_h2 = jnp.where(keep,
                           jnp.concatenate([rho_h[1:],
                                            (1.0 / jnp.maximum(sy, 1e-30))[None]]),
                           rho_h)
        hlen2 = jnp.where(keep, jnp.minimum(hlen + 1, mem), hlen)

        # Step underflow means the CURRENT metric cannot make progress — not
        # that the iterate is stationary. Restart from steepest descent
        # (history cleared, t_ls = 1); only a repeated underflow after a
        # restart declares the iterate stationary at the noise floor.
        underflow = t_ls < 1e-10
        restart = jnp.logical_and(underflow, resets < 2)
        hlen2 = jnp.where(restart, 0, hlen2)
        t_ls = jnp.where(restart, 1.0, t_ls)
        resets2 = jnp.where(restart, resets + 1, resets)
        done = jnp.logical_or(pg_res(u_new, g_new) < config.tol,
                              jnp.logical_and(underflow,
                                              jnp.logical_not(restart)))
        if noise > 0.0:
            # Progress-window termination + best-iterate tracking (see
            # solve_trajectory_batched).
            improved = f_new < f_best - noise * (1.0 + jnp.abs(f_best))
            u_best = jnp.where(f_new < f_best, u_new, u_best)
            f_best = jnp.minimum(f_best, f_new)
            no_prog = jnp.where(improved, 0, no_prog + 1)
            done = jnp.logical_or(done, no_prog >= config.progress_window)
        return (u_new, f_new, fhist, g_new, t_ls, s_h2, y_h2, rho_h2, hlen2,
                resets2, f_best, u_best, no_prog, t + 1, done)

    u0 = proj(u_init.ravel())
    f0, g0 = vg(u0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    fhist0 = jnp.broadcast_to(f0, (max(nm, 1),)).astype(dt)
    init = (u0, f0, fhist0, g0, jnp.asarray(1.0, dt),
            jnp.zeros((mem, n), dt), jnp.zeros((mem, n), dt),
            jnp.zeros((mem,), dt), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            f0, u0, jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.asarray(False))
    (u, f, _fh, g, _, _, _, _, _, _, f_best, u_best, _np_, iters,
     done) = jax.lax.while_loop(cond, body, init)
    # pg from the carried gradient — a fresh grad here would inline another
    # full rollout forward+backward into the program.
    if noise > 0.0:
        return SolveResult(u=u_best.reshape(shape), cost=f_best, iters=iters,
                           pg_norm=pg_res(u, g), converged=done)
    return SolveResult(u=u.reshape(shape), cost=f, iters=iters,
                       pg_norm=pg_res(u, g), converged=done)


@f32_matmul_precision
def solve_trajectory_batched(objective_b: Callable[[jax.Array], jax.Array],
                             u_init: jax.Array, lb, ub,
                             config: SolverConfig = SolverConfig(),
                             val_and_grad: Optional[Callable] = None
                             ) -> SolveResult:
    """Explicitly-batched projected L-BFGS: B independent box-constrained
    solves advanced in lockstep inside ONE lax.while_loop.

    objective_b: (B, H, da) -> (B,) independent per-scenario objectives (so
    grad of the sum gives exact per-scenario gradients). Numerically identical
    to vmap(solve_trajectory) — per-scenario acceptance, step sizes, history
    updates, and convergence are all elementwise over B — but the batch stays
    an explicit operand axis end-to-end, which lets the objective's rollout
    dispatch batched Pallas kernels (see dynamics.rollout_batched). Converged
    scenarios freeze (their state stops updating) while the loop runs until
    all are done or the iteration cap, matching vmapped-while semantics.
    """
    dt = u_init.dtype
    b = u_init.shape[0]
    shape = u_init.shape
    n = u_init[0].size
    mem = config.history
    lb_f = jnp.broadcast_to(jnp.asarray(lb, dt), shape).reshape(b, n)
    ub_f = jnp.broadcast_to(jnp.asarray(ub, dt), shape).reshape(b, n)

    def f_flat(u):                               # (B, n) -> (B,)
        return objective_b(u.reshape(shape))

    if val_and_grad is None:
        def val_and_grad(u):
            f, vjp_fn = jax.vjp(f_flat, u)
            (g,) = vjp_fn(jnp.ones_like(f))
            return f, g
    else:
        # Externally-supplied (f, grad) oracle — e.g. a shard_mapped collective
        # program (parallel/model_sharded.py) whose AD must happen inside the
        # manual-sharding region. Takes/returns the (B, n) flat layout.
        _vg_ext = val_and_grad

        def val_and_grad(u):
            f, g = _vg_ext(u.reshape(shape))
            return f, g.reshape(b, n)

    def proj(u):
        return jnp.clip(u, lb_f, ub_f)

    def pg_res(u, g):                            # (B,)
        return jnp.max(jnp.abs(u - proj(u - g)), axis=1)

    def two_loop(g, s_h, y_h, rho_h, hlen):
        # g: (B, n); histories: (B, mem, n); rho: (B, mem); hlen: (B,).
        q = g
        alphas = jnp.zeros((b, mem), dt)
        for k in range(mem - 1, -1, -1):
            valid = k >= mem - hlen              # (B,)
            a = rho_h[:, k] * jnp.einsum('bn,bn->b', s_h[:, k], q)
            a = jnp.where(valid, a, 0.0)
            alphas = alphas.at[:, k].set(a)
            q = q - a[:, None] * y_h[:, k]
        sy = jnp.einsum('bn,bn->b', s_h[:, mem - 1], y_h[:, mem - 1])
        yy = jnp.einsum('bn,bn->b', y_h[:, mem - 1], y_h[:, mem - 1])
        scale = jnp.where(jnp.logical_and(hlen > 0, yy > 0.0),
                          sy / jnp.maximum(yy, 1e-30), 1.0)
        r = scale[:, None] * q
        for k in range(mem):
            valid = k >= mem - hlen
            bk = rho_h[:, k] * jnp.einsum('bn,bn->b', y_h[:, k], r)
            bk = jnp.where(valid, bk, 0.0)
            r = r + (alphas[:, k] - bk)[:, None] * s_h[:, k]
        return r

    nm = config.nonmonotone
    noise = config.noise_rel

    def cond(carry):
        *_, t, _iters_b, done = carry
        return jnp.logical_and(t < config.max_iters,
                               jnp.logical_not(jnp.all(done)))

    def body(carry):
        (u, f, fhist, g, t_ls, s_h, y_h, rho_h, hlen, resets, f_best,
         u_best, no_prog, t, iters_b, done) = carry
        live = jnp.logical_not(done)             # (B,)
        # Two-metric projection — see _solve_lbfgs for why the two-loop must
        # see only the FREE gradient.
        eps_act = 1e-6 * (1.0 + jnp.abs(u))
        act = jnp.logical_or(
            jnp.logical_and(u <= lb_f + eps_act, g > 0.0),
            jnp.logical_and(u >= ub_f - eps_act, g < 0.0))
        gf = jnp.where(act, 0.0, g)
        d = -two_loop(gf, s_h, y_h, rho_h, hlen)
        d = jnp.where(act, -g, d)
        gd = jnp.einsum('bn,bn->b', g, d)
        d = jnp.where((gd < -1e-16)[:, None], d, -g)

        # ONE value_and_grad per iteration: evaluate both f and grad at the
        # candidate. On acceptance the gradient is exactly the next iterate's
        # gradient; on rejection the carried (u, f, g) stay valid. (Evaluating
        # f alone for the Armijo test and then grad at u_new separately — the
        # obvious transcription — costs 2 forward rollouts + 1 backward per
        # iteration instead of 1 + 1.)
        c1 = 1e-4
        u_try = proj(u + t_ls[:, None] * d)
        f_try, g_try = val_and_grad(u_try)
        dec = jnp.einsum('bn,bn->b', g, u_try - u)
        # Noise-tolerant Armijo (see _solve_lbfgs); nonmonotone acceptance
        # tests against the window max instead of the current value. With a
        # calibrated noise model the relaxation is 2 sigma (Berahas et al.).
        f_acc = f if nm == 0 else jnp.max(fhist, axis=1)
        eps_scale = (2.0 * noise) if noise > 0.0 else 16.0 * jnp.finfo(dt).eps
        eps_f = eps_scale * (1.0 + jnp.abs(f))
        accepted = jnp.logical_and(
            jnp.logical_and(f_try <= f_acc + c1 * dec + eps_f, dec < 0.0),
            jnp.isfinite(f_try))
        accepted = jnp.logical_and(accepted, live)
        u_new = jnp.where(accepted[:, None], u_try, u)
        f_new = jnp.where(accepted, f_try, f)
        if nm > 0:
            fhist = jnp.where(accepted[:, None],
                              jnp.concatenate([fhist[:, 1:], f_new[:, None]],
                                              axis=1), fhist)
        # Step-size policy: capped growth + quadratic-interpolation
        # backtracking — see _solve_lbfgs for the measured rationale.
        denom = f_try - f - dec
        t_q = jnp.where(denom > 0.0,
                        t_ls * (-0.5 * dec) / jnp.where(denom > 0.0, denom, 1.0),
                        0.5 * t_ls)
        t_down = jnp.clip(t_q, 0.1 * t_ls, 0.5 * t_ls)
        t_ls = jnp.where(done, t_ls,
                         jnp.where(accepted, jnp.minimum(2.0 * t_ls, 4.0),
                                   t_down))

        g_try = jnp.where(jnp.isfinite(g_try), g_try, 0.0)
        g_new = jnp.where(accepted[:, None], g_try, g)

        s = u_new - u
        y = g_new - g
        sy = jnp.einsum('bn,bn->b', s, y)
        # Cosine curvature gate — see _solve_lbfgs.
        sy_ok = sy > jnp.maximum(
            1e-12,
            1e-8 * jnp.linalg.norm(s, axis=1) * jnp.linalg.norm(y, axis=1))
        keep = jnp.logical_and(accepted, sy_ok)         # (B,)
        shifted_s = jnp.concatenate([s_h[:, 1:], s[:, None]], axis=1)
        shifted_y = jnp.concatenate([y_h[:, 1:], y[:, None]], axis=1)
        shifted_rho = jnp.concatenate(
            [rho_h[:, 1:], (1.0 / jnp.maximum(sy, 1e-30))[:, None]], axis=1)
        s_h2 = jnp.where(keep[:, None, None], shifted_s, s_h)
        y_h2 = jnp.where(keep[:, None, None], shifted_y, y_h)
        rho_h2 = jnp.where(keep[:, None], shifted_rho, rho_h)
        hlen2 = jnp.where(keep, jnp.minimum(hlen + 1, mem), hlen)

        # Underflow -> steepest-descent restart (see _solve_lbfgs), per lane.
        underflow = t_ls < 1e-10
        restart = jnp.logical_and(live,
                                  jnp.logical_and(underflow, resets < 2))
        hlen2 = jnp.where(restart, 0, hlen2)
        t_ls = jnp.where(restart, 1.0, t_ls)
        resets2 = jnp.where(restart, resets + 1, resets)
        newly_done = jnp.logical_or(
            pg_res(u_new, g_new) < config.tol,
            jnp.logical_and(underflow, jnp.logical_not(restart)))
        if noise > 0.0:
            # Progress-window termination: the best objective must improve
            # beyond the noise within `progress_window` iterations, else the
            # lane is at its noise-floor optimum. (pg < tol rarely fires in
            # noise; underflow still latches truly-stuck lanes.) The BEST
            # iterate is tracked and returned: the noise-relaxed walk's final
            # point sits ~2 sigma above its best-seen point.
            improved = f_new < f_best - noise * (1.0 + jnp.abs(f_best))
            better = f_new < f_best
            u_best = jnp.where(better[:, None], u_new, u_best)
            f_best = jnp.minimum(f_best, f_new)
            no_prog = jnp.where(improved, 0, no_prog + 1)
            newly_done = jnp.logical_or(newly_done,
                                        no_prog >= config.progress_window)
        done2 = jnp.logical_or(done, jnp.logical_and(newly_done, live))
        iters_b2 = jnp.where(done, iters_b, t + 1)
        return (u_new, f_new, fhist, g_new, t_ls, s_h2, y_h2, rho_h2, hlen2,
                resets2, f_best, u_best, no_prog, t + 1, iters_b2, done2)

    u0 = proj(u_init.reshape(b, n))
    f0, g0 = val_and_grad(u0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    fhist0 = jnp.broadcast_to(f0[:, None], (b, max(nm, 1))).astype(dt)
    init = (u0, f0, fhist0, g0, jnp.ones((b,), dt),
            jnp.zeros((b, mem, n), dt), jnp.zeros((b, mem, n), dt),
            jnp.zeros((b, mem), dt), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            f0, u0, jnp.zeros((b,), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool))
    (u, f, _fh, g, _tl, _sh, _yh, _rh, _hl, _rs, f_best, u_best, _npg,
     _t, iters_b, done) = jax.lax.while_loop(cond, body, init)
    if noise > 0.0:
        # Best-seen iterate (see body). pg_norm is reported at the LAST
        # iterate (the carried gradient belongs to it) — in noise mode it is
        # diagnostic only; termination quality is the progress window's job.
        return SolveResult(u=u_best.reshape(shape), cost=f_best,
                           iters=iters_b, pg_norm=pg_res(u, g),
                           converged=done)
    return SolveResult(u=u.reshape(shape), cost=f, iters=iters_b,
                       pg_norm=pg_res(u, g), converged=done)


@f32_matmul_precision
def _solve_adam(objective, u_init, lb, ub, config: SolverConfig) -> SolveResult:
    dt = u_init.dtype
    lb = jnp.broadcast_to(jnp.asarray(lb, dt), u_init.shape)
    ub = jnp.broadcast_to(jnp.asarray(ub, dt), u_init.shape)
    grad_fn = jax.grad(objective)
    lr = jnp.asarray(config.learning_rate, dt)

    def proj(u):
        return jnp.clip(u, lb, ub)

    def pg_residual(u, g):
        return jnp.max(jnp.abs(u - proj(u - g)))

    def cond(carry):
        u, g, m, v, t, done = carry
        return jnp.logical_and(t < config.max_iters, jnp.logical_not(done))

    def body(carry):
        # One gradient evaluation per iteration: the carried g is grad at u.
        u, g, m, v, t, _ = carry
        m = config.b1 * m + (1.0 - config.b1) * g
        v = config.b2 * v + (1.0 - config.b2) * g * g
        t1 = t + 1
        tf = t1.astype(dt)
        mhat = m / (1.0 - config.b1 ** tf)
        vhat = v / (1.0 - config.b2 ** tf)
        u_new = proj(u - lr * mhat / (jnp.sqrt(vhat) + config.eps))
        g_new = grad_fn(u_new)
        # Non-finite gradients (cost left the PD cone): zero so Adam coasts.
        g_new = jnp.where(jnp.isfinite(g_new), g_new, 0.0)
        done = pg_residual(u_new, g_new) < config.tol
        return u_new, g_new, m, v, t1, done

    u0 = proj(u_init)
    zeros = jnp.zeros_like(u0)
    g0 = grad_fn(u0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    u, _, m, v, iters, _ = jax.lax.while_loop(
        cond, body,
        (u0, g0, zeros, zeros, jnp.zeros((), jnp.int32), jnp.asarray(False)))

    if config.polish_iters > 0:
        def polish_body(i, u):
            g = grad_fn(u)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            step = lr * (0.5 ** (i.astype(dt) / 4.0))
            return proj(u - step * g / (jnp.max(jnp.abs(g)) + config.eps))
        u = jax.lax.fori_loop(0, config.polish_iters, polish_body, u)

    final_cost = objective(u)
    return SolveResult(u=u, cost=final_cost, iters=iters,
                       pg_norm=pg_residual(u, grad_fn(u)))

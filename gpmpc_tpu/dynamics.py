"""Multi-step uncertain rollout of GP dynamics — the `lax.scan` twin of the
reference's `Dynamics.forward_propagate_torch` (dynamics.py:126-191).

Reference conventions preserved (see SURVEY.md §7 step 3):
  - state covariance initialised to 1e-3 I (dynamics.py:79, 148),
  - action block of the joint input covariance is 1e-3 I (dynamics.py:91, 162),
  - the GP bundle shares training inputs x = (state ‖ action) with one output per
    state dimension (dynamics.py:32-36),
  - gradients flow to actions only: the rollout consumes a cache built from the
    (non-differentiated) GP state, matching the reference's detach of
    Ky_inv / lambdas (dynamics.py:170-171),
  - diagonal-only next-state covariance by default (dynamics.py:188), with the
    full cross-output covariance (the reference's TODO at dynamics.py:107-122,
    184) available via `full_cov=True` using the exact eq.-A14 cross terms.

TPU-first structure: the horizon recurrence is a `lax.scan` (carry = (mean, cov));
each step is a handful of small (d, d) factorizations plus one (N, N) MXU
contraction per output against the precomputed `RolloutCache`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.gp.state import GPState
from gpmpc_tpu.ops import moments


class RolloutCache(NamedTuple):
    """Everything the per-step moment matching needs, hoisted out of the scan.

    Built once per solve from a GPState (jit-friendly); constant w.r.t. the
    action trajectory, so autodiff never differentiates through the GP fit.
    """
    x: jax.Array            # (cap, D) training inputs, D = ds + da
    mask: jax.Array         # (cap,)
    beta: jax.Array         # (E, cap)
    b_lam: jax.Array        # (E, cap, cap) variance-cache (see ops.moments)
    log_lambdas: jax.Array  # (E, D)
    log_sigma_f: jax.Array  # (E,)
    state_dim: int
    action_dim: int
    # Static hint from GPConfig.tied_lambdas: all outputs share lengthscales,
    # enabling the shared-exp-chain variance kernel (perf only, never results).
    tied_lambdas: bool = False
    # Nominal mean model f_nom: (n, D) -> (n, E), static. When set, the GP is
    # a RESIDUAL model (gp/state.py subtracts f_nom(x) from the targets) and
    # the rollout adds the nominal contribution back via first-order
    # (EKF-style) moment propagation — exact for affine nominal models. The
    # reference's rollout silently ignores nominal models (its own flagged
    # limitation, dynamics.py:64-65); here the semantics are honest.
    nominal_fn: object = None


def build_rollout_cache(gp: GPState, state_dim: int, action_dim: int) -> RolloutCache:
    gp = jax.lax.stop_gradient(gp)
    make = jax.vmap(moments.make_variance_cache, in_axes=(None, 0, 0, 0, 0, None))
    vcache = make(gp.x, gp.beta, gp.kinv, gp.log_lambdas, gp.log_sigma_f, gp.mask)
    return RolloutCache(
        x=gp.x, mask=gp.mask, beta=gp.beta, b_lam=vcache.b_lam,
        log_lambdas=gp.log_lambdas, log_sigma_f=gp.log_sigma_f,
        state_dim=state_dim, action_dim=action_dim,
        tied_lambdas=bool(gp.config.tied_lambdas),
        nominal_fn=gp.config.nominal_fn,
    )


def _step(cache: RolloutCache, mean, cov, action, action_var: float,
          full_cov: bool, delta: bool):
    """One moment-matching step: (mean, cov, u_t) -> (next_mean, next_cov).

    delta=True treats the GP outputs as state increments (x' = x + f(x, u)) and
    adds the exact input-output covariance terms — the uncertainty-propagation
    formulation PILCO uses; the reference only supports raw next-state targets
    and drops the correlation (dynamics.py:184-188)."""
    ds, da = cache.state_dim, cache.action_dim
    dt = mean.dtype
    joint_mean = jnp.concatenate([mean, action])
    joint_cov = jnp.zeros((ds + da, ds + da), dt)
    joint_cov = joint_cov.at[:ds, :ds].set(cov)
    joint_cov = joint_cov.at[ds:, ds:].set(action_var * jnp.eye(da, dtype=dt))

    mean_fn = jax.vmap(moments.mean_prop,
                       in_axes=(None, None, None, 0, 0, 0, None))
    gp_mean, l = mean_fn(joint_mean, joint_cov, cache.x, cache.beta,
                         cache.log_lambdas, cache.log_sigma_f, cache.mask)

    gp_var = moments.variance_prop_multi(joint_mean, joint_cov, cache.x,
                                         cache.b_lam, cache.log_lambdas,
                                         cache.log_sigma_f, gp_mean)

    io_fn = jax.vmap(moments.input_output_cov,
                     in_axes=(None, None, None, 0, 0, 0))

    has_nom = cache.nominal_fn is not None
    if has_nom and delta:
        raise ValueError(
            'delta dynamics and a nominal mean model are mutually exclusive: '
            'nominal models predict the NEXT STATE (the GP fits the residual, '
            'gp/state.py), while delta mode treats GP outputs as increments.')
    if has_nom:
        # Residual-GP rollout: next = f_nom(x*, u) + f_gp(x*, u). The GP part
        # is exact moment matching; the nominal part is first-order (EKF):
        #   mean  += f_nom(m),
        #   cov   += J S J^T + J cov(x*, f_gp) + (.)^T,   J = df_nom/dx at m
        # — exact when f_nom is affine (the integrator/pendulum-theta models).
        nom = lambda z: cache.nominal_fn(z[None])[0]          # (D,) -> (E,)
        m_nom = nom(joint_mean)
        j_nom = jax.jacobian(nom)(joint_mean)                 # (E, D)
        c_io_n = io_fn(joint_mean, joint_cov, cache.x, cache.beta, l,
                       cache.log_lambdas)                     # (E, D)
        nom_cov = j_nom @ joint_cov @ j_nom.T                 # (E, E)
        cross_nom = j_nom @ c_io_n.T                          # (E, E)

    if delta:
        c_io = io_fn(joint_mean, joint_cov, cache.x, cache.beta, l,
                     cache.log_lambdas)               # (E, ds+da)
        c_state = c_io[:, :ds].T                      # (ds, E) = cov(x_t, delta)
        new_mean = mean + gp_mean
    elif has_nom:
        new_mean = m_nom + gp_mean
    else:
        new_mean = gp_mean

    # Moment matching can produce (slightly) negative variances — analytically
    # when the input distribution is wide relative to the lengthscales, and
    # numerically in f32 at small sigma_n. A negative diagonal poisons the next
    # step's (S + Lambda) Cholesky, so clamp to a small positive floor (the
    # reference has no guard and NaNs instead).
    min_var = 1e-8

    if not full_cov:
        if delta:
            new_var = jnp.diagonal(cov) + gp_var + 2.0 * jnp.diagonal(c_state)
        elif has_nom:
            new_var = (gp_var + jnp.diagonal(nom_cov)
                       + 2.0 * jnp.diagonal(cross_nom))
        else:
            new_var = gp_var
        return new_mean, jnp.diag(jnp.maximum(new_var, min_var))

    # Full cross-output covariance (eq. A14) on the strictly-lower triangle,
    # mirrored; diagonal stays the exact variances.
    def pair_cov(e1, e2):
        return moments.covariance_prop(
            joint_mean, joint_cov, cache.x,
            cache.beta[e1], cache.beta[e2],
            cache.log_lambdas[e1], cache.log_lambdas[e2],
            cache.log_sigma_f[e1], cache.log_sigma_f[e2],
            cache.mask, gp_mean[e1], gp_mean[e2])

    idx = jnp.arange(ds)
    cov_mat = jax.vmap(lambda i: jax.vmap(lambda j: pair_cov(i, j))(idx))(idx)
    cov_mat = 0.5 * (cov_mat + cov_mat.T)               # enforce symmetry
    cov_mat = cov_mat - jnp.diag(jnp.diagonal(cov_mat)) + jnp.diag(gp_var)
    if delta:
        cov_mat = cov + cov_mat + c_state + c_state.T
    elif has_nom:
        cov_mat = cov_mat + nom_cov + cross_nom + cross_nom.T
    # PSD projection (eigenvalue clip) — d is tiny, so this is cheap.
    w, v = jnp.linalg.eigh(cov_mat)
    cov_mat = (v * jnp.maximum(w, min_var)[None, :]) @ v.T
    return new_mean, cov_mat


def rollout(cache: RolloutCache, x0: jax.Array, actions: jax.Array,
            init_state_var: float = 1e-3, action_var: float = 1e-3,
            full_cov: bool = False, delta: bool = False):
    """H-step uncertain shooting rollout.

    x0: (ds,) current state; actions: (H, da).
    Returns (means, covs): (H+1, ds) and (H+1, ds, ds) — index 0 is the initial
    state with covariance `init_state_var * I` (reference dynamics.py:76-79).
    delta=True: the GP models state increments (see _step).
    """
    ds = cache.state_dim
    dt = x0.dtype
    cov0 = init_state_var * jnp.eye(ds, dtype=dt)

    def body(carry, u_t):
        mean, cov = carry
        new_mean, new_cov = _step(cache, mean, cov, u_t, action_var, full_cov,
                                  delta)
        return (new_mean, new_cov), (new_mean, new_cov)

    _, (means, covs) = jax.lax.scan(body, (x0, cov0), actions)
    means = jnp.concatenate([x0[None], means], axis=0)
    covs = jnp.concatenate([cov0[None], covs], axis=0)
    return means, covs


def rollout_from_gp(gp: GPState, state_dim: int, action_dim: int,
                    x0: jax.Array, actions: jax.Array, **kw):
    """Convenience: build the cache and roll out in one call."""
    cache = build_rollout_cache(gp, state_dim, action_dim)
    return rollout(cache, x0, actions, **kw)


# ---------------------------------------------------------------------------
# Explicitly-batched rollout — the scenario-parallel hot path.
#
# Numerically identical to vmap(rollout) over a leading scenario axis, but the
# batch is an explicit operand axis so the per-step variance contraction can
# dispatch to the batched Pallas kernel (ops/pallas/variance_trace.py), whose
# shared b_lam blocks stay VMEM-resident across the scenario sweep. Everything
# else in the step reuses the single-scenario ops under jax.vmap (same XLA).
# Diagonal-covariance path only; full_cov goes through vmap(rollout).
# ---------------------------------------------------------------------------


def _step_batched(cache: RolloutCache, mean, cov_diag, action,
                  action_var: float, delta: bool, mean_only: bool = False):
    """mean: (B, ds); cov_diag: (B, ds); action: (B, da) ->
    (new_mean (B, ds), new_cov_diag (B, ds)).

    mean_only=True skips the O(N^2) predictive-variance contraction entirely
    (the step's dominant cost) and carries the floor variance: the
    SURROGATE rollout used by the multi-start basin-selection phase of
    solve_batch_multistart — the basin structure of the trajectory
    optimization comes from the (mean) dynamics' multimodality, and this
    surrogate costs O(B N d) per step instead of O(B N^2)."""
    ds, da = cache.state_dim, cache.action_dim
    b = mean.shape[0]
    dt = mean.dtype
    joint_mean = jnp.concatenate([mean, action], axis=1)          # (B, D)
    joint_diag = jnp.concatenate(
        [cov_diag, jnp.full((b, da), action_var, dt)], axis=1)    # (B, D)

    # The carried covariance is diagonal on this path, so the moment ops use
    # the diagonal-S specializations: every (d, d) solve is an elementwise
    # division (the generic small-Cholesky chains cost more in per-op launch
    # latency than the whole step's math).
    gp_mean, l = moments.mean_prop_batched_diag(
        joint_mean, joint_diag, cache.x, cache.beta, cache.log_lambdas,
        cache.log_sigma_f, cache.mask, tied=cache.tied_lambdas)

    min_var = 1e-8
    if mean_only:
        e = cache.beta.shape[0]
        if delta:
            return mean + gp_mean, jnp.full((b, e), min_var, dt)
        return gp_mean, jnp.full((b, e), min_var, dt)

    gp_var = moments.variance_prop_multi_batched_diag(
        joint_mean, joint_diag, cache.x, cache.b_lam, cache.log_lambdas,
        cache.log_sigma_f, gp_mean, tied=cache.tied_lambdas)      # (B, E)
    if delta:
        c_io = moments.input_output_cov_batched_diag(
            joint_mean, joint_diag, cache.x, cache.beta, l,
            cache.log_lambdas)                                    # (B, E, D)
        c_state_diag = jnp.diagonal(c_io[:, :, :ds],
                                    axis1=1, axis2=2)             # (B, ds)
        new_mean = mean + gp_mean
        new_var = cov_diag + gp_var + 2.0 * c_state_diag
    else:
        new_mean = gp_mean
        new_var = gp_var
    return new_mean, jnp.maximum(new_var, min_var)


def _step_batched_full(cache: RolloutCache, mean, cov, action,
                       action_var: float, delta: bool):
    """Full-covariance batched step: mean (B, ds); cov (B, ds, ds);
    action (B, da) -> (new_mean (B, ds), new_cov (B, ds, ds)).

    The batched twin of `_step(full_cov=True)` — exact eq.-A14 cross-output
    covariance, with the tied-lambdas configuration sharing one (N, N) exp
    chain across the whole (E, E) covariance block (ops.moments
    covariance_prop_multi_batched)."""
    ds, da = cache.state_dim, cache.action_dim
    b = mean.shape[0]
    dt = mean.dtype
    joint_mean = jnp.concatenate([mean, action], axis=1)          # (B, D)
    dd = ds + da
    joint_cov = jnp.zeros((b, dd, dd), dt)
    joint_cov = joint_cov.at[:, :ds, :ds].set(cov)
    joint_cov = joint_cov.at[:, ds:, ds:].set(
        action_var * jnp.eye(da, dtype=dt))

    tied = cache.tied_lambdas
    gp_mean, l = moments.mean_prop_batched(
        joint_mean, joint_cov, cache.x, cache.beta, cache.log_lambdas,
        cache.log_sigma_f, cache.mask, tied=tied)                 # (B, E)

    gp_var = moments.variance_prop_multi_batched(
        joint_mean, joint_cov, cache.x, cache.b_lam, cache.log_lambdas,
        cache.log_sigma_f, gp_mean, tied=tied)                    # (B, E)

    cov_mat = moments.covariance_prop_multi_batched(
        joint_mean, joint_cov, cache.x, cache.beta, cache.log_lambdas,
        cache.log_sigma_f, gp_mean, cache.mask, tied=tied)        # (B, E, E)
    cov_mat = 0.5 * (cov_mat + jnp.swapaxes(cov_mat, 1, 2))
    # Off-diagonal from eq. A14; diagonal is the exact predictive variance.
    eye = jnp.eye(ds, dtype=dt)
    cov_mat = (cov_mat * (1.0 - eye)[None]
               + gp_var[..., None] * eye[None])

    min_var = 1e-8
    if delta:
        c_io = moments.input_output_cov_batched(
            joint_mean, joint_cov, cache.x, cache.beta, l,
            cache.log_lambdas)                                    # (B, E, D)
        c_state = jnp.swapaxes(c_io[:, :, :ds], 1, 2)             # (B, ds, E)
        new_mean = mean + gp_mean
        cov_mat = cov + cov_mat + c_state + jnp.swapaxes(c_state, 1, 2)
    else:
        new_mean = gp_mean
    # PSD projection (eigenvalue clip) — ds is tiny, so this is cheap.
    w, v = jnp.linalg.eigh(cov_mat)
    cov_mat = jnp.einsum('bik,bk,bjk->bij', v, jnp.maximum(w, min_var), v)
    return new_mean, cov_mat


def rollout_batched(cache: RolloutCache, x0s: jax.Array, actions: jax.Array,
                    init_state_var: float = 1e-3, action_var: float = 1e-3,
                    delta: bool = False, full_cov: bool = False,
                    mean_only: bool = False, frozen_cov_diag=None):
    """Batched H-step uncertain shooting rollout.

    x0s: (B, ds); actions: (B, H, da).
    Returns (means, covs): (B, H+1, ds) and (B, H+1, ds, ds) — matching
    vmap(rollout) exactly (tests/test_batched.py asserts this).
    full_cov=True carries the full cross-output state covariance (exact
    eq.-A14 terms) instead of the diagonal."""
    if cache.nominal_fn is not None:
        raise NotImplementedError(
            'rollout_batched does not support nominal mean models; use '
            'vmap(rollout) (parallel.solve_batch routes this automatically '
            "via impl='vmap').")
    ds = cache.state_dim
    b = x0s.shape[0]
    dt = x0s.dtype

    if full_cov:
        cov0 = jnp.broadcast_to(init_state_var * jnp.eye(ds, dtype=dt),
                                (b, ds, ds))

        def body_full(carry, u_t):
            mean, cov = carry
            new_mean, new_cov = _step_batched_full(cache, mean, cov, u_t,
                                                   action_var, delta)
            return (new_mean, new_cov), (new_mean, new_cov)

        _, (means, covs) = jax.lax.scan(
            body_full, (x0s, cov0), jnp.swapaxes(actions, 0, 1))
        means = jnp.concatenate([x0s[None], means], axis=0)
        covs = jnp.concatenate([cov0[None], covs], axis=0)
        return jnp.swapaxes(means, 0, 1), jnp.swapaxes(covs, 0, 1)

    var0 = jnp.full((b, ds), init_state_var, dt)

    if frozen_cov_diag is not None:
        # FROZEN-COVARIANCE surrogate rollout (solve_batch_multistart's
        # gamma-aware cheap phase): the carried variance is replaced by the
        # supplied (B, H+1, ds) diagonal sequence — typically captured from
        # one full rollout and stop-gradient'd — so the O(N^2) per-step
        # variance contraction is skipped while the MEAN propagation still
        # moment-matches against the (frozen) input covariance and the cost
        # still sees a gamma-weighted uncertainty trajectory. The missing
        # piece vs the full objective is only dSigma/du.
        fro = jnp.swapaxes(frozen_cov_diag, 0, 1)                 # (H+1, B, ds)

        def body_frozen(carry, xs):
            mean, = carry
            u_t, var_t = xs
            new_mean, _ = _step_batched(cache, mean, var_t, u_t, action_var,
                                        delta, mean_only=True)
            return (new_mean,), new_mean

        _, means = jax.lax.scan(body_frozen, (x0s,),
                                (jnp.swapaxes(actions, 0, 1), fro[:-1]))
        means = jnp.concatenate([x0s[None], means], axis=0)
        covs = fro[..., :, None] * jnp.eye(ds, dtype=dt)
        return jnp.swapaxes(means, 0, 1), jnp.swapaxes(covs, 0, 1)

    def body(carry, u_t):
        mean, var = carry
        new_mean, new_var = _step_batched(cache, mean, var, u_t, action_var,
                                          delta, mean_only=mean_only)
        return (new_mean, new_var), (new_mean, new_var)

    _, (means, variances) = jax.lax.scan(
        body, (x0s, var0), jnp.swapaxes(actions, 0, 1))           # (H, B, ds)
    means = jnp.concatenate([x0s[None], means], axis=0)           # (H+1, B, ds)
    variances = jnp.concatenate([var0[None], variances], axis=0)
    covs = variances[..., :, None] * jnp.eye(ds, dtype=dt)        # (H+1,B,ds,ds)
    return jnp.swapaxes(means, 0, 1), jnp.swapaxes(covs, 0, 1)

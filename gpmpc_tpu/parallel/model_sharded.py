"""Model-axis sharded GP-MPC solves — kernel-matrix linear algebra over ICI
collectives (SURVEY §2.2 TP row; BASELINE north_star "QP/linear-algebra blocks
reduce via ICI collectives").

What gets sharded and why: the per-step moment-matching hot op contracts the
(E, N, N) variance cache `b_lam` against per-scenario exponential chains —
O(B E N^2) work and the only N^2-sized operand in the solve (8 MB at N=1024,
E=2; 128 MB at N=4096). Everything else in the step is O(N d) or smaller.
So the 'model' axis shards `b_lam` BY ROWS:

    t_e = sum_i d_i [ sum_j blam_e[i, j] e_ij d_j ]
        = psum_over_shards( sum_{i in shard} ... )        (one scalar per (b, e))

Each device computes its row-block contraction against the full (replicated,
small) x/beta/d operands and `psum`s the (B, E) partial traces over the model
axis — the collective rides ICI inside a slice. The mean / input-output-cov
ops stay replicated (they are O(N d); sharding them would trade a trivial
compute saving for extra collectives).

The solver algebra (L-BFGS state, (B, H da)-sized) is replicated across the
model axis — every device carries the full solver state for its batch shard
and computes identical updates from the psum'd objective/gradient, which is
the standard TP pattern (replicate the optimizer math, shard the heavy
contraction). The batch axis composes orthogonally: a (batch, model) mesh
runs B/n_b independent solves per device row, each solve's N^2 work split
n_m ways.

The row-block contraction dispatches the rectangular streamed Pallas kernel
(ops/pallas/variance_trace.variance_trace_tied_block) for tied-lambdas f32
shapes inside its support envelope — each shard streams its (E, N, Nl)
column block through VMEM exactly like the replicated kernel streams the
full matrix — and falls back to the XLA einsum form otherwise (untied, f64
validation, odd shapes). Multi-chip throughput is unmeasurable on this
single-chip host; equivalence vs the einsum form is tested on the virtual
CPU mesh (tests/test_model_sharded.py).

Reference baseline: the reference has zero collectives of any kind
(SURVEY.md §2.2 — single process, single device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import RolloutCache, build_rollout_cache
from gpmpc_tpu.gp.state import GPState
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
from gpmpc_tpu.mpc.solver import SolverConfig, SolveResult, solve_trajectory_batched
from gpmpc_tpu.ops import moments
from gpmpc_tpu.ops.pallas import variance_trace as _vt
from gpmpc_tpu.parallel.batch import _params_axes
from gpmpc_tpu.parallel.mesh import BATCH_AXIS, MODEL_AXIS


def _variance_multi_batched_diag_rows(u, s_diag, x, b_lam_rows, row_off,
                                      log_lambdas, log_sigma_f, means,
                                      axis_name: str, tied: bool = False):
    """Row-sharded twin of moments.variance_prop_multi_batched_diag.

    u: (B, d); s_diag: (B, d); x: (N, d) replicated; b_lam_rows: (E, Nl, N)
    THIS SHARD's rows [row_off, row_off + Nl); means: (B, E) -> (B, E).
    The (B, E) partial traces reduce with psum over `axis_name`.

    tied=True (static, GPConfig.tied_lambdas) dispatches the rectangular
    streamed Pallas kernel for the row-block partial when its support
    envelope admits the shape; untied (or unsupported) shapes run the XLA
    einsum form.
    """
    n_loc = b_lam_rows.shape[1]
    n, d = x.shape
    lam = jnp.exp(log_lambdas)                                  # (E, d)
    hls = (lam / 2.0)[None] + s_diag[:, None, :]                # (B, E, d)
    log_det_part = -0.5 * (jnp.sum(jnp.log(hls), axis=-1)
                           - jnp.sum(log_lambdas - jnp.log(2.0),
                                     axis=-1)[None])            # (B, E)

    e = b_lam_rows.shape[0]
    if (tied and _vt.enabled_batched()
            and _vt.supported_tied_block(n, n_loc, d, x.dtype, e)):
        # Kernelized row-block partial (VERDICT r3 item 7): the shard's rows
        # of the symmetric blam, transposed to the kernel's column-block
        # layout; partial traces psum over the model axis. The op's backward
        # returns symmetry-collapsed per-block cotangents whose psum is the
        # exact full gradient — valid exactly under this psum pattern (see
        # variance_trace_tied_block).
        x_blk = jax.lax.dynamic_slice_in_dim(x, row_off, n_loc, axis=0)
        # Lambda contribution through the tied hypergrad guard (NaN
        # lengthscale cotangents — ops.moments._tied_hypergrad_guard);
        # s_diag gradients stay exact.
        lam0g = jnp.mean(jnp.exp(moments._tied_hypergrad_guard(log_lambdas)),
                         axis=0)
        hls0 = (lam0g / 2.0)[None] + s_diag                     # (B, d)
        m2s = jnp.eye(d, dtype=x.dtype) \
            * (1.0 / hls0)[..., None, :]                        # (B, d, d)
        t_loc = _vt.variance_trace_tied_block(
            u, m2s, x, x_blk, jnp.swapaxes(b_lam_rows, 1, 2))
    else:
        a = u[:, None, :] - x[None]                             # (B, N, d)
        inv_hls = 1.0 / hls                                     # (B, E, d)
        g = a[:, None] * inv_hls[:, :, None, :]                 # (B, E, N, d)
        q = jnp.sum(g * a[:, None], axis=-1)                    # (B, E, N)
        dv = jnp.exp(-0.125 * q)                                # (B, E, N)

        a_rows = jax.lax.dynamic_slice_in_dim(a, row_off, n_loc, axis=1)
        g_rows = jax.lax.dynamic_slice_in_dim(g, row_off, n_loc, axis=2)
        dv_rows = jax.lax.dynamic_slice_in_dim(dv, row_off, n_loc, axis=2)

        # p_loc[b, e, i, j] = g_rows[b, e, i, :] . a[b, j, :]   (B, E, Nl, N)
        p_loc = jnp.einsum('beid,bjd->beij', g_rows, a)
        w = b_lam_rows[None] * jnp.exp(-0.25 * p_loc)
        t_loc = jnp.einsum('bei,beij,bej->be', dv_rows, w, dv)
    t = jax.lax.psum(t_loc, axis_name)

    return (jnp.exp(2.0 * log_sigma_f)[None]
            - jnp.exp(log_det_part) * t - means ** 2)


def _step_batched_rows(cache: RolloutCache, b_lam_rows, row_off,
                       mean, cov_diag, action, action_var: float,
                       delta: bool, axis_name: str):
    """Model-sharded twin of dynamics._step_batched (diagonal path)."""
    ds, da = cache.state_dim, cache.action_dim
    b = mean.shape[0]
    dt = mean.dtype
    joint_mean = jnp.concatenate([mean, action], axis=1)
    joint_diag = jnp.concatenate(
        [cov_diag, jnp.full((b, da), action_var, dt)], axis=1)

    gp_mean, l = moments.mean_prop_batched_diag(
        joint_mean, joint_diag, cache.x, cache.beta, cache.log_lambdas,
        cache.log_sigma_f, cache.mask, tied=cache.tied_lambdas)

    gp_var = _variance_multi_batched_diag_rows(
        joint_mean, joint_diag, cache.x, b_lam_rows, row_off,
        cache.log_lambdas, cache.log_sigma_f, gp_mean, axis_name,
        tied=cache.tied_lambdas)

    min_var = 1e-8
    if delta:
        c_io = moments.input_output_cov_batched_diag(
            joint_mean, joint_diag, cache.x, cache.beta, l,
            cache.log_lambdas)
        c_state_diag = jnp.diagonal(c_io[:, :, :ds], axis1=1, axis2=2)
        new_mean = mean + gp_mean
        new_var = cov_diag + gp_var + 2.0 * c_state_diag
    else:
        new_mean = gp_mean
        new_var = gp_var
    return new_mean, jnp.maximum(new_var, min_var)


def rollout_batched_rows(cache: RolloutCache, b_lam_rows, row_off,
                         x0s, actions, init_state_var: float = 1e-3,
                         action_var: float = 1e-3, delta: bool = False,
                         axis_name: str = MODEL_AXIS,
                         batch_axis: str = BATCH_AXIS):
    """Model-sharded batched rollout (diagonal covariance). Matches
    dynamics.rollout_batched exactly; `cache.b_lam` is ignored in favor of
    the local row shard."""
    ds = cache.state_dim
    b = x0s.shape[0]
    dt = x0s.dtype
    # The carry must be varying over the batch axis from step 0 (the step
    # output is: psum over the model axis leaves {batch}); cast the constant
    # initial variance so the scan carry types line up under vma checking.
    var0 = jax.lax.pcast(jnp.full((b, ds), init_state_var, dt),
                         batch_axis, to='varying')

    def body(carry, u_t):
        mean, var = carry
        new_mean, new_var = _step_batched_rows(
            cache, b_lam_rows, row_off, mean, var, u_t, action_var, delta,
            axis_name)
        return (new_mean, new_var), (new_mean, new_var)

    _, (means, variances) = jax.lax.scan(
        body, (x0s, var0), jnp.swapaxes(actions, 0, 1))
    means = jnp.concatenate([x0s[None], means], axis=0)
    variances = jnp.concatenate([var0[None], variances], axis=0)
    covs = variances[..., :, None] * jnp.eye(ds, dtype=dt)
    return jnp.swapaxes(means, 0, 1), jnp.swapaxes(covs, 0, 1)


def solve_batch_2d(mesh, gp: GPState, state_dim: int, action_dim: int,
                   x0s: jax.Array, params: CostParams, horizon: int,
                   lb, ub, solver: SolverConfig = SolverConfig(),
                   delta: bool = False) -> SolveResult:
    """B solves over a (batch, model) mesh: scenarios DP over the batch axis,
    each solve's O(N^2) kernel-matrix contraction split over the model axis
    with psum reductions (diag covariance + lockstep L-BFGS path).

    b_lam rows are sharded at dispatch (in_specs P(None, 'model', None)); x,
    beta, masks replicate (O(N d)). B must divide the batch-axis size; the
    GP capacity must divide the model-axis size.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                      # pragma: no cover
        from jax.experimental.shard_map import shard_map

    if solver.method != 'lbfgs':
        raise ValueError('solve_batch_2d runs the lockstep L-BFGS solver')
    b = x0s.shape[0]
    n_b = mesh.shape[BATCH_AXIS]
    n_m = mesh.shape[MODEL_AXIS]
    cache = build_rollout_cache(gp, state_dim, action_dim)
    if cache.nominal_fn is not None:
        raise NotImplementedError('nominal models: use parallel.solve_batch')
    cap = cache.b_lam.shape[1]
    if b % n_b != 0:
        raise ValueError(f'batch {b} not divisible by batch axis {n_b}')
    if cap % n_m != 0:
        raise ValueError(f'capacity {cap} not divisible by model axis {n_m}')
    n_loc = cap // n_m

    u_init = jnp.zeros((b, horizon, action_dim), x0s.dtype)
    params_axes = _params_axes(params, b)

    def leaf_spec(axis_val):
        def f(v):
            if v is None:
                return P()
            return P(BATCH_AXIS) if axis_val == 0 else P()
        return f

    params_spec = jax.tree.map(
        lambda ax, v: P(BATCH_AXIS) if ax == 0 else P(),
        params_axes, params, is_leaf=lambda v: v is None)
    # Structure: ONLY the objective's value-and-grad is a shard_map program —
    # the collectives (psum of the row-block traces) and their reverse-mode
    # transposes live inside the manual region where varying-manual-axes
    # checking is ON (with it off, JAX conservatively transposes psum to psum
    # and the gradient double-counts by the model-axis size — observed as
    # divergent solves on (2, 4) meshes). The L-BFGS loop runs OUTSIDE on
    # globally-sharded (B, ...) arrays, where XLA's SPMD partitioner handles
    # the elementwise solver algebra; it consumes (f, g) from the manual
    # region via SolverConfig's val_and_grad hook.
    cache_small = cache._replace(
        b_lam=jnp.zeros((cache.b_lam.shape[0], 1, 1), cache.b_lam.dtype))
    cost_b = jax.vmap(risk_sensitive_cost, in_axes=(params_axes, 0, 0, 0))

    def local_vg(b_lam_rows, u_l, x0s_l, params_l):
        row_off = jax.lax.axis_index(MODEL_AXIS) * n_loc

        def obj(u):
            means, covs = rollout_batched_rows(
                cache_small, b_lam_rows, row_off, x0s_l, u, delta=delta,
                axis_name=MODEL_AXIS, batch_axis=BATCH_AXIS)
            return cost_b(params_l, means, covs, u)

        f, vjp_fn = jax.vjp(obj, u_l)
        (g,) = vjp_fn(jnp.ones_like(f))     # ones inherit f's vma ({batch})
        return f, g

    vg_sharded = shard_map(
        local_vg, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS, None), P(BATCH_AXIS), P(BATCH_AXIS),
                  params_spec),
        out_specs=(P(BATCH_AXIS), P(BATCH_AXIS)))

    def val_and_grad(u):
        return vg_sharded(cache.b_lam, u, x0s, params)

    return solve_trajectory_batched(None, u_init, lb, ub, solver,
                                    val_and_grad=val_and_grad)

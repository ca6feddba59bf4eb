"""Fused Pallas kernel for the uncertain-input variance trace term.

The per-rollout-step hot tile is

    t = sum_ij blam_ij * d_i * d_j * exp(-1/4 * g_i . a_j)

with a = u - x (N, d), g = a @ M2, d = exp(-q/8), q_i = g_i . a_i — i.e. the
separable form of tr((Ky^{-1} - beta beta^T) L) from ops.moments
(variance_prop_cached). Under XLA this materializes several (N, N) f32
temporaries in HBM per scan step per batch sample; profiled on v5e, HBM traffic
for those temporaries dominates the whole MPC solve. These kernels compute the
tile products entirely in VMEM (the "rw formulation" banner below documents
the kernel contract and the analytic VJP).

All kernels here are EXPLICITLY batched over the scenario axis — the callers
are dynamics.rollout_batched + mpc.solver.solve_trajectory_batched, and single
solves route through them with B = 1 (mpc/controller.py). A vmap-layout
single-scenario kernel family existed in round 1 and was removed: the
automatic Pallas batching rule prepends the vmap axis as the outermost grid
dimension, which re-DMAs the shared blam block per scenario and shreds the
grid into tiny cells (measured slower than the fused-XLA twin).

Mosaic pitfalls baked into these kernels (do not "simplify" them away):
  - pallas dots default to bf16 MXU operand rounding regardless of any outer
    default_matmul_precision, and Mosaic supports only DEFAULT/HIGHEST — see
    _p_outer/_dot3 for the arithmetic strategy that keeps f32-grade accuracy
    at ~2x less MXU work than HIGHEST;
  - (N, 1)-shaped column vectors everywhere — rank-1 (N,) intermediates trip
    a Mosaic relayout bug ("non-singleton logical dimension is replicated").
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Read once at import: traced programs bake the dot mode in, so honoring later
# env mutations would only desynchronize new traces from the jit cache.
_DOT_MODE = os.environ.get('GPMPC_KERNEL_DOT', 'highest')

# In-kernel exp for the O(N^2) chains (GPMPC_KERNEL_EXP, read once at import):
#   'exact' (default) — utils.accurate.exp_f32, ~2 ulp; the measured-safe
#   choice (hardware exp's ~45 ulp deterministic error amplifies through the
#   cancellation-heavy trace into percent-level objective corruption, the
#   round-3 quality regression);
#   'hw' — the hardware approximation; ~2.5x less VPU work on the chain
#   (the kernel's dominant cost). Measurement knob for surrogate phases.
_EXP_MODE = os.environ.get('GPMPC_KERNEL_EXP', 'exact')

from gpmpc_tpu.utils.accurate import exp_f32 as _exp
from gpmpc_tpu.utils.linalg import f32_matmul_precision

# The O(N^2) chain exp used INSIDE kernel bodies (see _EXP_MODE above). The
# O(N) prep exps (dvec, kernel weights) always use the exact form — they are
# cheap and feed the same cancellation-amplified contractions.
_chain_exp = jnp.exp if _EXP_MODE == 'hw' else _exp


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels stay testable on CPU."""
    return jax.default_backend() != 'tpu'


def variance_trace_reference(u, m2, x, blam):
    """Pure-jnp twin (the XLA fallback and the oracle for kernel tests)."""
    a = u[None, :] - x
    g = a @ m2
    p = g @ a.T
    q = jnp.sum(g * a, axis=1)
    dvec = _exp(-0.125 * q)
    return dvec @ (blam * _exp(-0.25 * p)) @ dvec


# ===================================================================
# Explicitly-batched kernels — the production hot path.
#
# Under a per-scenario vmap the automatic Pallas batching rule prepends the
# scenario axis as the OUTERMOST grid dimension, so the shared blam tile is
# re-DMA'd from HBM for every scenario and each grid cell is tiny (the
# measured result that killed the round-1 single-scenario kernel family, see
# module docstring). Here the scenario batch B is an
# EXPLICIT operand axis and the innermost grid dimension: blam's index map is
# constant in b, so Mosaic's pipeline keeps each (e) blam block VMEM-resident
# across the whole scenario sweep — HBM reads it E times total instead of
# B*E times, and each grid cell does a full (N, N) tile of work.
#
# Kernel contract (the "rw" formulation): the kernel's only job is the O(N^2)
# chain W = blam o exp(-1/4 p) o (d_i d_j), reduced against the AUGMENTED
# matrix AO = [1 | A] on the MXU:
#
#     rw = W @ AO = [W 1 | W A]          (N, 1+d) per (scenario, output)
#
# computed as dv o (w' @ (dv o AO)) with w' = blam o exp(-1/4 p), so the d_i
# d_j scaling never touches an (N, N) buffer. Everything the primal and the
# VJP need is then O(N d) XLA work outside the kernel:
#
#     t  = sum(rw[..., 0])                                (the trace term)
#     z0 = A^T r,   zs = A^T (W A + diag(r) A)            (VJP residuals)
#     dt/du = -M2 z0,   dt/dM2 = -1/4 zs                  (per output, x ct)
#
# derived from e_ij = -1/2 abar^T M2 abar, abar = (a_i + a_j)/2 (valid for
# SYMMETRIC blam and M2 — always true here). Compared to the previous
# "combined" kernels (which reduced row sums and (N, d, d) residual
# broadcasts on the VPU, lane-padded 128/d-fold), every N^2-sized reduction
# now rides the MXU and kernel VPU work shrinks to one exp chain plus one
# blam multiply per output — measured ~2x on the headline solve.
#
# Requires the caller to be natively batched (dynamics.rollout_batched +
# mpc.solver.solve_trajectory_batched), not vmapped.
# ===================================================================


def enabled_batched() -> bool:
    """The batched kernels are the default on TPU (opt out with
    GPMPC_DISABLE_PALLAS=1); off-TPU they run interpreted only when forced
    (GPMPC_FORCE_PALLAS=1 — used by the kernel oracle tests)."""
    import os
    if os.environ.get('GPMPC_DISABLE_PALLAS') == '1':
        return False
    if jax.default_backend() == 'tpu':
        return True
    return os.environ.get('GPMPC_FORCE_PALLAS') == '1'


_FULL_N_MAX = 512


def supported_batched(n: int, d: int, dtype) -> bool:
    """The untied path dispatches the streamed kernel per output (tied with
    E = 1), so its support envelope is supported_tied's at e = 1."""
    return supported_tied(n, d, dtype, e=1)


def supported_tied(n: int, d: int, dtype, e: int = 2) -> bool:
    """Small configurations keep all E blam blocks VMEM-resident; larger ones
    stream blam column tiles through a grid axis (_rw_call_tied picks), so
    the only hard bound is the streamed working set: the (E, N, TJ) blam
    tile + one scenario's (N, TJ) temporaries + the accumulator."""
    if not (n % 128 == 0 and 128 <= n and d <= 8 and dtype == jnp.float32):
        return False
    tj = _jtile(n)
    return (e * n * tj * 4 + 4 * n * tj * 4
            + e * n * (1 + d) * 4) <= 10 * 1024 * 1024


def _jtile(n: int) -> int:
    return 256 if n % 256 == 0 else 128


_HI = jax.lax.Precision.HIGHEST
_DEF = jax.lax.Precision.DEFAULT


def _p_outer(g, a):
    """p_ij = sum_k g[i, k] a[j, k] as d VPU outer-product accumulations.

    The obvious (N, d) @ (d, N) MXU dot pads K = d up to 128 AND needs
    HIGHEST (6 bf16 passes) because p feeds exp(); d rank-1 broadcasts are
    exact f32 and measured ~1.2x faster end-to-end (benchmarks/kernel_probe:
    602 -> 487 us/call at the headline shape)."""
    d = g.shape[-1]
    p = g[:, 0:1] * a[:, 0:1].T
    for k in range(1, d):
        p = p + g[:, k:k + 1] * a[:, k:k + 1].T
    return p


def _split_bf16(v):
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, v - hi


def _dot_mode() -> str:
    """In-kernel contraction arithmetic for the W reductions (the exp-chain
    operand W = blam o exp is cancellation-amplified: sum|W_ij AO_j| / |rw|
    reaches 10^2-10^3 on the headline GP, so contraction rounding is the
    accuracy floor of the whole variance path once exp is exact —
    utils/accurate.py):
      bf16x3   3 DEFAULT passes, lo-term rounding ~2^-16 rel (fastest)
      highest  Mosaic precision=HIGHEST (6 passes, true f32 products)
    Default 'highest': measured within ~1.5% end-to-end of bf16x3 on the
    headline solve (the kernel is VPU/exp-bound, the extra MXU passes hide)
    while cutting the forward trace error ~20x (KERNEL_TPU_r03 artifact).

    GPMPC_KERNEL_DOT is read ONCE at module import (frozen-config semantics):
    traced programs bake the mode in, so honoring later env mutations would
    only desynchronize new traces from the jit cache. Set it before importing
    gpmpc_tpu."""
    return _DOT_MODE


def _dot3(w, ao_hi, ao_lo):
    """W @ AO: bf16x3 manual split (3 DEFAULT MXU passes) or one HIGHEST
    dot per _dot_mode(). For bf16x3 the hi parts are exactly
    bf16-representable, so DEFAULT's operand rounding only touches the lo
    terms (error ~2^-16 relative) — see _dot_mode for why that is no longer
    the default."""
    if _dot_mode() == 'highest':
        return jnp.dot(w, ao_hi + ao_lo, preferred_element_type=jnp.float32,
                       precision=_HI)
    w_hi, w_lo = _split_bf16(w)
    return (jnp.dot(w_hi, ao_hi, preferred_element_type=jnp.float32,
                    precision=_DEF)
            + jnp.dot(w_hi, ao_lo, preferred_element_type=jnp.float32,
                      precision=_DEF)
            + jnp.dot(w_lo, ao_hi, preferred_element_type=jnp.float32,
                      precision=_DEF))


def _rw_call(g, a, dvec, ao, blam):
    """Untied dispatch: g: (B, E, N, d); a: (B, N, d); dvec: (B, E, N);
    ao: (B, N, 1+d); blam: (E, N, N) -> rw (B, E, N, 1+d).

    Untied lengthscales mean one exp chain PER OUTPUT (inherent — each e has
    its own M2). The symmetric pair kernel streams ALL E chains per scenario
    tile in one dispatch (each pair tile loads its operands once for all
    outputs); the per-output fallback dispatches the tied kernel at E = 1 and
    re-streams the scenario operands E times (the round-2 shape VERDICT r2
    item 3 flagged)."""
    e = blam.shape[0]
    outs = [_rw_call_tied(g[:, k], a, dvec[:, k], ao, blam[k:k + 1])
            for k in range(e)]
    return jnp.concatenate(outs, axis=1)


# ----------------------------------------------------- tied-lambdas kernels --
# Every reference experiment (and the headline bench) gives all output GPs the
# SAME lengthscales (e.g. lambdas = [2, 2, 2] for every output,
# pretrain_pendulum.py:53-55). Then M2 = (Lambda/2 + S)^{-1} is shared across
# outputs, so the dominant O(N^2) exp chain exp(-1/4 p) o (d_i d_j) is
# identical for every e — these kernels compute it ONCE per scenario and only
# do the cheap blam_e multiply + augmented MXU reduction per output.
# Dispatched when GPConfig.tied_lambdas is set (auto-detected host-side).


def _dot3_t(ao_hi, ao_lo, w):
    """(W1, N) = AOD^T @ W for AOD (TJ, W1), W (TJ, N) — contraction over
    dim 0 of both via dot_general (no explicit transposes, which Mosaic
    relayouts poorly); arithmetic per _dot_mode (see _dot3)."""
    dn = (((0,), (0,)), ((), ()))
    if _dot_mode() == 'highest':
        return jax.lax.dot_general(ao_hi + ao_lo, w, dn, precision=_HI,
                                   preferred_element_type=jnp.float32)
    w_hi, w_lo = _split_bf16(w)

    def dg(x, y):
        return jax.lax.dot_general(x, y, dn, precision=_DEF,
                                   preferred_element_type=jnp.float32)

    return dg(ao_hi, w_hi) + dg(ao_lo, w_hi) + dg(ao_hi, w_lo)


def _make_rw_tied_streamed_kernel(btile: int, e_total: int,
                                  red: str = 'mxu'):
    """Large-N tied kernel: the (E, N, N) blam no longer fits VMEM whole, so
    its tiles stream through grid axis j and the rw accumulator lives in
    persistent VMEM scratch, written out on the last j step. Each (b, j)
    cell still shares ONE (TJ, N) exp chain across all E outputs — the tied
    saving the resident-blam design cannot offer above E N^2 4B ~ 8 MB.

    Layout rules this kernel lives by (VMEM blocks tile (8, 128) on the last
    two dims, so any trailing dim < 128 pads to 128):
      - full-N operands are stored TRANSPOSED, (small, N): g_t (d, N),
        dv_t (1, N), the accumulator/output (W1, N) — N rides the lanes;
      - TJ-sized column operands stay natural ((TJ, d) etc.): their padding
        is bounded by TJ * 128;
      - blam is symmetric, so the j-th COLUMN tile (N, TJ) is read as the
        j-th ROW tile (TJ, N) — no transposes anywhere;
      - the scenario tile loops via fori: Mosaic stack-allocates every
        UNROLLED iteration's (TJ, N) temporaries simultaneously (measured:
        scoped-vmem OOM at N=1024, E=4 even at bt=2)."""
    def kernel(gt_ref, dvrt_ref, comb_ref, blam_ref, rwt_ref, acc_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(k, carry):
            # comb packs [A | AO o dv] in one operand: the three natural-
            # layout column tiles (a, dv, ao) each lane-padded to 128
            # separately, tripling the per-scenario VMEM working set and the
            # DMA stream count; packed they pad once.
            comb = comb_ref[k]                                    # (TJ, d+W1)
            d = comb.shape[-1] - acc_ref.shape[2]
            # pT (TJ, N) = sum_k a_j[:, k] (x) g_t[k, :]
            p_t = comb[:, 0:1] * gt_ref[k, 0:1, :]
            for kk in range(1, d):
                p_t += comb[:, kk:kk + 1] * gt_ref[k, kk:kk + 1, :]
            emat_t = _chain_exp(-0.25 * p_t)                   # (TJ, N)
            if red == 'vpu':
                # Pure-VPU reduction: the MXU dot wastes 124/128 of its M
                # rows at W1 = 1+d = 4, and the kernel ablation
                # (benchmarks/kernel_ablate.py) measured it as the call's
                # largest component. W1 column broadcast-multiplies +
                # sublane-tree sums are exact f32 (better than the bf16x3 /
                # HIGHEST pass arithmetic) and measured ~13% faster per call
                # at the headline shape (339 vs 389 us, TJ=256).
                aod = comb[:, d:]                                 # (TJ, W1)
                w1 = acc_ref.shape[2]
                for e in range(e_total):
                    w = blam_ref[e] * emat_t                      # (TJ, N)
                    rows = [jnp.sum(aod[:, c:c + 1] * w, axis=0,
                                    keepdims=True)                # (1, N)
                            for c in range(w1)]
                    acc_ref[k, e] += jnp.concatenate(rows, axis=0)
                return carry
            ao_hi, ao_lo = _split_bf16(comb[:, d:])               # (TJ, W1)
            for e in range(e_total):
                w = blam_ref[e] * emat_t                          # (TJ, N)
                acc_ref[k, e] += _dot3_t(ao_hi, ao_lo, w)         # (W1, N)
            return carry

        jax.lax.fori_loop(0, btile, body, 0)

        @pl.when(j == nj - 1)
        def _():
            def out_body(k, carry):
                for e in range(e_total):
                    rwt_ref[k, e] = dvrt_ref[k] * acc_ref[k, e]   # (W1, N)
                return carry

            jax.lax.fori_loop(0, btile, out_body, 0)
    return kernel


def _btile_streamed(b: int, n: int, tj: int, e: int, w1: int) -> int:
    """Scenarios per cell for the streamed kernel: more scenarios per cell
    divide the blam re-streaming cost (HBM traffic = (B/bt) E N^2 4B per
    call), bounded by VMEM with the transposed layouts (x2 = double
    buffering; 8/128 = sublane/lane padding)."""
    budget = 12 * 1024 * 1024
    w1_pad = 8 * ((w1 + 7) // 8)
    fixed = 2 * e * tj * n * 4 + 4 * tj * n * 4       # blam tiles + temps
    per_scen = (2 * (8 * n * 4            # g_t (d->8 sublanes, n)
                     + 8 * n * 4          # dv_t
                     + tj * 128 * 4)      # packed [A | AOD] column tile
                + 3 * e * w1_pad * n * 4)   # acc + double-buffered out
    for bt in (32, 16, 8, 4, 2):
        if b % bt == 0 and fixed + bt * per_scen <= budget:
            return bt
    return 1


# ------------------------------------------------- symmetric pair kernels --
# The W matrix is SYMMETRIC (W_ij = blam_ij exp(-1/4 a_i M2 a_j) with blam and
# M2 symmetric), so the column-sweep streamed kernel computes every exp twice.
# These kernels enumerate only the UPPER-TRIANGLE (T, T) tile pairs {I, J},
# I <= J (scalar-prefetched index lists), compute the exp chain once per pair,
# and mirror the off-diagonal contribution through a second MXU reduction:
#
#   acc[:, I] += AOD_J^T W_JI          (contract T_J — _dot3_t)
#   acc[:, J] += AOD_I^T W_JI^T        (contract T_I — _dot3_t2, I != J only)
#
# VPU exp work drops to (nt+1)/(2 nt) of the column sweep (nt = N/T tiles:
# 75% at N=256, 56% at N=1024); total MXU MACs are unchanged. The accumulator
# IS the output block (index map constant along the pair axis, the matmul
# revisiting pattern), laid out (bt, E, nt, W1, T) so the per-pair dynamic
# store indexes an untiled dim — lanes stay T-aligned, W1 never lane-pads.
#
# shared_chain=True is the tied-lambdas variant (one exp chain per pair for
# all E outputs); False gives every output its own chain (untied M2_e) while
# still streaming each pair tile's operands ONCE for all outputs.


def _use_sym() -> bool:
    # Opt-in (GPMPC_SYM_KERNEL=1). ACCURACY is settled: the regression that
    # haunted this kernel in round 3 was the XLA prep einsum feeding the
    # exponent running at DEFAULT matmul precision (bf16 operand rounding)
    # whenever the caller was outside moments.py's f32-precision scope — fixed
    # for all paths by the exact _vpu_mm prep; with it the pair kernel matches
    # the f64 oracle at ~4e-4 on the trace and ~1e-4 on gradients, same level
    # as the column sweep (benchmarks/results/KERNEL_TPU_r03.json). It stays
    # opt-in on SPEED: at the headline shape (B=256, N=256) it measures ~3x
    # SLOWER than the streamed column sweep (346 vs 1031 solves/s end to end)
    # — the resident (bt, E, nt, W1, T) accumulator with per-pair dynamic
    # stores, two MXU reductions per pair, and the doubled comb views cost far
    # more than the (nt+1)/2nt exp saving buys at these sizes.
    import os
    return os.environ.get('GPMPC_SYM_KERNEL') == '1'


def _dot3_t2(ao_hi, ao_lo, w):
    """(W1, T_J) = AOD_I^T @ W^T for AOD (T_I, W1), W (T_J, T_I) — contraction
    over dim 0 of AOD and dim 1 of W; arithmetic per _dot_mode (see _dot3)."""
    dn = (((0,), (1,)), ((), ()))
    if _dot_mode() == 'highest':
        return jax.lax.dot_general(ao_hi + ao_lo, w, dn, precision=_HI,
                                   preferred_element_type=jnp.float32)
    w_hi, w_lo = _split_bf16(w)

    def dg(x, y):
        return jax.lax.dot_general(x, y, dn, precision=_DEF,
                                   preferred_element_type=jnp.float32)

    return dg(ao_hi, w_hi) + dg(ao_lo, w_hi) + dg(ao_hi, w_lo)


def _pair_indices(nt: int):
    """Upper-triangle tile pairs (I <= J), diagonal first — numpy int32."""
    import numpy as np
    pairs = [(i, i) for i in range(nt)]
    pairs += [(i, j) for i in range(nt) for j in range(i + 1, nt)]
    idx = np.asarray(pairs, np.int32)
    return idx[:, 0], idx[:, 1]


def _make_rw_sym_kernel(btile: int, e_total: int, d: int, w1: int,
                        shared_chain: bool):
    """comb packs per scenario row tile: [Z | AOD] (shared chain) or
    [Z_0..Z_{E-1} | AOD_0..AOD_{E-1}] (per-output chains); zt is (d, T) per
    scenario (E stacked when per-output). Two comb views (tiles I and J) and
    one zt view (tile I) stream per pair; acc_ref is the (bt, E, nt, W1, T)
    output block, zeroed at p == 0 and accumulated in place.

    The exponent uses the whitened parametrization p_ij = z_i . z_j
    (_prep_sym): for pair (J, I) the chain computes sum_k z_J[:, k] (x)
    zt_I[k, :], the SAME products in the SAME order as the (I, J) view, so
    the mirrored contribution uses a bit-exactly symmetric W tile."""
    def kernel(iidx_ref, jidx_ref, zt_ref, comb_i_ref, comb_j_ref, blam_ref,
               acc_ref):
        p = pl.program_id(1)
        i_idx = iidx_ref[p]
        j_idx = jidx_ref[p]
        off_diag = i_idx != j_idx
        zw = d * (1 if shared_chain else e_total)   # comb z-block width

        @pl.when(p == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(k, carry):
            comb_i = comb_i_ref[k]                           # (T, zw + .)
            comb_j = comb_j_ref[k]

            def chain(z0, zt):                               # zt: (d, T_I)
                # p_t[j, i] = z_J[j] . z_I[i] — W_JI's exponent, as d VPU
                # rank-1 accumulations (see _p_outer for why not the MXU).
                p_t = comb_j[:, z0:z0 + 1] * zt[0:1, :]
                for kk in range(1, d):
                    p_t += comb_j[:, z0 + kk:z0 + kk + 1] * zt[kk:kk + 1, :]
                return _chain_exp(-0.25 * p_t)            # (T_J, T_I)

            if shared_chain:
                emat = chain(0, zt_ref[k])
            for e in range(e_total):
                emat_e = emat if shared_chain else chain(e * d, zt_ref[k, e])
                w = blam_ref[e] * emat_e                     # (T_J, T_I)
                c0 = zw if shared_chain else zw + e * w1
                aod_i = comb_i[:, c0:c0 + w1]                # (T_I, W1)
                aod_j = comb_j[:, c0:c0 + w1]                # (T_J, W1)
                aj_hi, aj_lo = _split_bf16(aod_j)
                ci = _dot3_t(aj_hi, aj_lo, w)                # (W1, T_I)
                acc_ref[k, e, i_idx] += ci
                ai_hi, ai_lo = _split_bf16(aod_i)
                cj = _dot3_t2(ai_hi, ai_lo, w)               # (W1, T_J)
                acc_ref[k, e, j_idx] += jnp.where(off_diag, cj, 0.0)
            return carry

        jax.lax.fori_loop(0, btile, body, 0)
    return kernel


def _btile_sym_fits(n: int, t: int, e: int, w1: int, nt: int,
                    shared_chain: bool, bt: int) -> bool:
    """VMEM feasibility of bt scenarios per pair-kernel grid cell
    (x2 = double buffering; 8/128 sublane/lane pads)."""
    budget = 12 * 1024 * 1024
    w1_pad = 8 * ((w1 + 7) // 8)
    e_g = 1 if shared_chain else e
    fixed = 2 * e * t * t * 4                     # blam pair tiles
    per_scen = (2 * (2 * t * 128 * 4             # two packed comb views
                     + e_g * 8 * t * 4)          # gt tile(s)
                + 2 * e * nt * w1_pad * t * 4)   # resident output block
    return fixed + bt * per_scen <= budget


def _btile_sym(b: int, n: int, t: int, e: int, w1: int, nt: int,
               shared_chain: bool) -> int:
    """Scenarios per grid cell for the pair kernel. More scenarios per cell
    divide the blam pair-tile re-streaming ((B/bt) E N^2 (nt+1)/(2nt) 4B per
    call), bounded by VMEM."""
    for bt in (32, 16, 8, 4, 2):
        if b % bt == 0 and _btile_sym_fits(n, t, e, w1, nt, shared_chain, bt):
            return bt
    return 1


def supported_sym(n: int, d: int, dtype, e: int, shared_chain: bool) -> bool:
    t = 128
    if not (n % t == 0 and t <= n and d <= 8 and dtype == jnp.float32):
        return False
    w1 = 8 * ((1 + d + 7) // 8)      # padded to full sublane tiles
    if d + (1 if shared_chain else e) * w1 > 128:
        return False
    # At least one scenario per cell must fit the VMEM budget.
    return _btile_sym_fits(n, t, e, w1, n // t, shared_chain, bt=1)


def _prep_sym(u, m2, x, batched_m2_axes: int):
    """Sym-kernel prep: the exponent is parametrized through z = a chol(M2)
    so that p_ij = z_i . z_j is BIT-SYMMETRIC in f32 (identical products,
    identical summation order for (i, j) and (j, i)). The g = a M2 form the
    column-sweep kernel uses satisfies a_j . g_i = a_i . g_j only in exact
    arithmetic; its f32 asymmetry (~|p| eps) is amplified by exp(-p/4) at
    large |p| into ~1e-3 errors on the mirrored tile contributions — the
    round-3 accuracy regression this parametrization eliminates.

    m2 axes: (B, d, d) tied / (B, E, d, d) untied. Returns (a, z, dvec)."""
    a = u[:, None, :] - x[None]                    # (B, N, d)
    low = jnp.linalg.cholesky(m2)                  # M2 = L L^T (PD by constr.)
    # z feeds the in-kernel exp chain — exact-f32 VPU prep, see _vpu_mm.
    if batched_m2_axes == 1:
        z = _vpu_mm(a, low[:, None])               # (B, N, d)
        q = jnp.sum(z * z, axis=-1)                # (B, N)
    else:
        z = _vpu_mm(a[:, None], low[:, :, None])   # (B, E, N, d)
        q = jnp.sum(z * z, axis=-1)                # (B, E, N)
    return a, z, _exp(-0.125 * q)


def _rw_call_sym(z, a, dvec, ao, blam, shared_chain: bool):
    """Symmetric pair dispatch. shared_chain: z (B, N, d), dvec (B, N);
    per-output: z (B, E, N, d), dvec (B, E, N). a (B, N, d); ao (B, N, 1+d);
    blam (E, N, N) -> rw (B, E, N, 1+d). z is the Cholesky-whitened input
    (_prep_sym): p_ij = z_i . z_j."""
    b, n, d = a.shape
    e = blam.shape[0]
    w1_out = ao.shape[-1]
    # Pad the augmented reduction matrix to a full 8-sublane tile: the
    # accumulator's per-(e, tile) planes are then exactly one (8, 128) VMEM
    # tile each, so the dynamic nt-index store never straddles a sublane
    # offset inside a tile. The zero columns contribute zeros end to end.
    w1 = 8 * ((w1_out + 7) // 8)
    if w1 != w1_out:
        ao = jnp.concatenate(
            [ao, jnp.zeros(ao.shape[:-1] + (w1 - w1_out,), ao.dtype)],
            axis=-1)
    t = 128
    nt = n // t
    iidx, jidx = _pair_indices(nt)
    n_pairs = iidx.shape[0]
    bt = _btile_sym(b, n, t, e, w1, nt, shared_chain)
    kernel = _make_rw_sym_kernel(bt, e, d, w1, shared_chain)

    if shared_chain:
        z_t = jnp.swapaxes(z, 1, 2)                          # (B, d, N)
        aod = ao * dvec[..., None]                           # (B, N, W1)
        comb = jnp.concatenate([z, aod], axis=-1)            # (B, N, d+W1)
        zt_spec = pl.BlockSpec((bt, d, t),
                               lambda b, p, ii, jj: (b, 0, ii[p]),
                               memory_space=pltpu.VMEM)
    else:
        z_t = jnp.transpose(z, (0, 1, 3, 2))                 # (B, E, d, N)
        aod = ao[:, None] * dvec[..., None]                  # (B, E, N, W1)
        aod_flat = jnp.transpose(aod, (0, 2, 1, 3)).reshape(b, n, e * w1)
        z_flat = jnp.transpose(z, (0, 2, 1, 3)).reshape(b, n, e * d)
        comb = jnp.concatenate([z_flat, aod_flat], axis=-1)  # (B,N,E*(d+W1))
        zt_spec = pl.BlockSpec((bt, e, d, t),
                               lambda b, p, ii, jj: (b, 0, 0, ii[p]),
                               memory_space=pltpu.VMEM)

    wc = comb.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // bt, n_pairs),
        in_specs=[
            zt_spec,
            pl.BlockSpec((bt, t, wc), lambda b, p, ii, jj: (b, ii[p], 0),
                         memory_space=pltpu.VMEM),           # comb view I
            pl.BlockSpec((bt, t, wc), lambda b, p, ii, jj: (b, jj[p], 0),
                         memory_space=pltpu.VMEM),           # comb view J
            pl.BlockSpec((e, t, t), lambda b, p, ii, jj: (0, jj[p], ii[p]),
                         memory_space=pltpu.VMEM),           # blam W_JI tile
        ],
        out_specs=pl.BlockSpec((bt, e, nt, w1, t),
                               lambda b, p, ii, jj: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    acc5 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, e, nt, w1, n // nt), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(iidx), jnp.asarray(jidx), z_t, comb, comb, blam)
    # (B, E, nt, W1, T) -> (B, E, N, W1), then the final dv scaling (the
    # kernel's old out_body) as one cheap XLA elementwise.
    acc = jnp.transpose(acc5, (0, 1, 2, 4, 3)).reshape(b, e, n, w1)
    acc = acc[..., :w1_out]
    dv = dvec[:, None, :] if shared_chain else dvec
    return acc * dv[..., None]


def _rw_call_tied_nm(g_out, dv_out, comb, blam_block, tj: int):
    """Rectangular streamed dispatch: the kernel's output (row) axis and
    contraction (column) axis may differ in size — the model-axis sharded
    path computes rw only for ITS block of rows while contracting over the
    full training set.

    g_out: (B, Nout, d); dv_out: (B, Nout); comb: (B, Nc, d + W1) packed
    [A | AO o dv] over the CONTRACTION axis; blam_block: (E, Nc, Nout)
    (column block of the symmetric blam = transposed row block)
    -> rw (B, E, Nout, W1)."""
    b, n_out, d = g_out.shape
    e = blam_block.shape[0]
    n_c = comb.shape[1]
    w1 = comb.shape[-1] - d
    bt = _btile_streamed(b, n_out, tj, e, w1)
    kernel = _make_rw_tied_streamed_kernel(bt, e)
    g_t = jnp.swapaxes(g_out, 1, 2)                 # (B, d, Nout)
    dvr_t = dv_out[:, None, :]                      # (B, 1, Nout)
    rw_t = pl.pallas_call(
        kernel,
        grid=(b // bt, n_c // tj),
        in_specs=[
            pl.BlockSpec((bt, d, n_out), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, n_out), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, tj, d + w1), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, tj, n_out), lambda b, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, e, w1, n_out), lambda b, j: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e, w1, n_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, e, w1, n_out), jnp.float32)],
        interpret=_interpret(),
    )(g_t, dvr_t, comb, blam_block)
    return jnp.swapaxes(rw_t, 2, 3)                 # (B, E, Nout, W1)


def _rw_call_tied(g, a, dvec, ao, blam):
    """g: (B, N, d) shared over outputs; a: (B, N, d); dvec: (B, N);
    ao: (B, N, 1+d); blam: (E, N, N) -> rw (B, E, N, 1+d)."""
    b, n, d = g.shape
    e = blam.shape[0]
    w1 = ao.shape[-1]
    if True:  # (kept for diff clarity) streamed serves all shapes
        # The streamed lane-aware kernel serves ALL tied shapes: measured
        # faster than the resident full-N variant even at the headline shape
        # (313.9 vs 385.4 us/call at B=256, N=256 — benchmarks/kernel_probe2)
        # thanks to ~10x smaller VMEM blocks (no d -> 128 lane padding) and
        # larger scenario tiles.
        # Reduction/tile config (GPMPC_KERNEL_RED / GPMPC_TJ):
        #   'mxu' + tj=128 (default) — bf16x3/HIGHEST MXU reduction, the
        #     round-4 production arithmetic;
        #   'vpu' + tj=256 — round-5 retune (benchmarks/kernel_ablate.py):
        #     pure-VPU W1-column reduction, measured 339 vs 389 us/call and
        #     full solver iteration 6.7 vs 8.3 ms (+22%% plain-solve
        #     throughput, 946 vs 775 solves/s at B=256), numerically
        #     EQUIVALENT pointwise (p50 rel err vs f64 8.8e-6 vs 7.8e-6 on
        #     the real headline blam).
        # 'vpu' stays opt-in for the production QUALITY path: the changed
        # (equally accurate) arithmetic reshuffles the chaotic descent's
        # basin outcomes, and the round-5 tail machinery measured ~10 more
        # >1%%-excess lanes at B=256 under it (quality_retired.json
        # ret_prod_nopre/ret_r5b_* vs ret_prod@f6167af) — the quality-paired
        # headline keeps the arithmetic its tail tuning is co-adapted to.
        import os
        red = os.environ.get('GPMPC_KERNEL_RED', 'mxu')
        tj_default = (256 if n % 256 == 0 else 128) if red == 'vpu' else 128
        tj = int(os.environ.get('GPMPC_TJ', '0')) or tj_default
        if n % tj != 0:
            tj = 128
        bt = _btile_streamed(b, n, tj, e, w1)
        kernel = _make_rw_tied_streamed_kernel(bt, e, red=red)
        g_t = jnp.swapaxes(g, 1, 2)                     # (B, d, N)
        dvr_t = dvec[:, None, :]                        # (B, 1, N)
        comb = jnp.concatenate([a, ao * dvec[..., None]],
                               axis=-1)                 # (B, N, d + 1+d)
        rw_t = pl.pallas_call(
            kernel,
            grid=(b // bt, n // tj),
            in_specs=[
                pl.BlockSpec((bt, d, n), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),  # g rows, transposed
                pl.BlockSpec((bt, 1, n), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),  # dv rows, transposed
                pl.BlockSpec((bt, tj, d + w1), lambda b, j: (b, j, 0),
                             memory_space=pltpu.VMEM),  # packed [A | AOD]
                # blam is symmetric: its j-th ROW tile (TJ, N) doubles as the
                # j-th column tile transposed
                pl.BlockSpec((e, tj, n), lambda b, j: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, e, w1, n), lambda b, j: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, e, w1, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bt, e, w1, n), jnp.float32)],
            interpret=_interpret(),
        )(g_t, dvr_t, comb, blam)
        return jnp.swapaxes(rw_t, 2, 3)                 # (B, E, N, 1+d)



# ------------------------------------------------------------ public entry ---
def _aug(a):
    """AO = [1 | A]: the augmented reduction matrix (a: (B, N, d))."""
    return jnp.concatenate([jnp.ones(a.shape[:-1] + (1,), a.dtype), a],
                           axis=-1)


def _vpu_mm(a, m):
    """a (..., N, d) @ m (..., d, k) for TINY d, k (<= 8) as unrolled VPU
    broadcast-sums — EXACT f32.

    The result feeds exp(-p/4) with |p| up to ~20, so DEFAULT's bf16 MXU
    operand rounding (~2^-8 relative) amplifies to PERCENT-level trace errors
    whenever the caller is not already under
    default_matmul_precision('float32') (measured 4% on the round-3 on-TPU
    oracle). precision=HIGHEST fixes accuracy but pads d and k to 128-lane
    MXU tiles and runs 6 passes on the padded shape — measured ~9% off the
    whole headline solve. The unrolled form is exact, unpadded, and fuses.
    Callers pass m with a singleton where a has its N axis (e.g. a (B, N, d)
    with m (B, 1, d, k); a (B, 1, N, d) with m (B, E, 1, d, k)), so
    m[..., j, kk] broadcasts against a[..., j] elementwise."""
    d, k = m.shape[-2], m.shape[-1]
    cols = []
    for kk in range(k):
        acc = a[..., 0] * m[..., 0, kk]
        for j in range(1, d):
            acc = acc + a[..., j] * m[..., j, kk]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def _prep_batched(u, m2, x):
    a = u[:, None, :] - x[None]                    # (B, N, d)
    g = _vpu_mm(a[:, None], m2[:, :, None])        # (B, E, N, d), exact f32
    q = jnp.sum(g * a[:, None], axis=-1)           # (B, E, N)
    return a, g, _exp(-0.125 * q)


def _prep_tied(u, m2, x):
    a = u[:, None, :] - x[None]                    # (B, N, d)
    g = _vpu_mm(a, m2[:, None])                    # (B, N, d), exact f32
    q = jnp.sum(g * a, axis=-1)                    # (B, N)
    return a, g, _exp(-0.125 * q)


def _rw_dispatch(u, m2, x, blam, tied: bool):
    """Prep + kernel dispatch shared by the primal and the VJP fwd: the
    symmetric pair kernel (whitened z parametrization) when enabled and
    supported, else the column-sweep path."""
    n, d = x.shape
    e = blam.shape[0]
    if (_use_sym() and enabled_batched()
            and supported_sym(n, d, x.dtype, e, shared_chain=tied)):
        a, zz, dvec = _prep_sym(u, m2, x, 1 if tied else 2)
        return _rw_call_sym(zz, a, dvec, _aug(a), blam, shared_chain=tied)
    if tied:
        a, g, dvec = _prep_tied(u, m2, x)
        return _rw_call_tied(g, a, dvec, _aug(a), blam)
    a, g, dvec = _prep_batched(u, m2, x)
    return _rw_call(g, a, dvec, _aug(a), blam)


@jax.custom_vjp
def variance_trace_batched(u, m2, x, blam):
    """Batched fused trace: u (B, d); m2 (B, E, d, d); x (N, d) shared;
    blam (E, N, N) shared -> (B, E). Analytic gradients in (u, m2); the cache
    operands (x, blam) are constants by design (build_rollout_cache
    stop-gradients the GP state). The VJP additionally assumes blam and m2 are
    SYMMETRIC — always true for b_lam = (Ky^{-1} - beta beta^T) o (sym factors)
    and for m2 = (Lambda/2 + S)^{-1} (with t = sum_ij blam_ij
    exp(-1/8 s^T M2 s), s = a_i + a_j, symmetry collapses the four
    gradient terms into the two the backward computes)."""
    rw = _rw_dispatch(u, m2, x, blam, tied=False)
    return jnp.sum(rw[..., 0], axis=-1)


def _vtb_fwd(u, m2, x, blam):
    # The kernel's rw output doubles as the VJP residual: the backward is pure
    # O(N d) XLA contractions — nothing N^2-sized is recomputed or stored.
    rw = _rw_dispatch(u, m2, x, blam, tied=False)
    return jnp.sum(rw[..., 0], axis=-1), (u, m2, x, blam, rw)


@f32_matmul_precision
def _vtb_bwd(res, ct):
    u, m2, x, blam, rw = res
    a = u[:, None, :] - x[None]                    # (B, N, d)
    r = rw[..., 0]                                 # (B, E, N)
    wa = rw[..., 1:]                               # (B, E, N, d)
    z0 = jnp.einsum('bnd,ben->bed', a, r)
    du = -jnp.einsum('be,bedk,bek->bd', ct, m2, z0)
    war = wa + a[:, None] * r[..., None]           # W A + diag(r) A
    dm2 = -0.25 * jnp.einsum('bnd,benk->bedk', a, ct[..., None, None] * war)
    return du, dm2, jnp.zeros_like(x), jnp.zeros_like(blam)


variance_trace_batched.defvjp(_vtb_fwd, _vtb_bwd)


@jax.custom_vjp
def variance_trace_batched_tied(u, m2, x, blam):
    """Tied-lambdas batched fused trace: u (B, d); m2 (B, d, d) SHARED across
    outputs; x (N, d); blam (E, N, N) -> (B, E). Same math as
    variance_trace_batched with m2 broadcast over E, but the O(N^2) exp chain
    runs once per scenario instead of once per (scenario, output)."""
    rw = _rw_dispatch(u, m2, x, blam, tied=True)
    return jnp.sum(rw[..., 0], axis=-1)


def _vtt_fwd(u, m2, x, blam):
    rw = _rw_dispatch(u, m2, x, blam, tied=True)
    return jnp.sum(rw[..., 0], axis=-1), (u, m2, x, blam, rw)


@f32_matmul_precision
def _vtt_bwd(res, ct):
    u, m2, x, blam, rw = res
    a = u[:, None, :] - x[None]                    # (B, N, d)
    r = rw[..., 0]                                 # (B, E, N)
    wa = rw[..., 1:]                               # (B, E, N, d)
    # Same per-output cotangents as the untied VJP, summed over e because m2
    # is shared.
    z0c = jnp.einsum('bnd,ben,be->bd', a, r, ct)
    du = -jnp.einsum('bdk,bk->bd', m2, z0c)
    warc = jnp.einsum('be,benk->bnk', ct, wa + a[:, None] * r[..., None])
    dm2 = -0.25 * jnp.einsum('bnd,bnk->bdk', a, warc)
    return du, dm2, jnp.zeros_like(x), jnp.zeros_like(blam)


variance_trace_batched_tied.defvjp(_vtt_fwd, _vtt_bwd)


def variance_trace_batched_reference(u, m2, x, blam):
    """Pure-jnp twin of variance_trace_batched (fallback + test oracle)."""
    a = u[:, None, :] - x[None]                    # (B, N, d)
    g = jnp.einsum('bnd,bedk->benk', a, m2)        # (B, E, N, d)
    p = jnp.einsum('bend,bmd->benm', g, a)         # (B, E, N, N)
    q = jnp.sum(g * a[:, None], axis=-1)           # (B, E, N)
    dvec = _exp(-0.125 * q)
    w = blam[None] * _exp(-0.25 * p)
    return jnp.einsum('ben,benm,bem->be', dvec, w, dvec)


def variance_trace_batched_tied_reference(u, m2, x, blam):
    """Pure-jnp twin of variance_trace_batched_tied (fallback + test oracle)."""
    e = blam.shape[0]
    m2b = jnp.broadcast_to(m2[:, None], (m2.shape[0], e) + m2.shape[1:])
    return variance_trace_batched_reference(u, m2b, x, blam)


# --------------------------------------------- model-axis sharded partials --
# The TP path (parallel/model_sharded.py) splits the O(B N^2) trace over a
# 'model' mesh axis: each device holds a row block of the symmetric blam and
# computes a PARTIAL trace that psums across the axis. This op is that
# per-shard partial, kernelized (VERDICT r2/r3: the sharded path previously
# ran the XLA einsum form only).
#
# Contract: with the full symmetric W' = blam o exp(-1/4 p) o (dv dv^T),
#   t_part = sum_{c in block} dv_c sum_{j in FULL} W'_jc dv_j,
# so sum over shards of t_part == the full trace. The backward returns the
# SYMMETRY-COLLAPSED cotangents restricted to the block (the same formulas as
# _vtt_bwd on the block's rows); each shard's value is NOT dt_part/d(u) in
# isolation, but the SUM over shards equals the exact full gradient — valid
# precisely because the caller psums the cotangents over the model axis
# (shard_map's transpose of a replicated input). Use only under that pattern.


def supported_tied_block(n_c: int, n_out: int, d: int, dtype, e: int) -> bool:
    """Kernel support envelope for the rectangular block dispatch."""
    if not (n_c % 128 == 0 and n_out % 128 == 0 and d <= 8
            and dtype == jnp.float32):
        return False
    tj = 128
    return (e * n_out * tj * 4 + 4 * n_out * tj * 4
            + e * n_out * (1 + d) * 4) <= 10 * 1024 * 1024


def _rw_block_dispatch(u, m2, x, x_blk, blam_t_blk):
    """Shared fwd for the block partial: full-N comb, block-row g/dv."""
    a = u[:, None, :] - x[None]                     # (B, N, d)
    g_full = _vpu_mm(a, m2[:, None])                # (B, N, d)
    q = jnp.sum(g_full * a, axis=-1)
    dvec = _exp(-0.125 * q)                         # (B, N)
    a_blk = u[:, None, :] - x_blk[None]             # (B, Nl, d)
    g_blk = _vpu_mm(a_blk, m2[:, None])
    q_blk = jnp.sum(g_blk * a_blk, axis=-1)
    dv_blk = _exp(-0.125 * q_blk)                   # (B, Nl)
    comb = jnp.concatenate(
        [a, _aug(a) * dvec[..., None]], axis=-1)    # (B, N, d + 1+d)
    return _rw_call_tied_nm(g_blk, dv_blk, comb, blam_t_blk, tj=128)


@jax.custom_vjp
def variance_trace_tied_block(u, m2, x, x_blk, blam_t_blk):
    """Per-shard partial of the tied fused trace.

    u: (B, d); m2: (B, d, d); x: (N, d) FULL replicated training inputs;
    x_blk: (Nl, d) this shard's rows; blam_t_blk: (E, N, Nl) — the shard's
    blam row block TRANSPOSED (column block of the symmetric full blam)
    -> (B, E) partial traces (psum over the model axis gives the full trace).
    """
    rw = _rw_block_dispatch(u, m2, x, x_blk, blam_t_blk)
    return jnp.sum(rw[..., 0], axis=-1)


def _vttb_fwd(u, m2, x, x_blk, blam_t_blk):
    rw = _rw_block_dispatch(u, m2, x, x_blk, blam_t_blk)
    return jnp.sum(rw[..., 0], axis=-1), (u, m2, x, x_blk, blam_t_blk, rw)


@f32_matmul_precision
def _vttb_bwd(res, ct):
    u, m2, x, x_blk, blam_t_blk, rw = res
    # _vtt_bwd restricted to the block's rows (see the contract note above:
    # exact only after the caller's psum over the model axis).
    a = u[:, None, :] - x_blk[None]                 # (B, Nl, d)
    r = rw[..., 0]                                  # (B, E, Nl)
    wa = rw[..., 1:]                                # (B, E, Nl, d)
    z0c = jnp.einsum('bnd,ben,be->bd', a, r, ct)
    du = -jnp.einsum('bdk,bk->bd', m2, z0c)
    warc = jnp.einsum('be,benk->bnk', ct, wa + a[:, None] * r[..., None])
    dm2 = -0.25 * jnp.einsum('bnd,bnk->bdk', a, warc)
    return (du, dm2, jnp.zeros_like(x), jnp.zeros_like(x_blk),
            jnp.zeros_like(blam_t_blk))


variance_trace_tied_block.defvjp(_vttb_fwd, _vttb_bwd)

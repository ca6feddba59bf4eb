"""Correctly-rounded-grade f32 transcendentals for TPU.

TPU's VPU `exp` approximation carries ~10 ulp median / ~45 ulp max relative
error (measured on this chip over [-40, 0]; CPU libm is ~0.5 ulp). That
sounds harmless, but the GP moment-propagation contractions are
cancellation-amplified: sum_j beta_j l_j and tr(b_lam o expP) have
sum|terms| / |result| amplification of 10^2-10^3, and the exp error is a
deterministic function of the argument — it does not average out. The
measured effect on the headline rollout (H = 20 recurrence) is a ~100x
precision loss vs CPU f32, which moves the risk-sensitive optimum by several
percent in cost — the round-3 TPU quality gap.

`exp_f32` replaces the hardware approximation with a Cody-Waite
range-reduced degree-6 polynomial evaluated in exact f32 VPU mul/adds:

    exp(x) = 2^k * P(r),  k = round(x log2 e),  r = x - k ln2 (two-term)

with 2^k built by exponent-field bit assembly (TPU's `exp2` is ~4e-6
relative even on INTEGER arguments, so it cannot be used here). Measured on
this chip: ~2 ulp max over the GP-relevant [-40, 0] (~3 ulp over the full
normal range), ~7% slower than `jnp.exp` on a memory-bound exp+sum sweep.
Inputs below ln(f32 min normal) = -87.33 flush to 0 (`jnp.exp` returns
subnormals down to ~-103; GP exponents never live there); +inf/NaN propagate.

Reference role: the reference runs torch f64 on CPU (uncertainty_prop.py)
and never faces this; this module is what makes the f32 TPU hot path match
CPU-f32 accuracy so the solver sees the same landscape the oracles test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LOG2E = np.float32(1.4426950408889634)
_LN2_HI = np.float32(0.693359375)        # 0x1.62ep-1: 11 mantissa bits, so
_LN2_LO = np.float32(-2.12194440e-4)     # k * _LN2_HI is exact for |k| < 2^12
# Degree-6 Taylor for e^r on r in [-ln2/2, ln2/2]; remainder ~1.2e-7 absolute
# (~8.4e-8 relative) at the interval ends. Measured: ~3 ulp max over [-86, 87]
# on CPU; ~2 ulp over the GP-relevant [-40, 0] on this chip.
_EXP_COEFFS = tuple(np.float32(c) for c in
                    (1.0 / 720, 1.0 / 120, 1.0 / 24, 1.0 / 6, 0.5, 1.0, 1.0))
_UNDERFLOW_X = np.float32(-87.33)        # ln(f32 min normal) = -87.3365


def _exp_f32_impl(x):
    k = jnp.round(x * _LOG2E)
    r = (x - k * _LN2_HI) - k * _LN2_LO
    p = jnp.full_like(r, _EXP_COEFFS[0])
    for c in _EXP_COEFFS[1:]:
        p = p * r + c
    # 2^k by exponent-field assembly (exact; TPU exp2 is approximate even on
    # integers). k is clamped so the bit pattern stays a normal float; the
    # underflow/overflow branches below own the out-of-range behavior.
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    pow2k = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    y = p * pow2k
    y = jnp.where(x < _UNDERFLOW_X, jnp.zeros_like(y), y)
    # x > 88: defer to the hardware exp. In (88.0, 88.72] the result is still
    # a finite f32, so that window gets the ~45-ulp hardware accuracy (2^k
    # needs k = 128, beyond exponent-field assembly); harmless for the
    # negative-exponent GP use. Above 88.72 (inf) and at NaN accuracy is moot.
    return jnp.where(x > 88.0, jnp.exp(x), y)


@jax.custom_jvp
def exp_f32(x):
    """Accurate f32 exp for TPU hot paths (see module docstring). Safe on any
    backend/dtype — on f64 inputs the plain `jnp.exp` is used (libm-grade
    already, and the constants here are f32-tuned)."""
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    return _exp_f32_impl(x)


@exp_f32.defjvp
def _exp_f32_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = exp_f32(x)
    return y, y * dx

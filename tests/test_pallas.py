"""Pallas fused variance-trace kernel: forward vs jnp twin, analytic VJP vs
autodiff, and dispatch-equivalence of variance_prop_cached (runs in interpreter
mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.ops.pallas import variance_trace as vt

RNG = np.random.default_rng(77)
N, D = 128, 3


def _problem():
    x = jnp.asarray(RNG.uniform(-2, 2, (N, D)), jnp.float32)
    raw = RNG.normal(size=(N, N))
    blam = jnp.asarray((raw + raw.T) / 8, jnp.float32)
    u = jnp.asarray(RNG.uniform(-1, 1, D), jnp.float32)
    m = RNG.normal(size=(D, D))
    m2 = jnp.asarray(m @ m.T / 4 + 0.5 * np.eye(D), jnp.float32)
    return u, m2, x, blam


class TestVarianceTraceKernel:
    def test_forward_matches_reference(self):
        u, m2, x, blam = _problem()
        t_ref = float(vt.variance_trace_reference(u, m2, x, blam))
        t_pal = float(vt.variance_trace(u, m2, x, blam))
        assert abs(t_ref - t_pal) / abs(t_ref) < 1e-5

    def test_analytic_vjp_matches_autodiff(self):
        u, m2, x, blam = _problem()
        gu_r, gm_r = jax.grad(
            lambda a, b: vt.variance_trace_reference(a, b, x, blam),
            argnums=(0, 1))(u, m2)
        gu_p, gm_p = jax.grad(
            lambda a, b: vt.variance_trace(a, b, x, blam),
            argnums=(0, 1))(u, m2)
        np.testing.assert_allclose(np.asarray(gu_p), np.asarray(gu_r),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_r),
                                   rtol=1e-3, atol=1e-5)

    def test_cache_operands_zero_grad(self):
        u, m2, x, blam = _problem()
        gx, gb = jax.grad(lambda a, b: vt.variance_trace(u, m2, a, b),
                          argnums=(0, 1))(x, blam)
        assert float(jnp.max(jnp.abs(gx))) == 0.0
        assert float(jnp.max(jnp.abs(gb))) == 0.0

    def test_vmap(self):
        u, m2, x, blam = _problem()
        us = jnp.stack([u, u * 0.5, -u])
        m2s = jnp.broadcast_to(m2, (3, D, D))
        out = jax.vmap(vt.variance_trace, in_axes=(0, 0, None, None))(
            us, m2s, x, blam)
        ref = jnp.stack([vt.variance_trace_reference(us[i], m2, x, blam)
                         for i in range(3)])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_dispatch_equivalence(self):
        """variance_prop_cached must agree between forced-pallas and
        forced-jnp dispatch."""
        from gpmpc_tpu.ops import moments
        u, m2, x, blam = _problem()
        S = jnp.asarray(0.05 * np.eye(D), jnp.float32)
        log_lam = jnp.zeros(D, jnp.float32)
        log_sf = jnp.zeros((), jnp.float32)
        cache = moments.VarianceCache(b_lam=blam)
        os.environ['GPMPC_FORCE_PALLAS'] = '1'
        try:
            v_pal = moments.variance_prop_cached(u, S, x, cache, log_lam,
                                                 log_sf, jnp.float32(0.3))
        finally:
            del os.environ['GPMPC_FORCE_PALLAS']
        os.environ['GPMPC_DISABLE_PALLAS'] = '1'
        try:
            v_jnp = moments.variance_prop_cached(u, S, x, cache, log_lam,
                                                 log_sf, jnp.float32(0.3))
        finally:
            del os.environ['GPMPC_DISABLE_PALLAS']
        np.testing.assert_allclose(float(v_pal), float(v_jnp), rtol=1e-4)

    def test_unsupported_shapes_fall_back(self):
        assert not vt.supported(100, 3, jnp.float32)   # N not tile-aligned
        assert not vt.supported(128, 12, jnp.float32)  # d too large
        assert not vt.supported(128, 3, jnp.float64)   # dtype
        assert vt.supported(256, 6, jnp.float32)

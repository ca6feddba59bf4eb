"""Test harness configuration.

Tests run on CPU with 8 virtual devices (sharding/mesh tests) and x64 enabled
(numeric-oracle comparisons against NumPy references need f64; the library
itself is dtype-polymorphic and runs f32/bf16 on TPU).

NOTE: this environment registers a TPU backend from sitecustomize at interpreter
start, so the platform must be overridden via jax.config, not env vars.
"""

import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# NOTE: do NOT enable the persistent compilation cache for CPU tests — the
# XLA:CPU AOT loader flags a compile/host machine-feature mismatch on this
# machine ("could lead to execution errors such as SIGILL") and reloaded
# entries produced flaky numeric failures (observed on
# test_parallel.py::test_sharded_matches_unsharded).

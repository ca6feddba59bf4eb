"""Provenance stamps for benchmark artifacts (VERDICT r3 weak #9: r02-vs-r03
comparisons required git archaeology because the JSON writers recorded no
commit/device/flags). Every benchmark writer embeds `provenance()` so any
results/*.json is self-describing."""

from __future__ import annotations

import os
import subprocess
import sys
import time


def provenance(extra: dict | None = None) -> dict:
    try:
        commit = subprocess.run(
            ['git', 'rev-parse', '--short', 'HEAD'],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = 'unknown'
    try:
        import jax
        backend = jax.default_backend()
        device = str(jax.devices()[0])
    except Exception:
        backend, device = 'unknown', 'unknown'
    out = {
        'commit': commit or 'unknown',
        'backend': backend,
        'device': device,
        'date': time.strftime('%Y-%m-%dT%H:%M:%S'),
        'argv': ' '.join(sys.argv),
        'env_flags': {k: v for k, v in os.environ.items()
                      if k.startswith(('GPMPC_', 'JAX_', 'XLA_FLAGS'))},
    }
    if extra:
        out.update(extra)
    return out

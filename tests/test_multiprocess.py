"""Two-process distributed execution test (VERDICT r1 item 3).

Launches two OS processes, each with 4 virtual CPU devices, that initialize
`jax.distributed` against a local coordinator and run the multihost solve
over the global 8-device mesh (gpmpc_tpu.parallel.distributed). Each rank
asserts its shard of the global result equals the single-process answer —
see tests/multiprocess_worker.py. This pins the actual multi-process code
path (`jax.distributed.initialize` + global mesh + shard_map), which the
in-process 8-virtual-device tests cannot."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), 'multiprocess_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_solve_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen([sys.executable, _WORKER, str(r), '2',
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for r in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multi-process workers timed out:\n' + '\n'.join(outs))
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {r} failed:\n{out[-4000:]}'
        assert f'RANK{r} OK' in out

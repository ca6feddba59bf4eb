"""Compute one 64-lane slice of the B=256 f64 reference solve (CPU).

The 600-iteration f64 reference at B=256 runs ~90+ min single-process (the
lockstep while_loop parallelizes poorly on CPU); the lanes are independent,
so 4 slice processes finish ~4x faster. Usage:
    python benchmarks/ref_slice.py <slice_idx 0..3> <out.npz>
Then merge with ref_slice.py merge.
"""

import sys

import numpy as np

REPO = '/root/repo'
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    from benchmarks.problems import make_headline_problem
    from gpmpc_tpu.mpc.solver import SolverConfig
    from gpmpc_tpu.parallel import batch as pbatch

    if sys.argv[1] == 'merge':
        outs = [np.load(f'/tmp/ref_b256_slice{i}.npz')['u_ref']
                for i in range(4)]
        np.savez(sys.argv[2], u_ref=np.concatenate(outs, axis=0))
        print('merged', sys.argv[2])
        return

    idx = int(sys.argv[1])
    out = sys.argv[2]
    prob = make_headline_problem(b=256, dtype=jnp.float64)
    sl = slice(64 * idx, 64 * (idx + 1))
    params = pbatch._gather_params(prob.params, 256,
                                   jnp.arange(64 * idx, 64 * (idx + 1)))
    res = pbatch.solve_batch(prob.gp, prob.state_dim, prob.action_dim,
                             prob.x0s[sl], params, prob.horizon,
                             prob.lb, prob.ub,
                             SolverConfig(method='lbfgs', max_iters=600,
                                          tol=1e-9))
    np.savez(out, u_ref=np.asarray(res.u, np.float64))
    print('slice', idx, 'saved')


if __name__ == '__main__':
    main()

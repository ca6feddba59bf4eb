"""Reference-side per-step control-latency anchor (VERDICT r2 item 8).

BASELINE.json's latency metric is "p50 per-step control latency vs the IPOPT
reference", but the reference's solver stack cannot run verbatim on this image:
`cyipopt` is not installed and package installation is prohibited in this
environment (documented attempt: `import cyipopt` -> ModuleNotFoundError;
pip/apt are disallowed by the build environment policy). What CAN run is
everything around IPOPT: the reference's own torch GP dynamics
(src/dynamics.py:126 forward_propagate_torch), its risk-sensitive cost
(src/mpc.py:156 cost_torch), and its exact solver callbacks
(src/mpc.py:202 objective / :231 gradient) — imported UNMODIFIED from
/root/reference with only the module-level `import cyipopt` satisfied by an
empty stub module.

The anchor drives those callbacks with scipy L-BFGS-B in place of IPOPT —
the same Python<->native-solver callback architecture (one torch rollout
forward + one cached backward per iterate, a device sync per callback,
SURVEY.md §3.2-3.3) — at the reference's own budget semantics (tol 1e-4,
<=300 iterations, src/mpc.py:308-320), on the SAME headline problem
(ds=2, da=1, N=200, H=20) used by bench.py and benchmarks/quality.py.

Two caveats, both conservative (they UNDERSTATE reference latency):
  - L-BFGS-B per-iterate work is lighter than an IPOPT interior-point
    iteration (no barrier subproblem / KKT factorization);
  - the reference's informal timing of IPOPT with torch-autograd gradients
    records an extra ~18x callback overhead vs analytic gradients on hs071
    (src/test/test_ipopt_pytorch.py:18-21), none of which is counted here.

Writes benchmarks/results/ref_anchor.json and prints one JSON line.
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = '/root/reference'


def load_reference_mpc():
    """Import the reference's RiskSensitiveMPC with cyipopt stubbed out.

    Only `get_optimal_trajectory` (which constructs cyipopt.Problem,
    src/mpc.py:298-306) needs the real binding; the objective/gradient
    callbacks and the dynamics/cost stack are pure torch."""
    if 'cyipopt' not in sys.modules:
        sys.modules['cyipopt'] = types.ModuleType('cyipopt')
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from src.mpc import RiskSensitiveMPC        # noqa: E402
    return RiskSensitiveMPC


def make_reference_problem(horizon=20, n_train=200, seed=0):
    """The headline problem (benchmarks/problems.py make_headline_problem)
    instantiated on the reference stack: same dynamics data, same
    hyperparameters, same cost weights; gamma fixed to the sweep's center."""
    RiskSensitiveMPC = load_reference_mpc()
    ds, da = 2, 1
    rng = np.random.default_rng(seed)
    states = rng.uniform(-np.pi, np.pi, (n_train, ds))
    actions = rng.uniform(-5, 5, (n_train, da))
    next_states = states + 0.05 * np.concatenate(
        [states[:, 1:], 15 * np.sin(states[:, :1]) + 3 * actions], axis=1)

    mpc = RiskSensitiveMPC(gamma=0.25, horizon=horizon, state_dim=ds,
                           input_dim=da, Q=2.0 * np.eye(ds),
                           R=0.01 * np.eye(da))
    mpc.dynamics.append_train_data(states, actions, next_states)
    for i in range(ds):
        mpc.dynamics.gpr_err[i].set_lambdas(np.array([4.0] * (ds + da)))
        mpc.dynamics.gpr_err[i].set_sigma_f(1.0)
        mpc.dynamics.gpr_err[i].set_sigma_n(0.1)
    return mpc


def solve_reference(mpc, x0, lb=-5.0, ub=5.0, maxiter=300, tol=1e-4):
    """One per-step control solve through the reference's own callbacks."""
    import torch
    from scipy.optimize import minimize

    h, da = mpc.horizon, mpc.input_dim
    mpc.curr_state = torch.tensor(x0, dtype=torch.float64,
                                  device=mpc.device)
    n = h * da
    res = minimize(mpc.objective, np.zeros(n), jac=mpc.gradient,
                   method='L-BFGS-B', bounds=[(lb, ub)] * n,
                   options={'maxiter': maxiter, 'ftol': 0.0, 'gtol': tol})
    return res


def main():
    import torch

    mpc = make_reference_problem()
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-1, 1, (16, 2))

    # --- direct per-callback latency: one IPOPT/L-BFGS-B iterate costs one
    # objective (torch rollout forward) + one gradient (cached backward,
    # src/mpc.py:231-255). Measured at random interior points, which avoids
    # the reference's cold-start NaN region (see below). -------------------
    n = mpc.horizon * mpc.input_dim
    mpc.curr_state = torch.tensor(x0s[0], dtype=torch.float64,
                                  device=mpc.device)
    _ = mpc.objective(rng.uniform(-1, 1, n))          # torch warmup
    _ = mpc.gradient(rng.uniform(-1, 1, n))
    cb = []
    for _ in range(20):
        u = rng.uniform(-2, 2, n)
        t0 = time.perf_counter()
        _ = mpc.objective(u)
        _ = mpc.gradient(u)
        cb.append(time.perf_counter() - t0)
    callback_ms_p50 = 1000.0 * float(np.percentile(cb, 50))

    # --- full solves. IMPORTANT measured fact (round 5): the REFERENCE
    # rollout itself produces NEGATIVE variances -> NaN from the cold start
    # u = 0 on a fraction of initial states of this workload (its moment
    # matching has no variance floor and its cost no PD guard — the exact
    # hardening SURVEY.md hard-part 5 calls for and gpmpc_tpu implements).
    # scipy then aborts with nit=0 after burning the line-search budget —
    # the source of round 4's bogus iters_p50=0. Aborted solves are counted
    # separately; latency percentiles use successful solves only
    # (conservative: aborts cost MORE wall time than successes). ----------
    lat, nit, nfev, aborted = [], [], [], 0
    for x0 in x0s:
        t0 = time.perf_counter()
        res = solve_reference(mpc, x0)
        dt_s = time.perf_counter() - t0
        if int(res.nit) == 0 or not np.isfinite(res.fun):
            aborted += 1
            continue
        lat.append(dt_s)
        nit.append(int(res.nit))
        nfev.append(int(res.nfev))
    out = {
        'what': ('reference-stack per-step control latency: unmodified '
                 'src/mpc.py objective/gradient callbacks (torch f64 '
                 'rollout, src/dynamics.py:126) driven by scipy L-BFGS-B '
                 'at the reference budget (tol 1e-4, max 300 iters, '
                 'src/mpc.py:308-320); cyipopt unavailable on this image '
                 '(install prohibited) — see module docstring for why this '
                 'UNDERSTATES true IPOPT latency'),
        'horizon': 20, 'n_train': 200, 'n_solves': len(x0s),
        'n_aborted_nan': aborted,
        'abort_note': ('aborted = reference rollout NaN (negative variance, '
                       'no floor) from the cold start; excluded from '
                       'latency percentiles'),
        'callback_ms_p50': callback_ms_p50,
        'latency_s_p50': float(np.percentile(lat, 50)) if lat else None,
        'latency_s_min': float(np.min(lat)) if lat else None,
        'latency_s_max': float(np.max(lat)) if lat else None,
        'iters_p50': float(np.percentile(nit, 50)) if nit else None,
        'nfev_p50': float(np.percentile(nfev, 50)) if nfev else None,
        'per_iterate_ms_p50': float(np.percentile(
            [1000.0 * t / max(k, 1) for t, k in zip(lat, nfev)], 50))
        if lat else None,
        'ref_budget_solve_s_est': (
            callback_ms_p50 / 1000.0 * 300,
            'callback p50 x the reference max_iter=300 budget '
            '(src/mpc.py:313)'),
    }
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'results')
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'ref_anchor.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

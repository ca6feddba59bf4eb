"""gpmpc_tpu — a TPU-native Gaussian-Process Model-Predictive-Control framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`Thiagodcv/gaussian-process-mpc` reference (see /root/repo/SURVEY.md):

- Exact GP regression with ARD squared-exponential kernels, built on padded/masked
  static-shape buffers and Cholesky factorizations (reference: gpr.py, torch + explicit
  `linalg.inv`/`det`).
- Analytic uncertain-input moment propagation (Girard / Quinonero-Candela mean,
  variance, and cross-covariance; reference: tools/uncertainty_prop.py).
- A `lax.scan` multi-step uncertain rollout of a bundle of per-output GPs
  (reference: dynamics.py).
- A risk-sensitive (gamma-weighted mean + variance) MPC cost with an explicit
  gamma -> 0 risk-neutral limit (reference: mpc.py cost/cost_torch).
- A jitted, batched, box-constrained trajectory optimizer that replaces the
  reference's CPU IPOPT callback loop (reference: mpc.py get_optimal_trajectory).
- Pure-jnp plant models (pendulum, cartpole) so whole episodes run on device
  (reference: environments/*.py, models/pendulum.py).
- vmap/shard_map scenario fan-out across device meshes (no analog in reference).
"""

from gpmpc_tpu.gp.state import GPConfig, GPState, make_gp, fit, append, gp_append
from gpmpc_tpu.gp.exact import predict, log_marginal_likelihood
from gpmpc_tpu.dynamics import RolloutCache, build_rollout_cache, rollout
from gpmpc_tpu.mpc.cost import CostParams, risk_sensitive_cost
from gpmpc_tpu.mpc.solver import SolverConfig, solve_trajectory
from gpmpc_tpu.mpc.controller import RiskSensitiveMPC
from gpmpc_tpu.sim.simulator import Simulator

__version__ = "0.1.0"

// Box-constrained NLP solver — the native-runtime counterpart of the
// reference's IPOPT dependency (mpc.py:298-326 drives cyipopt/IPOPT, the only
// C++ component of the reference system; SURVEY.md §2.3).
//
// The TPU build's production solve path is the jitted on-device projected-Adam
// loop (gpmpc_tpu/mpc/solver.py). This library provides the host-side native
// counterpart used (a) as a cross-validation oracle for the JAX solver in
// tests — the role IPOPT plays in the reference's known-answer experiment
// (test_experiment.py) — and (b) as a dependency-free CPU fallback solver.
//
// Algorithm: projected L-BFGS (two-loop recursion, m=8 memory) with
// projected-backtracking Armijo line search and the projected-gradient
// infinity norm as the first-order stopping criterion — the standard
// L-BFGS-B-style treatment of box constraints.
//
// C API (ctypes-friendly), no external dependencies.

#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// Evaluate objective and gradient at x (length n); returns f(x).
typedef double (*obj_grad_fn)(const double* x, double* grad, int n,
                              void* user_data);

struct SolveStats {
  int iterations;
  int func_evals;
  double final_objective;
  double pg_norm;   // projected-gradient infinity norm at the solution
  int converged;    // 1 if pg_norm < tol
};

static inline double clampd(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

static double pg_inf_norm(const std::vector<double>& x,
                          const std::vector<double>& g,
                          const double* lb, const double* ub, int n) {
  double m = 0.0;
  for (int i = 0; i < n; ++i) {
    double step = clampd(x[i] - g[i], lb[i], ub[i]) - x[i];
    double a = std::fabs(step);
    if (a > m) m = a;
  }
  return m;
}

int gpmpc_solve_box(obj_grad_fn fg, void* user, double* x_io, int n,
                    const double* lb, const double* ub, int max_iters,
                    double tol, SolveStats* stats) {
  const int mem = 8;
  std::vector<double> x(x_io, x_io + n), g(n), x_new(n), g_new(n), d(n);
  std::vector<std::vector<double>> s_hist, y_hist;
  std::vector<double> rho_hist;

  for (int i = 0; i < n; ++i) x[i] = clampd(x[i], lb[i], ub[i]);
  double f = fg(x.data(), g.data(), n, user);
  int evals = 1, iter = 0, restarts = 0;
  std::vector<double> gf(n);

  for (iter = 0; iter < max_iters; ++iter) {
    double pg = pg_inf_norm(x, g, lb, ub, n);
    if (pg < tol) break;

    // Two-metric projection (Gafni-Bertsekas, mirroring mpc/solver.py): the
    // quasi-Newton direction is built from the FREE gradient only;
    // bound-active coordinates take plain gradient steps that the projection
    // handles. Feeding the full gradient lets curvature pairs from clipped
    // steps steer the direction into the active set, where projection
    // annihilates it and the line search stalls.
    std::vector<bool> active(n);
    for (int i = 0; i < n; ++i) {
      double eps_act = 1e-6 * (1.0 + std::fabs(x[i]));
      active[i] = (x[i] <= lb[i] + eps_act && g[i] > 0.0) ||
                  (x[i] >= ub[i] - eps_act && g[i] < 0.0);
      gf[i] = active[i] ? 0.0 : g[i];
    }

    // Two-loop recursion for d = -H gf.
    std::memcpy(d.data(), gf.data(), n * sizeof(double));
    int h = static_cast<int>(s_hist.size());
    std::vector<double> alpha(h);
    for (int k = h - 1; k >= 0; --k) {
      double a = 0.0;
      for (int i = 0; i < n; ++i) a += s_hist[k][i] * d[i];
      a *= rho_hist[k];
      alpha[k] = a;
      for (int i = 0; i < n; ++i) d[i] -= a * y_hist[k][i];
    }
    if (h > 0) {
      double sy = 0.0, yy = 0.0;
      for (int i = 0; i < n; ++i) {
        sy += s_hist[h - 1][i] * y_hist[h - 1][i];
        yy += y_hist[h - 1][i] * y_hist[h - 1][i];
      }
      double scale = (yy > 0.0) ? sy / yy : 1.0;
      for (int i = 0; i < n; ++i) d[i] *= scale;
    }
    for (int k = 0; k < h; ++k) {
      double b = 0.0;
      for (int i = 0; i < n; ++i) b += y_hist[k][i] * d[i];
      b *= rho_hist[k];
      for (int i = 0; i < n; ++i) d[i] += (alpha[k] - b) * s_hist[k][i];
    }
    for (int i = 0; i < n; ++i) d[i] = active[i] ? -g[i] : -d[i];

    // Ensure descent (fall back to steepest descent if curvature went bad).
    double gd = 0.0;
    for (int i = 0; i < n; ++i) gd += g[i] * d[i];
    if (gd > -1e-16) {
      for (int i = 0; i < n; ++i) d[i] = -g[i];
    }

    // Projected Armijo line search: backtrack from t = 1, and if the unit
    // step is accepted, forward-track by doubling while Armijo keeps holding
    // (flat directions — e.g. weakly-weighted terminal controls — need
    // t >> 1 to traverse the box; the quasi-Newton unit-step convention only
    // holds when the metric is well-scaled, which two-metric freezing breaks).
    double t = 1.0, f_new = f;
    const double c1 = 1e-4;
    bool accepted = false;
    for (int ls = 0; ls < 30; ++ls) {
      for (int i = 0; i < n; ++i)
        x_new[i] = clampd(x[i] + t * d[i], lb[i], ub[i]);
      f_new = fg(x_new.data(), g_new.data(), n, user);
      ++evals;
      // Armijo on the actual (projected) step.
      double dec = 0.0;
      for (int i = 0; i < n; ++i) dec += g[i] * (x_new[i] - x[i]);
      if (f_new <= f + c1 * dec || dec >= 0.0) {
        accepted = (f_new <= f) || dec < 0.0;
        if (accepted) break;
      }
      t *= 0.5;
    }
    if (accepted && t == 1.0) {
      std::vector<double> x_fwd(n), g_fwd(n);
      double t_fwd = 2.0;
      for (int ls = 0; ls < 20; ++ls) {
        for (int i = 0; i < n; ++i)
          x_fwd[i] = clampd(x[i] + t_fwd * d[i], lb[i], ub[i]);
        double f_fwd = fg(x_fwd.data(), g_fwd.data(), n, user);
        ++evals;
        double dec = 0.0;
        for (int i = 0; i < n; ++i) dec += g[i] * (x_fwd[i] - x[i]);
        if (!(dec < 0.0) || !(f_fwd <= f + c1 * dec) || !(f_fwd < f_new)) break;
        x_new = x_fwd;
        g_new = g_fwd;
        f_new = f_fwd;
        t_fwd *= 2.0;
      }
    }
    if (!accepted) {
      // Line-search failure means the CURRENT metric cannot make progress,
      // not that x is stationary: restart from steepest descent (history
      // cleared); only repeated failure declares the noise floor reached.
      if (restarts < 2 && !s_hist.empty()) {
        s_hist.clear();
        y_hist.clear();
        rho_hist.clear();
        ++restarts;
        continue;
      }
      break;
    }

    // Curvature update (cosine-gated: noise-floor pairs poison the metric).
    std::vector<double> s(n), y(n);
    double sy = 0.0, ss = 0.0, yyn = 0.0;
    for (int i = 0; i < n; ++i) {
      s[i] = x_new[i] - x[i];
      y[i] = g_new[i] - g[i];
      sy += s[i] * y[i];
      ss += s[i] * s[i];
      yyn += y[i] * y[i];
    }
    if (sy > 1e-12 && sy > 1e-8 * std::sqrt(ss * yyn)) {
      if (static_cast<int>(s_hist.size()) == mem) {
        s_hist.erase(s_hist.begin());
        y_hist.erase(y_hist.begin());
        rho_hist.erase(rho_hist.begin());
      }
      s_hist.push_back(std::move(s));
      y_hist.push_back(std::move(y));
      rho_hist.push_back(1.0 / sy);
    }
    x.swap(x_new);
    g.swap(g_new);
    f = f_new;
  }

  std::memcpy(x_io, x.data(), n * sizeof(double));
  if (stats) {
    stats->iterations = iter;
    stats->func_evals = evals;
    stats->final_objective = f;
    stats->pg_norm = pg_inf_norm(x, g, lb, ub, n);
    stats->converged = stats->pg_norm < tol ? 1 : 0;
  }
  return 0;
}

}  // extern "C"

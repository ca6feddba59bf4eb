"""Independent NumPy loop oracles for the GP / moment-matching math.

Written directly from the defining equations (Rasmussen & Williams ch. 2;
Quinonero-Candela et al. eqs. 21/31, A14) as deliberately naive double loops —
the same oracle-testing pattern the reference uses (SURVEY.md §4.1) — so the
vectorized TPU implementations are checked against a structurally different
computation, not themselves.
"""

import numpy as np


def se_kernel(x1, x2, lambdas, sigma_f):
    d = np.asarray(x1, float) - np.asarray(x2, float)
    return sigma_f ** 2 * np.exp(-0.5 * np.sum(d * d / lambdas))


def gram(xa, xb, lambdas, sigma_f):
    n, m = len(xa), len(xb)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            out[i, j] = se_kernel(xa[i], xb[j], lambdas, sigma_f)
    return out


def gp_fit(x, y, lambdas, sigma_f, sigma_n):
    """Returns (ky, ky_inv, beta) for a single-output GP."""
    ky = gram(x, x, lambdas, sigma_f) + sigma_n ** 2 * np.eye(len(x))
    ky_inv = np.linalg.inv(ky)
    beta = ky_inv @ np.asarray(y, float)
    return ky, ky_inv, beta


def gp_predict(x, y, x_pred, lambdas, sigma_f, sigma_n, include_noise=False):
    ky, ky_inv, beta = gp_fit(x, y, lambdas, sigma_f, sigma_n)
    ks = gram(x_pred, x, lambdas, sigma_f)
    mean = ks @ beta
    kpp = gram(x_pred, x_pred, lambdas, sigma_f)
    cov = kpp - ks @ ky_inv @ ks.T
    if include_noise:
        cov = cov + sigma_n ** 2 * np.eye(len(x_pred))
    return mean, cov


def log_ml(x, y, lambdas, sigma_f, sigma_n):
    ky, ky_inv, _ = gp_fit(x, y, lambdas, sigma_f, sigma_n)
    y = np.asarray(y, float)
    sign, logdet = np.linalg.slogdet(ky)
    return float(-0.5 * y @ ky_inv @ y - 0.5 * logdet
                 - 0.5 * len(x) * np.log(2 * np.pi))


def mean_prop(u, S, x, beta, lambdas, sigma_f):
    """Eq. 21/31: m = beta . l with the Gaussian-convolution weights l."""
    lam = np.diag(lambdas)
    lam_inv = np.diag(1.0 / lambdas)
    d = len(u)
    spl_inv = np.linalg.inv(S + lam)
    det_corr = np.linalg.det(lam_inv @ S + np.eye(d)) ** -0.5
    n = len(x)
    l = np.zeros(n)
    for j in range(n):
        diff = u - x[j]
        l[j] = sigma_f ** 2 * det_corr * np.exp(-0.5 * diff @ spl_inv @ diff)
    return float(beta @ l), l


def variance_prop(u, S, x, beta, ky_inv, lambdas, sigma_f):
    """Eq. of the L-matrix trace: explicit double loop."""
    m, _ = mean_prop(u, S, x, beta, lambdas, sigma_f)
    lam = np.diag(lambdas)
    lam_inv = np.diag(1.0 / lambdas)
    d = len(u)
    n = len(x)
    half = np.linalg.inv(lam / 2.0 + S)
    det_part = np.linalg.det(2.0 * lam_inv @ S + np.eye(d)) ** -0.5
    L = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            xb = 0.5 * (x[i] + x[j])
            dij = x[i] - x[j]
            L[i, j] = det_part * np.exp(
                -0.5 * (u - xb) @ half @ (u - xb)
                - 0.25 * dij @ lam_inv @ dij) * sigma_f ** 4
    var = sigma_f ** 2 - np.trace((ky_inv - np.outer(beta, beta)) @ L) - m ** 2
    return float(var), m


def covariance_prop(u, S, x, beta1, beta2, lambdas1, lambdas2,
                    sigma_f1, sigma_f2, m1, m2):
    """Eq. A14: cross-covariance of two GP outputs, explicit double loop."""
    lam1_inv = np.diag(1.0 / lambdas1)
    lam2_inv = np.diag(1.0 / lambdas2)
    d = len(u)
    n = len(x)
    r = S @ (lam1_inv + lam2_inv) + np.eye(d)
    r_inv = np.linalg.inv(r)
    det_part = np.linalg.det(r) ** -0.5
    qt = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            k1 = sigma_f1 ** 2 * np.exp(-0.5 * (x[i] - u) @ lam1_inv @ (x[i] - u))
            k2 = sigma_f2 ** 2 * np.exp(-0.5 * (x[j] - u) @ lam2_inv @ (x[j] - u))
            z = lam1_inv @ (x[i] - u) + lam2_inv @ (x[j] - u)
            qt[i, j] = k1 * k2 * det_part * np.exp(0.5 * z @ r_inv @ S @ z)
    return float(beta1 @ qt @ beta2 - m1 * m2)


def risk_cost(Q, R, gamma, x_ref, u_ref, means, covs, u,
              R_delta=None, u_prev=None):
    """Risk-sensitive cost, direct loop transcription of the defining formula."""
    ds = Q.shape[0]
    cost = 0.0
    for i in range(len(means)):
        dx = means[i] - x_ref
        if gamma == 0.0:
            cost += np.trace(Q @ covs[i]) + dx @ Q @ dx
        else:
            cost += np.log(np.linalg.det(np.eye(ds) + gamma * Q @ covs[i])) / gamma
            cost += dx @ np.linalg.inv(np.linalg.inv(Q) + gamma * covs[i]) @ dx
    for j in range(len(u)):
        du = u[j] - u_ref
        cost += du @ R @ du
    if R_delta is not None:
        ext = np.concatenate([np.asarray(u_prev)[None, :], u], axis=0)
        dd = np.diff(ext, axis=0)
        for j in range(len(u)):
            cost += dd[j] @ R_delta @ dd[j]
    return float(cost)

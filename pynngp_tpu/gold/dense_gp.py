"""Dense fp64 GP / Vecchia oracle (NumPy + SciPy only — no JAX).

Independent implementations of:
  (a) exact dense GP log-likelihood,
  (b) Vecchia log-likelihood via explicit per-site dense conditionals,
  (c) the exact full-conditional of each latent w_i (from the joint
      precision matrix — a different derivation than the sampler's
      parent/children accumulation, so agreement cross-checks both),
  (d) exact kriging prediction.

These substitute for the unavailable reference binary as the parity target
(SURVEY.md section 4 "Rebuild test plan").
"""

from __future__ import annotations

import math

import numpy as np
from scipy.linalg import cho_factor, cho_solve, cholesky
from scipy.special import gamma as sp_gamma
from scipy.special import kv as sp_kv

LOG_2PI = math.log(2.0 * math.pi)


def dense_correlation(name: str, d: np.ndarray, phi: float, nu: float | None = None):
    """Unit-variance correlation rho(d) — same forms as pynngp_tpu.kernels."""
    d = np.asarray(d, dtype=np.float64)
    if name in ("sqexp", "squared_exponential"):
        t = d / phi
        return np.exp(-t * t)
    if name == "exponential":
        return np.exp(-d / phi)
    if name == "spherical":
        t = np.minimum(d / phi, 1.0)
        return 1.0 - 1.5 * t + 0.5 * t**3
    if name == "matern":
        assert nu is not None
        t = np.sqrt(2.0 * nu) * d / phi
        out = np.ones_like(t)
        pos = t > 0
        tp = t[pos]
        out[pos] = (2.0 ** (1.0 - nu) / sp_gamma(nu)) * (tp**nu) * sp_kv(nu, tp)
        return out
    raise ValueError(name)


def _pairdist(a, b):
    return np.sqrt(
        np.maximum(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1), 0.0)
    )


def dense_cov(coords, name, sigma2, phi, tau2=0.0, nu=None):
    """Full n-by-n covariance sigma2 * rho(D) + tau2 * I."""
    d = _pairdist(coords, coords)
    c = sigma2 * dense_correlation(name, d, phi, nu)
    if tau2:
        c = c + tau2 * np.eye(len(coords))
    return c


def dense_gp_loglik(y, coords, name, sigma2, phi, tau2=0.0, nu=None):
    """Exact O(n^3) Gaussian log-likelihood."""
    c = dense_cov(coords, name, sigma2, phi, tau2, nu)
    n = len(y)
    cf = cho_factor(c, lower=True)
    alpha = cho_solve(cf, y)
    logdet = 2.0 * np.sum(np.log(np.diag(cf[0])))
    return -0.5 * (n * LOG_2PI + logdet + float(y @ alpha))


def vecchia_bf_dense(coords, nn_idx, nn_mask, name, phi, alpha=0.0, nu=None):
    """Per-site dense conditionals: B (n, m), F (n,) of the unit process.

    Plain Python loop over sites with dense solves — deliberately the
    opposite implementation style from the batched JAX path.
    """
    n, m = nn_idx.shape
    b_out = np.zeros((n, m))
    f_out = np.zeros(n)
    for i in range(n):
        sel = nn_idx[i][nn_mask[i]]
        k = len(sel)
        if k == 0:
            f_out[i] = 1.0 + alpha
            continue
        d_nn = _pairdist(coords[sel], coords[sel])
        d_in = np.sqrt(((coords[i] - coords[sel]) ** 2).sum(-1))
        c_nn = dense_correlation(name, d_nn, phi, nu) + alpha * np.eye(k)
        c_in = dense_correlation(name, d_in, phi, nu)
        bi = np.linalg.solve(c_nn, c_in)
        b_out[i, :k] = bi
        f_out[i] = (1.0 + alpha) - float(c_in @ bi)
    return b_out, f_out


def vecchia_loglik_dense(
    y, coords, nn_idx, nn_mask, name, sigma2, phi, tau2=0.0, nu=None
):
    """Vecchia log-likelihood with relative nugget alpha = tau2/sigma2."""
    alpha = tau2 / sigma2
    b, f = vecchia_bf_dense(coords, nn_idx, nn_mask, name, phi, alpha, nu)
    n, m = nn_idx.shape
    ll = 0.0
    for i in range(n):
        sel = nn_idx[i][nn_mask[i]]
        mean = float(b[i, : len(sel)] @ y[sel]) if len(sel) else 0.0
        var = sigma2 * f[i]
        ll += -0.5 * (LOG_2PI + np.log(var) + (y[i] - mean) ** 2 / var)
    return ll


def latent_precision(coords, nn_idx, nn_mask, name, sigma2, phi, nu=None):
    """Vecchia-implied sparse prior precision of w, built densely:
    Q = (I - B)^T diag(1/(sigma2 F)) (I - B)."""
    n, m = nn_idx.shape
    b, f = vecchia_bf_dense(coords, nn_idx, nn_mask, name, phi, 0.0, nu)
    ib = np.eye(n)
    for i in range(n):
        sel = nn_idx[i][nn_mask[i]]
        ib[i, sel] -= b[i, : len(sel)]
    return ib.T @ np.diag(1.0 / (sigma2 * f)) @ ib


def latent_conditional(i, w, y, coords, nn_idx, nn_mask, name, sigma2, phi, tau2, nu=None):
    """Exact full conditional N(mu_i, v_i) of w_i | w_{-i}, y, params — from
    the joint posterior precision Lambda = Q_prior + I/tau2 (independent of
    the sampler's parent/children accumulation in SURVEY.md section 3.2)."""
    q = latent_precision(coords, nn_idx, nn_mask, name, sigma2, phi, nu)
    lam = q + np.eye(len(w)) / tau2
    v = 1.0 / lam[i, i]
    r = y[i] / tau2 - (lam[i] @ w - lam[i, i] * w[i])
    return v * r, v


def dense_krig_predict(
    y, coords, coords0, name, sigma2, phi, tau2=0.0, nu=None, noise_scale=True
):
    """Exact GP prediction: mean and variance at new sites coords0."""
    c = dense_cov(coords, name, sigma2, phi, tau2, nu)
    d0 = _pairdist(coords0, coords)
    c0 = sigma2 * dense_correlation(name, d0, phi, nu)
    cf = cho_factor(c, lower=True)
    mean = c0 @ cho_solve(cf, y)
    var = sigma2 * (1.0 + (tau2 / sigma2 if noise_scale else 0.0)) - np.sum(
        c0 * cho_solve(cf, c0.T).T, axis=1
    )
    return mean, var

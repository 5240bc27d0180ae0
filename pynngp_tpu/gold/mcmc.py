"""Gold-standard MCMC: an independent, slow, dense NumPy implementation of
the response-NNGP Metropolis-within-Gibbs sampler (same posterior as
models/response.py, different code path: per-site dense solves, numpy RNG,
Python loops).  Used to validate posterior *moments* within Monte-Carlo error
(SURVEY.md section 4 'Rebuild test plan') — the role the reference binary
would play if it were runnable.
"""

from __future__ import annotations

import numpy as np

from pynngp_tpu.gold.dense_gp import vecchia_bf_dense


def _logit(p):
    return np.log(p) - np.log1p(-p)


def _sigmoid(u):
    return 1.0 / (1.0 + np.exp(-u))


def response_mwg_gold(
    y,
    coords,
    nn_idx,
    nn_mask,
    kernel_name,
    n_samples,
    n_burn,
    priors,
    nu=None,
    seed=0,
    init=None,
):
    """Response-model MWG with the same priors/parameterization as
    ResponseNNGP: logit-uniform phi, log alpha with IG prior on
    tau2 = alpha sigma2, conjugate IG sigma2.  Returns dict of draws."""
    rng = np.random.default_rng(seed)
    n = len(y)
    phi_lo, phi_hi = priors["phi"].lo, priors["phi"].hi
    a_s, b_s = priors["sigma2"].a, priors["sigma2"].b
    a_t, b_t = priors["tau2"].a, priors["tau2"].b

    init = init or {}
    phi = init.get("phi", 0.5 * (phi_lo + phi_hi))
    alpha = init.get("alpha", 0.1)
    sigma2 = init.get("sigma2", 0.9 * np.var(y))

    def suffstats(phi, alpha):
        b, f = vecchia_bf_dense(coords, nn_idx, nn_mask, kernel_name, phi, alpha, nu)
        resid = np.empty(n)
        for i in range(n):
            sel = nn_idx[i][nn_mask[i]]
            resid[i] = y[i] - (b[i, : len(sel)] @ y[sel] if len(sel) else 0.0)
        return float(np.sum(np.log(f))), float(np.sum(resid * resid / f))

    def theta_logpost(u_phi, u_alpha, sigma2, cache=None):
        phi = phi_lo + (phi_hi - phi_lo) * _sigmoid(u_phi)
        alpha = np.exp(u_alpha)
        logdet, quad = suffstats(phi, alpha) if cache is None else cache
        s = _sigmoid(u_phi)
        lp = np.log(phi_hi - phi_lo) + np.log(s) + np.log1p(-s)  # phi U-prior+jac
        lp += -np.log(phi_hi - phi_lo)  # uniform density
        tau2 = alpha * sigma2
        lp += (
            a_t * np.log(b_t)
            - (a_t + 1.0) * np.log(tau2)
            - b_t / tau2
            + np.log(sigma2)
            + u_alpha
        )  # IG(tau2) + jacobians (gammaln(a_t) const dropped)
        return -0.5 * (logdet + quad / sigma2) + lp, (logdet, quad)

    u_phi = _logit((phi - phi_lo) / (phi_hi - phi_lo))
    u_alpha = np.log(alpha)
    value, (logdet, quad) = theta_logpost(u_phi, u_alpha, sigma2)
    step_phi, step_alpha = 0.1, 0.1
    draws = {"sigma2": [], "tau2": [], "phi": []}

    for it in range(n_burn + n_samples):
        # componentwise RW on (u_phi, u_alpha)
        for which in (0, 1):
            if which == 0:
                prop = (u_phi + step_phi * rng.standard_normal(), u_alpha)
            else:
                prop = (u_phi, u_alpha + step_alpha * rng.standard_normal())
            pv, pcache = theta_logpost(prop[0], prop[1], sigma2)
            apr = min(1.0, np.exp(min(pv - value, 0.0)))
            if np.log(rng.uniform()) < pv - value:
                u_phi, u_alpha = prop
                value, (logdet, quad) = pv, pcache
            if it < n_burn:  # same Robbins-Monro adaptation
                g = (it + 1.0) ** -0.6
                if which == 0:
                    step_phi = np.exp(np.log(step_phi) + g * (apr - 0.44))
                else:
                    step_alpha = np.exp(np.log(step_alpha) + g * (apr - 0.44))
        # conjugate sigma2 (IG(tau2) prior folds in through alpha)
        alpha = np.exp(u_alpha)
        a_post = a_s + a_t + 0.5 * n
        b_post = b_s + b_t / alpha + 0.5 * quad
        sigma2 = b_post / rng.gamma(a_post)
        value, (logdet, quad) = theta_logpost(
            u_phi, u_alpha, sigma2, cache=(logdet, quad)
        )
        if it >= n_burn:
            phi = phi_lo + (phi_hi - phi_lo) * _sigmoid(u_phi)
            draws["phi"].append(phi)
            draws["sigma2"].append(sigma2)
            draws["tau2"].append(alpha * sigma2)
    return {k: np.asarray(v) for k, v in draws.items()}

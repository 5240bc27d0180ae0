"""Variational inference: ADVI (mean-field Gaussian on the unconstrained
parameters) over the same differentiable log-posterior the gradient samplers
drive (SURVEY.md section 7 step 6: 'VI (ADVI, mean-field Gaussian on
unconstrained params) over the same log_prob').

Reparameterized ELBO gradient, optax Adam, optional full-rank (Cholesky)
covariance.  Returns the fitted q plus a posterior sampler.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

__all__ = ["ADVIResult", "advi_fit", "advi_sample"]


class ADVIResult(NamedTuple):
    mu: jax.Array  # (k,)
    log_sd: jax.Array  # (k,) mean-field scales
    chol_factor: jax.Array  # (k, k) lower unit-ish factor (full-rank) or eye
    elbo_trace: jax.Array  # (n_steps,)
    full_rank: bool


def _q_sample(params, key, n, full_rank):
    mu, log_sd, chol = params
    k = mu.shape[0]
    eps = jax.random.normal(key, (n, k), mu.dtype)
    if full_rank:
        scale_tril = jnp.tril(chol, -1) + jnp.diag(jnp.exp(log_sd))
        return mu + eps @ scale_tril.T
    return mu + eps * jnp.exp(log_sd)


def _q_entropy(params, full_rank):
    mu, log_sd, chol = params
    # entropy of N(mu, S): 0.5 log det(2 pi e S); log det = 2 sum log diag
    k = mu.shape[0]
    return 0.5 * k * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.sum(log_sd)


def advi_fit(
    logpost_fn: Callable,
    dim: int,
    key,
    n_steps: int = 2000,
    n_mc: int = 8,
    learning_rate: float = 1e-2,
    full_rank: bool = False,
    init_mu=None,
    init_log_sd=None,
    dtype=jnp.float32,
) -> ADVIResult:
    """Maximize ELBO(q) = E_q[logpost] + H(q) by stochastic gradient ascent."""
    mu0 = (
        jnp.asarray(init_mu, dtype)
        if init_mu is not None
        else jnp.zeros((dim,), dtype)
    )
    ls0 = (
        jnp.asarray(init_log_sd, dtype)
        if init_log_sd is not None
        else jnp.full((dim,), -1.0, dtype)
    )
    chol0 = jnp.zeros((dim, dim), dtype)
    params0 = (mu0, ls0, chol0)
    opt = optax.adam(learning_rate)
    opt_state0 = opt.init(params0)
    vpost = jax.vmap(logpost_fn)

    def neg_elbo(params, k):
        z = _q_sample(params, k, n_mc, full_rank)
        return -(jnp.mean(vpost(z)) + _q_entropy(params, full_rank))

    grad_fn = jax.value_and_grad(neg_elbo)

    def step(carry, i):
        params, opt_state = carry
        k = jax.random.fold_in(key, i)
        loss, g = grad_fn(params, k)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    (params, _), elbos = lax.scan(
        step, (params0, opt_state0), jnp.arange(n_steps)
    )
    mu, log_sd, chol = params
    return ADVIResult(
        mu=mu, log_sd=log_sd, chol_factor=chol, elbo_trace=elbos,
        full_rank=full_rank,
    )


def advi_sample(result: ADVIResult, key, n: int):
    """Draw n samples from the fitted variational posterior."""
    return _q_sample(
        (result.mu, result.log_sd, result.chol_factor), key, n, result.full_rank
    )

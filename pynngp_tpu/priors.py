"""Priors and unconstrained-space transforms.

The reference attaches priors to its C++ model objects (inverse-gamma on
sigma^2/tau^2, uniform on phi and nu — SURVEY.md section 3.2 update
equations).  Here priors are tiny stateless objects with ``logpdf`` (natural
space) and samplers work in unconstrained space via the transforms below,
adding the log-Jacobian exactly as the reference's Metropolis does
('log alpha = ... + prior + Jacobian', SURVEY.md section 3.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = [
    "InverseGamma",
    "Uniform",
    "LogNormal",
    "Normal",
    "log_transform",
    "logit_transform",
]


class InverseGamma(NamedTuple):
    """IG(a, b) with density b^a/Gamma(a) x^{-a-1} e^{-b/x}."""

    a: float = 2.0
    b: float = 1.0

    def logpdf(self, x):
        return (
            self.a * jnp.log(self.b)
            - gammaln(self.a)
            - (self.a + 1.0) * jnp.log(x)
            - self.b / x
        )


class Uniform(NamedTuple):
    lo: float = 0.0
    hi: float = 1.0

    def logpdf(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, -jnp.log(self.hi - self.lo), -jnp.inf)


class LogNormal(NamedTuple):
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        z = (jnp.log(x) - self.mu) / self.sigma
        return -0.5 * z * z - jnp.log(x * self.sigma) - 0.918938533204672669541

class Normal(NamedTuple):
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -0.5 * z * z - jnp.log(self.sigma) - 0.918938533204672669541


class log_transform:
    """x = exp(u): positive parameters. log|dx/du| = u."""

    @staticmethod
    def forward(u):
        return jnp.exp(u)

    @staticmethod
    def inverse(x):
        return jnp.log(x)

    @staticmethod
    def log_jac(u):
        return u


class logit_transform:
    """x = lo + (hi-lo) sigmoid(u): interval parameters (e.g. nu, phi bounds)."""

    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi

    def forward(self, u):
        s = jnp.where(u >= 0, 1.0 / (1.0 + jnp.exp(-u)), jnp.exp(u) / (1.0 + jnp.exp(u)))
        return self.lo + (self.hi - self.lo) * s

    def inverse(self, x):
        p = (x - self.lo) / (self.hi - self.lo)
        return jnp.log(p) - jnp.log1p(-p)

    def log_jac(self, u):
        # log|dx/du| = log(hi-lo) + log s + log(1-s)
        softplus = jnp.where(u > 30.0, u, jnp.log1p(jnp.exp(jnp.minimum(u, 30.0))))
        softplus_neg = softplus - u  # softplus(-u)
        return jnp.log(self.hi - self.lo) - softplus - softplus_neg

"""Covariance (correlation) kernels — TPU-native analog of the reference's
``include/covModel.h`` ``CovModel`` hierarchy (SURVEY.md section 2,
"Covariance models" row; forms in section 3.4).

Reference semantics: ``CovModel::cov(d) = sigma2 * rho(d)`` with

- SqExp:        rho(d) = exp(-(d/phi)^2)
- Exponential:  rho(d) = exp(-d/phi)
- Matern(nu):   rho(d) = 2^(1-nu)/Gamma(nu) * (sqrt(2 nu) d/phi)^nu
                         * K_nu(sqrt(2 nu) d/phi)
- Spherical:    rho(d) = 1 - 1.5 (d/phi) + 0.5 (d/phi)^3  for d < phi, else 0

Design departures from the reference (deliberate, TPU-first):

- Kernels are *unit-variance correlation functions*; the model owns sigma^2
  (and the nugget tau^2).  This factorization is what makes sigma^2
  conjugate (inverse-gamma) in the samplers, matching the spNNGP-lineage
  update the reference uses (SURVEY.md section 3.2 updateSigmaSq).
- No virtual dispatch per scalar distance: ``correlation`` is vectorized over
  arbitrary-shape distance arrays (elementwise VPU work inside jit).
- Hyperparameters travel as a dict pytree (e.g. ``{"phi": ..., "nu": ...}``)
  in natural space; samplers transform to/from unconstrained space.
- Matern with *static* half-integer nu (0.5, 1.5, 2.5) uses the exact closed
  forms; general nu (static or sampled/traced) uses the native-JAX K_nu in
  :mod:`pynngp_tpu.bessel`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import gammaln

from pynngp_tpu.bessel import kve

__all__ = ["SqExp", "Exponential", "Matern", "Spherical", "get_kernel"]

_SAFE_EPS = 1e-12


class KernelBase:
    """Common interface: ``correlation(d, params) -> rho`` plus param metadata."""

    name: str = "base"
    param_names: tuple = ("phi",)

    def default_params(self, dtype=jnp.float32):
        return {"phi": jnp.asarray(1.0, dtype)}

    def correlation(self, d, params):  # pragma: no cover - abstract
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}()"


class SqExp(KernelBase):
    """Squared-exponential: rho(d) = exp(-(d/phi)^2)."""

    name = "sqexp"

    def correlation(self, d, params):
        t = d / params["phi"]
        return jnp.exp(-(t * t))


class Exponential(KernelBase):
    """Exponential: rho(d) = exp(-d/phi)."""

    name = "exponential"

    def correlation(self, d, params):
        return jnp.exp(-d / params["phi"])


class Spherical(KernelBase):
    """Spherical: compactly supported on [0, phi]."""

    name = "spherical"

    def correlation(self, d, params):
        t = jnp.minimum(d / params["phi"], 1.0)
        return 1.0 - 1.5 * t + 0.5 * t * t * t


class Matern(KernelBase):
    """Matern with smoothness nu.

    ``Matern(nu=1.5)`` (static half-integer nu in {0.5, 1.5, 2.5}) uses the
    exact closed forms.  ``Matern()`` samples nu (it becomes a kernel
    parameter, general-nu Bessel path); ``Matern(nu=0.8)`` fixes a general
    static nu.
    """

    name = "matern"

    def __init__(self, nu=None):
        self.static_nu = None if nu is None else float(nu)
        if self.static_nu is not None:
            self.param_names = ("phi",)
        else:
            self.param_names = ("phi", "nu")

    def default_params(self, dtype=jnp.float32):
        p = {"phi": jnp.asarray(1.0, dtype)}
        if self.static_nu is None:
            p["nu"] = jnp.asarray(1.5, dtype)
        return p

    def _nu(self, params):
        return self.static_nu if self.static_nu is not None else params["nu"]

    def correlation(self, d, params):
        phi = params["phi"]
        nu = self._nu(params)
        if self.static_nu is not None and self.static_nu in (0.5, 1.5, 2.5):
            t = math.sqrt(2.0 * self.static_nu) * d / phi
            e = jnp.exp(-t)
            if self.static_nu == 0.5:
                return e
            if self.static_nu == 1.5:
                return (1.0 + t) * e
            return (1.0 + t + t * t / 3.0) * e  # nu = 2.5
        # General nu: 2^(1-nu)/Gamma(nu) t^nu K_nu(t), t = sqrt(2 nu) d / phi.
        # Evaluated in log space for stability; exact limit rho(0) = 1.
        t = jnp.sqrt(2.0 * nu) * d / phi
        t_safe = jnp.maximum(t, _SAFE_EPS)
        log_rho = (
            (1.0 - nu) * jnp.log(2.0)
            - gammaln(nu)
            + nu * jnp.log(t_safe)
            + jnp.log(kve(t_safe, nu))
            - t_safe
        )
        return jnp.where(t < _SAFE_EPS, jnp.ones_like(t), jnp.exp(log_rho))

    def __repr__(self):
        return f"Matern(nu={self.static_nu})"


_REGISTRY = {
    "sqexp": SqExp,
    "squared_exponential": SqExp,
    "exponential": Exponential,
    "matern": Matern,
    "spherical": Spherical,
}


def get_kernel(name_or_obj, **kwargs):
    """Resolve a kernel from a name (e.g. ``'sqexp'``) or pass through."""
    if isinstance(name_or_obj, str):
        return _REGISTRY[name_or_obj.lower()](**kwargs)
    return name_or_obj

"""Noise (nugget) models — TPU-native analog of the reference's
``include/noiseModel.h`` ``NoiseModel`` hierarchy (SURVEY.md section 2,
"Noise models" row).

- :class:`HomogeneousNoise`: constant nugget tau^2 I; tau^2 gets the
  conjugate inverse-gamma Gibbs update (reference ``updateTauSq``,
  SURVEY.md section 3.2).
- :class:`HeterogeneousNoise`: per-site variance tau^2 * v_i with fixed
  known weights v (e.g. measurement-error weights); tau^2 remains
  IG-conjugate with weighted residuals.

A noise model only has to provide the per-site variance vector and the
sufficient statistics of the conjugate update; all sampling lives in
:mod:`pynngp_tpu.samplers`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["HomogeneousNoise", "HeterogeneousNoise", "get_noise"]


class HomogeneousNoise:
    """tau^2 * I."""

    name = "homogeneous"

    def variance(self, tau2, n):
        return tau2 * jnp.ones((n,), dtype=jnp.result_type(tau2))

    def weights(self, n, dtype=jnp.float32):
        return jnp.ones((n,), dtype=dtype)


class HeterogeneousNoise:
    """tau^2 * diag(v) with fixed positive weights v (n,)."""

    name = "heterogeneous"

    def __init__(self, v):
        self.v = jnp.asarray(v)

    def variance(self, tau2, n):
        return tau2 * self.v

    def weights(self, n, dtype=jnp.float32):
        return self.v.astype(dtype)


def get_noise(name_or_obj, **kwargs):
    if isinstance(name_or_obj, str):
        return {
            "homogeneous": HomogeneousNoise,
            "heterogeneous": HeterogeneousNoise,
        }[name_or_obj.lower()](**kwargs)
    return name_or_obj

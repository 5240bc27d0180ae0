"""Kernel correlation values vs the gold oracle (SURVEY.md section 4,
'Unit: kernels' row — analytic values at known distances)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu import kernels
from pynngp_tpu.gold.dense_gp import dense_correlation

DISTS = np.array([0.0, 0.01, 0.1, 0.5, 1.0, 2.0, 5.0])


@pytest.mark.parametrize("name", ["sqexp", "exponential", "spherical"])
@pytest.mark.parametrize("phi", [0.3, 1.0, 2.5])
def test_basic_kernels_match_gold(name, phi):
    k = kernels.get_kernel(name)
    got = np.asarray(k.correlation(jnp.asarray(DISTS), {"phi": jnp.asarray(phi)}))
    want = dense_correlation(name, DISTS, phi)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_halfint_closed_form_matches_gold(nu):
    k = kernels.Matern(nu=nu)
    got = np.asarray(k.correlation(jnp.asarray(DISTS), {"phi": jnp.asarray(0.7)}))
    want = dense_correlation("matern", DISTS, 0.7, nu)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("nu", [0.5, 0.8, 1.5, 2.5, 3.7])
def test_matern_general_nu_matches_gold(nu):
    k = kernels.Matern()  # nu as a sampled parameter -> Bessel path
    params = {"phi": jnp.asarray(0.7), "nu": jnp.asarray(nu)}
    got = np.asarray(k.correlation(jnp.asarray(DISTS), params))
    want = dense_correlation("matern", DISTS, 0.7, nu)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-12)


def test_matern_rho0_is_one():
    k = kernels.Matern()
    params = {"phi": jnp.asarray(1.0), "nu": jnp.asarray(1.2)}
    assert float(k.correlation(jnp.asarray(0.0), params)) == 1.0


def test_exponential_equals_matern_half():
    k1 = kernels.Exponential()
    k2 = kernels.Matern(nu=0.5)
    d = jnp.asarray(DISTS)
    np.testing.assert_allclose(
        np.asarray(k1.correlation(d, {"phi": jnp.asarray(0.9)})),
        np.asarray(k2.correlation(d, {"phi": jnp.asarray(0.9)})),
        rtol=1e-12,
    )

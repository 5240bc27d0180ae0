"""K_nu implementation vs scipy.special (the fp64 oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from pynngp_tpu import bessel


@pytest.mark.parametrize("nu", [0.0, 0.3, 0.5, 0.99, 1.0, 1.5, 2.7, 5.25, 10.6])
def test_kv_matches_scipy(nu):
    x = np.concatenate(
        [np.linspace(1e-3, 1.9, 25), np.linspace(2.0, 30.0, 25), [50.0, 80.0]]
    )
    got = np.asarray(bessel.kv(jnp.asarray(x), jnp.asarray(nu)))
    want = sps.kv(nu, x)
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-300)


@pytest.mark.parametrize("nu", [0.2, 0.5, 1.5, 3.3])
def test_kve_matches_scipy(nu):
    x = np.linspace(0.05, 100.0, 60)
    got = np.asarray(bessel.kve(jnp.asarray(x), jnp.asarray(nu)))
    want = sps.kve(nu, x)
    np.testing.assert_allclose(got, want, rtol=5e-9)


@pytest.mark.parametrize("nu", [0.4, 1.5, 2.8])
def test_kv_grad_x(nu):
    # d/dx K_nu = -(K_{nu-1} + K_{nu+1})/2 — check grad against scipy kvp.
    xs = np.array([0.3, 0.9, 1.7, 2.5, 6.0, 15.0])
    g = jax.vmap(jax.grad(lambda x: bessel.kv(x, jnp.asarray(nu))))(jnp.asarray(xs))
    want = sps.kvp(nu, xs)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-7)


def test_kv_broadcasts():
    x = jnp.linspace(0.1, 5.0, 7)
    nu = jnp.asarray([0.5, 1.5])[:, None]
    out = bessel.kv(x[None, :], nu)
    assert out.shape == (2, 7)

"""Vecchia B/F and log-likelihood vs the dense gold oracle — the single most
load-bearing numeric tests (SURVEY.md section 4, 'Unit: Vecchia B/F' row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu import kernels, vecchia
from pynngp_tpu.gold.dense_gp import (
    dense_gp_loglik,
    vecchia_bf_dense,
    vecchia_loglik_dense,
)


def make_data(rng, n=60, m=8, **kw):
    coords = rng.uniform(size=(n, 2))
    data, tab = vecchia.make_vecchia_data(coords, m, dtype=jnp.float64, **kw)
    return coords, data, tab


@pytest.mark.parametrize(
    "kname,kw,nu",
    [
        ("sqexp", {}, None),
        ("exponential", {}, None),
        ("matern", {"nu": 1.5}, 1.5),
        ("matern", {"nu": 0.8}, 0.8),
    ],
)
@pytest.mark.parametrize("alpha", [0.0, 0.25])
def test_bf_matches_gold(rng, kname, kw, nu, alpha):
    coords, data, tab = make_data(rng)
    kern = kernels.get_kernel(kname, **kw)
    params = {"phi": jnp.asarray(0.4, jnp.float64)}
    b, f = vecchia.vecchia_bf(kern, params, data, alpha=alpha, jitter=0.0)
    pts = coords[tab.order]
    b_gold, f_gold = vecchia_bf_dense(
        pts, tab.nn_idx, tab.nn_mask, kname, 0.4, alpha, nu
    )
    np.testing.assert_allclose(np.asarray(b), b_gold, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(f), f_gold, rtol=1e-8, atol=1e-10)


def test_loglik_matches_gold(rng, gp_field):
    coords, w, y = gp_field
    data, tab = vecchia.make_vecchia_data(coords, 10, dtype=jnp.float64)
    kern = kernels.SqExp()
    sigma2, phi, tau2 = 0.9, 0.45, 0.15
    y_ord = jnp.asarray(y[tab.order])
    ll = vecchia.vecchia_loglik(
        kern,
        {"phi": jnp.asarray(phi, jnp.float64)},
        data,
        y_ord,
        sigma2,
        alpha=tau2 / sigma2,
        jitter=0.0,
    )
    want = vecchia_loglik_dense(
        y[tab.order], coords[tab.order], tab.nn_idx, tab.nn_mask,
        "sqexp", sigma2, phi, tau2,
    )
    np.testing.assert_allclose(float(ll), want, rtol=1e-10)


def test_vecchia_exact_when_m_full(rng):
    """With m = n-1 every conditioning set is complete => Vecchia == dense GP."""
    n = 40
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n)
    data, tab = vecchia.make_vecchia_data(coords, n - 1, dtype=jnp.float64)
    sigma2, phi, tau2 = 1.3, 0.5, 0.2
    ll = vecchia.vecchia_loglik(
        kernels.Exponential(),
        {"phi": jnp.asarray(phi, jnp.float64)},
        data,
        jnp.asarray(y[tab.order]),
        sigma2,
        alpha=tau2 / sigma2,
        jitter=0.0,
    )
    want = dense_gp_loglik(y, coords, "exponential", sigma2, phi, tau2)
    np.testing.assert_allclose(float(ll), want, rtol=1e-9)


def test_loglik_gradients_vs_fd(rng, gp_field):
    coords, w, y = gp_field
    data, tab = vecchia.make_vecchia_data(coords, 8, dtype=jnp.float64)
    y_ord = jnp.asarray(y[tab.order])
    kern = kernels.Matern(nu=1.5)

    def ll(theta):
        sigma2, phi, tau2 = theta
        return vecchia.vecchia_loglik(
            kern, {"phi": phi}, data, y_ord, sigma2, alpha=tau2 / sigma2, jitter=0.0
        )

    theta0 = jnp.asarray([0.8, 0.4, 0.12], jnp.float64)
    g = jax.grad(ll)(theta0)
    for k in range(3):
        h = 1e-6
        tp = theta0.at[k].add(h)
        tm = theta0.at[k].add(-h)
        fd = (ll(tp) - ll(tm)) / (2 * h)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=2e-5)


def test_first_site_has_prior_variance(rng):
    coords, data, tab = make_data(rng, n=30, m=5)
    b, f = vecchia.vecchia_bf(
        kernels.SqExp(), {"phi": jnp.asarray(0.4, jnp.float64)}, data,
        alpha=0.3, jitter=0.0,
    )
    assert float(f[0]) == pytest.approx(1.3)
    np.testing.assert_allclose(np.asarray(b[0]), 0.0)


def test_precompute_and_onthefly_agree(rng):
    coords = rng.uniform(size=(70, 2))
    kern = kernels.Exponential()
    params = {"phi": jnp.asarray(0.3, jnp.float64)}
    d1, _ = vecchia.make_vecchia_data(coords, 9, precompute_distances=True, dtype=jnp.float64)
    d2, _ = vecchia.make_vecchia_data(coords, 9, precompute_distances=False, dtype=jnp.float64)
    b1, f1 = vecchia.vecchia_bf(kern, params, d1)
    b2, f2 = vecchia.vecchia_bf(kern, params, d2)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-12)

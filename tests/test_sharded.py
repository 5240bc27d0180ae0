"""Sharded log-likelihood on the virtual 8-device CPU mesh: multi-device
must equal single-device (modulo reduction order) — SURVEY.md section 4
'multi-device == single-device' criterion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu import kernels, vecchia
from pynngp_tpu.parallel import (
    make_mesh,
    make_sharded_loglik,
    make_sharded_suffstats,
    shard_vecchia_data,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n, m, n_chains = 205, 9, 4  # n deliberately NOT divisible by shards
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n)
    data, tab = vecchia.make_vecchia_data(coords, m, dtype=jnp.float64)
    y_ord = jnp.asarray(y[tab.order])
    return data, y_ord, n, n_chains


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"chains": 2, "sites": 4}


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_loglik_matches_single_device(setup, mesh_shape):
    data, y_ord, n, n_chains = setup
    kern = kernels.Exponential()
    mesh = make_mesh(*mesh_shape)
    sdata, y_own, y_full, valid = shard_vecchia_data(data, mesh, y=y_ord)
    loglik_fn = make_sharded_loglik(kern, mesh, n, jitter=0.0)

    phis = jnp.linspace(0.2, 0.5, n_chains)
    sigma2s = jnp.linspace(0.8, 1.3, n_chains)
    alphas = jnp.linspace(0.05, 0.2, n_chains)
    got = jax.jit(
        jax.vmap(
            lambda ph, s2, al: loglik_fn(
                {"phi": ph}, s2, al, sdata, y_own, y_full, valid
            )
        )
    )(phis, sigma2s, alphas)
    assert got.shape == (n_chains,)
    for c in range(n_chains):
        want = vecchia.vecchia_loglik(
            kern, {"phi": phis[c]}, data, y_ord, sigma2s[c],
            alpha=alphas[c], jitter=0.0,
        )
        np.testing.assert_allclose(float(got[c]), float(want), rtol=1e-12)


def test_sharded_gradients_match(setup):
    data, y_ord, n, n_chains = setup
    kern = kernels.Exponential()
    mesh = make_mesh(2, 4)
    sdata, y_own, y_full, valid = shard_vecchia_data(data, mesh, y=y_ord)
    loglik_fn = make_sharded_loglik(kern, mesh, n, jitter=0.0)

    def scalar_sharded(phi, sigma2, alpha):
        return loglik_fn({"phi": phi}, sigma2, alpha, sdata, y_own, y_full, valid)

    def scalar_single(phi, sigma2, alpha):
        return vecchia.vecchia_loglik(
            kern, {"phi": phi}, data, y_ord, sigma2, alpha=alpha, jitter=0.0
        )

    args = (jnp.asarray(0.35), jnp.asarray(1.1), jnp.asarray(0.1))
    g_sharded = jax.jit(jax.grad(scalar_sharded, argnums=(0, 1, 2)))(*args)
    g_single = jax.grad(scalar_single, argnums=(0, 1, 2))(*args)
    for gs, g1 in zip(g_sharded, g_single):
        np.testing.assert_allclose(float(gs), float(g1), rtol=1e-9)

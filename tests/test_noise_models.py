"""Heterogeneous noise model (reference noiseModel.h variants): B/F math,
conditional parity vs gold, and recovery with known weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu import kernels, vecchia
from pynngp_tpu.models.latent import LatentNNGP
from pynngp_tpu.models.response import ResponseNNGP
from pynngp_tpu.noise import HeterogeneousNoise
from tests.conftest import simulate_gp_field


def test_vector_alpha_bf_matches_persite_dense(rng):
    """vecchia_bf with per-site alpha equals per-site dense solves with the
    corresponding diagonal."""
    n, m = 50, 6
    coords = rng.uniform(size=(n, 2))
    data, tab = vecchia.make_vecchia_data(coords, m, dtype=jnp.float64)
    v = rng.uniform(0.5, 2.0, n)
    alpha_vec = jnp.asarray(0.2 * v[tab.order])
    kern = kernels.Exponential()
    b, f = vecchia.vecchia_bf(
        kern, {"phi": jnp.asarray(0.4)}, data, alpha=alpha_vec, jitter=0.0
    )
    pts = coords[tab.order]
    av = np.asarray(alpha_vec)
    for i in [0, 3, 17, 49]:
        sel = tab.nn_idx[i][tab.nn_mask[i]]
        k = len(sel)
        if k == 0:
            assert float(f[i]) == pytest.approx(1.0 + av[i])
            continue
        d_nn = np.sqrt(((pts[sel][:, None] - pts[sel][None]) ** 2).sum(-1))
        d_in = np.sqrt(((pts[i] - pts[sel]) ** 2).sum(-1))
        c_nn = np.exp(-d_nn / 0.4) + np.diag(av[sel])
        c_in = np.exp(-d_in / 0.4)
        bi = np.linalg.solve(c_nn, c_in)
        np.testing.assert_allclose(np.asarray(b[i, :k]), bi, rtol=1e-9)
        np.testing.assert_allclose(
            float(f[i]), 1.0 + av[i] - c_in @ bi, rtol=1e-9
        )


def test_response_hetero_runs_and_recovers_tau2(rng):
    coords, w, y0 = simulate_gp_field(
        rng, n=300, name="exponential", sigma2=1.0, phi=0.3, tau2=0.0
    )
    v = rng.uniform(0.25, 4.0, 300)
    tau2 = 0.1
    y = y0 + np.sqrt(tau2 * v) * rng.standard_normal(300)
    model = ResponseNNGP(
        coords, y, kernel="exponential", m=8, dtype=jnp.float64,
        noise=HeterogeneousNoise(v),
    )
    assert model.backend == "xla"  # hetero forces XLA path
    draws = model.sample(n_samples=400, n_burn=300, seed=4)
    assert abs(draws["tau2"].mean() - tau2) < 0.1
    assert np.isfinite(draws["loglik"]).all()


@pytest.mark.parametrize("w_update", ["chromatic", "sequential"])
def test_latent_hetero_conditionals_selfconsistent(rng, w_update):
    """With weights v, the latent sampler's chromatic and sequential updates
    still target the same posterior and recover w."""
    coords, w_true, y0 = simulate_gp_field(
        rng, n=200, name="exponential", sigma2=1.0, phi=0.3, tau2=0.0
    )
    v = rng.uniform(0.5, 2.0, 200)
    tau2 = 0.05
    y = y0 + np.sqrt(tau2 * v) * rng.standard_normal(200)
    model = LatentNNGP(
        coords, y, kernel="exponential", m=8, dtype=jnp.float64,
        w_update=w_update, noise=HeterogeneousNoise(v),
    )
    draws = model.sample(n_samples=300, n_burn=300, seed=5, collect_w=True)
    w_mean = draws["w"].mean(axis=0)
    assert np.corrcoef(w_mean, w_true)[0, 1] > 0.9
    assert abs(draws["tau2"].mean() - tau2) < 0.08

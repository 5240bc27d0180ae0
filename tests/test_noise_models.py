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


def test_hetero_pallas_suffstats_matches_xla(rng):
    """Fused kernels with per-site noise planes == XLA vector-alpha path."""
    from pynngp_tpu.ops import pallas_bf as pb

    n, m = 900, 7
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n).astype(np.float32)
    data, tab = vecchia.make_vecchia_data(coords, m)
    y_ord = jnp.asarray(y[tab.order])
    v = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)  # ordered space
    kern = kernels.Exponential()
    cache = pb.make_lane_cache(data)
    alpha = jnp.float32(0.15)
    params = {"phi": jnp.float32(0.3)}
    ld_p, q_p, f4, _ = pb.pallas_suffstats(
        kern, params, cache, y_ord, alpha, jitter=1e-6, noise_v=v
    )
    b_x, f_x = vecchia.vecchia_bf(kern, params, data, alpha=alpha * v, jitter=1e-6)
    ld_x, q_x, _ = vecchia.vecchia_suffstats(b_x, f_x, y_ord, data)
    np.testing.assert_allclose(float(ld_p), float(ld_x), rtol=3e-4)
    np.testing.assert_allclose(float(q_p), float(q_x), rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(f4).reshape(-1)[:n], np.asarray(f_x), rtol=1e-4
    )
    b_p, f_p = pb.pallas_bf(kern, params, cache, alpha, jitter=1e-6, noise_v=v)
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), rtol=3e-5)


def test_hetero_pallas_grad_matches_xla(rng):
    """Hetero value+gradient kernel (dC/dalpha = diag(v)) vs XLA autodiff."""
    from pynngp_tpu.ops import pallas_bf as pb

    n, m = 900, 7
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n).astype(np.float32)
    data, tab = vecchia.make_vecchia_data(coords, m)
    y_ord = jnp.asarray(y[tab.order])
    v = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    kern = kernels.Exponential()
    cache = pb.make_lane_cache(data)
    suff = pb.make_diff_suffstats(kern, cache, jitter=1e-6, noise_v=v)

    def s_pal(phi, alpha):
        ld, q = suff(phi, alpha, y_ord)
        return 0.7 * ld + 1.3 * q

    def s_xla(phi, alpha):
        b, f = vecchia.vecchia_bf(kern, {"phi": phi}, data, alpha=alpha * v, jitter=1e-6)
        ld, q, _ = vecchia.vecchia_suffstats(b, f, y_ord, data)
        return 0.7 * ld + 1.3 * q

    args = (jnp.float32(0.33), jnp.float32(0.12))
    np.testing.assert_allclose(float(s_pal(*args)), float(s_xla(*args)), rtol=3e-4)
    gp = jax.grad(s_pal, argnums=(0, 1))(*args)
    gx = jax.grad(s_xla, argnums=(0, 1))(*args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(float(a), float(b), rtol=3e-4)


def test_hetero_mesh_matches_single(rng):
    """Hetero + mesh (round-2 missing #7): sharded likelihood, gradient, and
    MWG suffstats match single-device at fp64 tolerance."""
    from pynngp_tpu.parallel import make_mesh

    coords, w, y0 = simulate_gp_field(
        rng, n=220, name="exponential", sigma2=1.0, phi=0.3, tau2=0.0
    )
    v = rng.uniform(0.5, 2.0, 220)
    y = y0 + np.sqrt(0.1 * v) * rng.standard_normal(220)
    mesh = make_mesh(2, 4)
    kw = dict(kernel="exponential", m=8, dtype=jnp.float64,
              noise=HeterogeneousNoise(v))
    m_single = ResponseNNGP(coords, y, **kw)
    m_mesh = ResponseNNGP(coords, y, mesh=mesh, **kw)
    u = m_single._full_init_u(jax.random.PRNGKey(0),
                              {"phi": 0.3, "sigma2": 1.0, "tau2": 0.1})
    np.testing.assert_allclose(
        float(m_mesh.full_loglik(u)), float(m_single.full_loglik(u)),
        rtol=1e-12,
    )
    g1 = jax.grad(m_mesh.full_logpost)(u)
    g2 = jax.grad(m_single.full_logpost)(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)
    theta_u = m_single._unconstrained(0.3, 0.1)
    beta = jnp.zeros((1,), jnp.float64)
    _, _, ld1, q1 = m_single._suffstats(theta_u, beta)
    _, _, ld2, q2 = m_mesh._suffstats(theta_u, beta)
    np.testing.assert_allclose(float(ld2), float(ld1), rtol=1e-12)
    np.testing.assert_allclose(float(q2), float(q1), rtol=1e-12)

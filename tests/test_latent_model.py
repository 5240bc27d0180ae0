"""Latent-w NNGP: full-conditional parity vs the gold joint-precision
derivation, sequential vs chromatic equivalence, posterior recovery
(SURVEY.md section 4 + section 7 step 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu.gold.dense_gp import latent_conditional
from pynngp_tpu.models.latent import LatentNNGP
from tests.conftest import simulate_gp_field


def test_conditional_moments_match_gold(rng):
    """The parent/children accumulation (reference updateW formulas) must
    equal the conditional derived from the dense joint precision matrix."""
    coords, w_true, y = simulate_gp_field(
        rng, n=60, name="exponential", sigma2=0.9, phi=0.35, tau2=0.15
    )
    model = LatentNNGP(
        coords, y, kernel="exponential", m=6, dtype=jnp.float64, jitter=0.0
    )
    tab = model.data.table
    sigma2, tau2, phi = 0.9, 0.15, 0.35
    state = model.init_state(
        jax.random.PRNGKey(0),
        init={"phi": phi, "sigma2": sigma2, "tau2": tau2,
              "w": rng.standard_normal(60)},
    )
    mu, v = model.conditional_moments(
        state.w, state.b, state.f, state.sigma2, state.tau2, state.beta
    )
    w_np = np.asarray(state.w)
    y_ord = np.asarray(model.data.y)
    for i in [0, 1, 7, 23, 59]:
        mu_gold, v_gold = latent_conditional(
            i, w_np, y_ord, coords[tab.order], tab.nn_idx, tab.nn_mask,
            "exponential", sigma2, phi, tau2,
        )
        np.testing.assert_allclose(float(mu[i]), mu_gold, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(float(v[i]), v_gold, rtol=1e-6)


@pytest.mark.parametrize("w_update", ["chromatic", "sequential"])
def test_latent_recovery(rng, w_update):
    sigma2, phi, tau2 = 1.0, 0.3, 0.05
    coords, w_true, y = simulate_gp_field(
        rng, n=250, name="exponential", sigma2=sigma2, phi=phi, tau2=tau2
    )
    model = LatentNNGP(
        coords, y, kernel="exponential", m=8, dtype=jnp.float64, w_update=w_update
    )
    draws = model.sample(n_samples=400, n_burn=300, seed=6, collect_w=True)
    w_mean = draws["w"].mean(axis=0)
    # latent surface recovered (original site order)
    corr = np.corrcoef(w_mean, w_true)[0, 1]
    assert corr > 0.9, corr
    rmse = np.sqrt(np.mean((w_mean - w_true) ** 2))
    assert rmse < np.sqrt(tau2) * 3.0
    assert np.isfinite(draws["loglik"]).all()


def test_sequential_and_chromatic_same_posterior(rng):
    coords, w_true, y = simulate_gp_field(
        rng, n=150, name="exponential", sigma2=1.0, phi=0.3, tau2=0.1
    )
    res = {}
    for mode in ("chromatic", "sequential"):
        model = LatentNNGP(
            coords, y, kernel="exponential", m=6, dtype=jnp.float64, w_update=mode
        )
        draws = model.sample(n_samples=500, n_burn=300, seed=7, collect_w=True)
        res[mode] = draws
    for name in ("sigma2", "tau2", "phi"):
        a = res["chromatic"][name]
        b = res["sequential"][name]
        se = np.sqrt(a.var() / 50 + b.var() / 50)  # crude MCSE floor
        assert abs(a.mean() - b.mean()) < 5 * se + 0.05 * abs(b.mean()), name
    # latent means agree site-by-site
    wa = res["chromatic"]["w"].mean(axis=0)
    wb = res["sequential"]["w"].mean(axis=0)
    assert np.corrcoef(wa, wb)[0, 1] > 0.98


def test_latent_with_covariates(rng):
    coords, w_true, y0 = simulate_gp_field(
        rng, n=200, name="exponential", sigma2=0.8, phi=0.25, tau2=0.05
    )
    x = np.column_stack([np.ones(200), rng.standard_normal(200)])
    beta_true = np.array([1.0, -2.0])
    y = y0 + x @ beta_true
    model = LatentNNGP(coords, y, kernel="exponential", m=8, x=x, dtype=jnp.float64)
    draws = model.sample(n_samples=300, n_burn=300, seed=8, collect_w=False)
    beta_mean = draws["beta"].mean(axis=0)
    assert abs(beta_mean[1] - beta_true[1]) < 0.3  # slope identifiable


def test_w_every_thinning_bit_identical(rng):
    """w_every thins only the collected w rows (device-side slice before
    readback): kept rows and every hyperparameter draw are bit-identical
    to the unthinned run (RNG/state untouched)."""
    coords, w_true, y = simulate_gp_field(rng, n=120, name="exponential")
    model = LatentNNGP(coords, y, kernel="exponential", m=6, dtype=jnp.float64)
    full = model.sample(40, n_burn=20, n_chains=2, seed=3, collect_w=True)
    thin = model.sample(
        40, n_burn=20, n_chains=2, seed=3, collect_w=True, w_every=4
    )
    assert thin["w"].shape[1] == 10  # ceil(40 / 4)
    np.testing.assert_array_equal(thin["w"], full["w"][:, ::4])
    np.testing.assert_array_equal(thin["sigma2"], full["sigma2"])
    np.testing.assert_array_equal(thin["phi"], full["phi"])


def test_collapsed_theta_same_posterior(rng):
    """The sigma2-collapsed theta block (partially-collapsed Gibbs) targets
    the same joint posterior as the reference's sigma2-conditioned
    updateTheta (collapsed=False)."""
    coords, w_true, y = simulate_gp_field(
        rng, n=150, name="exponential", sigma2=1.0, phi=0.3, tau2=0.1
    )
    res = {}
    for mode in (True, False):
        model = LatentNNGP(
            coords, y, kernel="exponential", m=6, dtype=jnp.float64,
            collapsed=mode,
        )
        res[mode] = model.sample(600, n_burn=400, seed=11, collect_w=True)
    for name in ("sigma2", "tau2", "phi"):
        a, b = res[True][name], res[False][name]
        se = np.sqrt(a.var() / 50 + b.var() / 50)  # crude MCSE floor
        assert abs(a.mean() - b.mean()) < 5 * se + 0.05 * abs(b.mean()), name
    wa = res[True]["w"].mean(axis=0)
    wb = res[False]["w"].mean(axis=0)
    assert np.corrcoef(wa, wb)[0, 1] > 0.98

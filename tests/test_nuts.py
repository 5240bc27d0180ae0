"""NUTS/HMC correctness.

Two levels: (1) exact-target validation on a known Gaussian (posterior
moments + no divergences), (2) same-posterior agreement with the MWG
sampler on a real response-NNGP model — NUTS and MWG target the identical
density, so their moments must agree within MC error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu.diagnostics import ess
from pynngp_tpu.models.response import ResponseNNGP
from pynngp_tpu.samplers.hmc import hmc_sample
from pynngp_tpu.samplers.nuts import nuts_sample
from tests.conftest import simulate_gp_field


def _mvn_target(dim, rng):
    a = rng.standard_normal((dim, dim))
    cov = a @ a.T + dim * np.eye(dim)
    mean = rng.standard_normal(dim) * 2.0
    prec = np.linalg.inv(cov)

    def logpost(z):
        d = z - jnp.asarray(mean)
        return -0.5 * d @ jnp.asarray(prec) @ d

    return jax.value_and_grad(logpost), mean, cov


@pytest.mark.parametrize("sampler", ["nuts", "hmc"])
def test_gaussian_target_moments(rng, sampler):
    dim = 4
    vg, mean, cov = _mvn_target(dim, rng)
    z0 = jnp.zeros(dim, jnp.float64)
    run = nuts_sample if sampler == "nuts" else hmc_sample
    draws, tuned = jax.jit(
        lambda k: run(vg, z0, k, n_samples=2000, n_burn=800)
    )(jax.random.PRNGKey(0))
    x = np.asarray(draws)
    assert x.shape == (2000, dim)
    se = np.sqrt(np.diag(cov) / 200)  # generous: ESS >= 200 expected
    assert (np.abs(x.mean(0) - mean) < 4 * se).all(), (x.mean(0), mean)
    np.testing.assert_allclose(x.var(0), np.diag(cov), rtol=0.35)
    # correlation structure recovered
    np.testing.assert_allclose(
        np.corrcoef(x.T), cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov))),
        atol=0.15,
    )


def test_nuts_matches_mwg_on_nngp(rng):
    coords, w_true, y = simulate_gp_field(
        rng, n=150, name="exponential", sigma2=1.0, phi=0.3, tau2=0.1
    )
    model = ResponseNNGP(coords, y, kernel="exponential", m=8, dtype=jnp.float64)
    mwg = model.sample(n_samples=1500, n_burn=500, seed=1)
    nuts = model.sample_nuts(n_samples=800, n_burn=500, seed=2)
    assert not np.asarray(nuts["diverging"]).any()
    for name in ("sigma2", "tau2", "phi"):
        a, b = np.asarray(nuts[name]), np.asarray(mwg[name])
        se = np.sqrt(a.var() / max(ess(a), 4) + b.var() / max(ess(b), 4))
        tol = 4 * se + 0.03 * abs(b.mean())
        assert abs(a.mean() - b.mean()) < tol, (name, a.mean(), b.mean(), se)
        assert 0.5 < a.std() / b.std() < 2.0, (name, a.std(), b.std())
    # Both samplers must mix adequately on the correlated ridge.  (A
    # relative "NUTS beats MWG by 2x" claim is not a correctness property —
    # round 3's collapsed-MWG improvement made MWG mix well enough to break
    # it — so assert absolute ESS floors instead.)
    assert ess(nuts["sigma2"]) > 50, ess(nuts["sigma2"])
    assert ess(mwg["sigma2"]) > 50, ess(mwg["sigma2"])


def test_nuts_matern_gradients(rng):
    """SPEC config 3 shape: Matern kernel with NUTS (static nu=1.5 exercises
    the closed form; the general-nu Bessel path gradient is covered in
    test_bessel)."""
    coords, w_true, y = simulate_gp_field(
        rng, n=120, name="matern", nu=1.5, sigma2=1.0, phi=0.3, tau2=0.1
    )
    model = ResponseNNGP(
        coords, y, kernel=__import__("pynngp_tpu").Matern(nu=1.5), m=8,
        dtype=jnp.float64,
    )
    draws = model.sample_nuts(n_samples=300, n_burn=300, seed=3)
    assert np.isfinite(draws["logpost"]).all()
    assert np.asarray(draws["diverging"]).mean() < 0.05
    assert ess(draws["phi"]) > 50


def test_nuts_multichain(rng):
    coords, w_true, y = simulate_gp_field(rng, n=100, tau2=0.1)
    model = ResponseNNGP(coords, y, kernel="sqexp", m=6, dtype=jnp.float64)
    draws = model.sample_nuts(n_samples=200, n_burn=200, n_chains=2, seed=4)
    assert draws["sigma2"].shape == (2, 200)
    from pynngp_tpu.diagnostics import split_rhat

    assert split_rhat(draws["tau2"]) < 1.3

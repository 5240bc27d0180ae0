"""SMC and ADVI: exact-target validation + same-posterior agreement with
MCMC on a real NNGP model (all samplers share one log_prob — SURVEY.md
section 7 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu.diagnostics import ess
from pynngp_tpu.models.response import ResponseNNGP
from pynngp_tpu.samplers.smc import smc_sample, systematic_resample
from pynngp_tpu.samplers.vi import advi_fit, advi_sample
from tests.conftest import simulate_gp_field


def test_systematic_resample_unbiased():
    key = jax.random.PRNGKey(0)
    logw = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for s in range(200):
        idx = systematic_resample(jax.random.fold_in(key, s), logw, 1000)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_smc_gaussian_target():
    """Prior N(0, 4 I), likelihood N(mu*, 0.25 I) -> known Gaussian posterior
    and analytic evidence."""
    dim = 3
    mu_star = jnp.asarray([1.0, -2.0, 0.5])
    prior_var, lik_var = 4.0, 0.25

    def logprior(u):
        return -0.5 * jnp.sum(u * u) / prior_var - 0.5 * dim * jnp.log(
            2 * jnp.pi * prior_var
        )

    def loglik(u):
        d = u - mu_star
        return -0.5 * jnp.sum(d * d) / lik_var - 0.5 * dim * jnp.log(
            2 * jnp.pi * lik_var
        )

    def prior_sample(key, n):
        return jnp.sqrt(prior_var) * jax.random.normal(key, (n, dim))

    state, infos = smc_sample(
        logprior, loglik, prior_sample, jax.random.PRNGKey(1),
        n_particles=2048, n_move=5,
    )
    assert float(state.beta) == pytest.approx(1.0)
    w = np.exp(np.asarray(state.logw - jax.scipy.special.logsumexp(state.logw)))
    u = np.asarray(state.u)
    post_var = 1.0 / (1.0 / prior_var + 1.0 / lik_var)
    post_mean = post_var * np.asarray(mu_star) / lik_var
    got_mean = (w[:, None] * u).sum(0)
    np.testing.assert_allclose(got_mean, post_mean, atol=0.1)
    got_var = (w[:, None] * (u - got_mean) ** 2).sum(0)
    np.testing.assert_allclose(got_var, post_var, rtol=0.35)
    # analytic evidence: N(0 | mu*, (prior+lik) var) per dim
    want_log_z = float(
        -0.5 * np.sum(np.asarray(mu_star) ** 2) / (prior_var + lik_var)
        - 0.5 * dim * np.log(2 * np.pi * (prior_var + lik_var))
    )
    assert abs(float(state.log_z) - want_log_z) < 0.25


def test_advi_gaussian_target():
    dim = 4
    mean = jnp.asarray([1.0, -1.0, 2.0, 0.0])
    sd = jnp.asarray([0.5, 1.0, 0.2, 2.0])

    def logpost(u):
        z = (u - mean) / sd
        return -0.5 * jnp.sum(z * z)

    res = jax.jit(
        lambda: advi_fit(logpost, dim, jax.random.PRNGKey(0), n_steps=3000,
                         n_mc=16, learning_rate=2e-2, dtype=jnp.float64)
    )()
    np.testing.assert_allclose(np.asarray(res.mu), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(
        np.exp(np.asarray(res.log_sd)), np.asarray(sd), rtol=0.2
    )
    draws = advi_sample(res, jax.random.PRNGKey(1), 4000)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.15)


def test_smc_matches_mcmc_on_nngp(rng):
    coords, w_true, y = simulate_gp_field(
        rng, n=120, name="exponential", sigma2=1.0, phi=0.3, tau2=0.1
    )
    model = ResponseNNGP(coords, y, kernel="exponential", m=6, dtype=jnp.float64)
    mwg = model.sample(n_samples=1200, n_burn=400, seed=1)
    draws, infos = model.sample_smc(n_particles=768, n_move=8, seed=2)
    w = np.exp(draws["logw"] - np.logaddexp.reduce(draws["logw"]))
    for name in ("sigma2", "tau2", "phi"):
        a = (w * draws[name]).sum()
        b = np.asarray(mwg[name]).mean()
        bsd = np.asarray(mwg[name]).std()
        se = bsd / np.sqrt(max(ess(mwg[name]), 4))
        assert abs(a - b) < 6 * se + 0.15 * bsd, (name, a, b, bsd)
    assert np.isfinite(draws["log_z"])


def test_advi_on_nngp_reasonable(rng):
    coords, w_true, y = simulate_gp_field(
        rng, n=150, name="exponential", sigma2=1.0, phi=0.3, tau2=0.1
    )
    model = ResponseNNGP(coords, y, kernel="exponential", m=6, dtype=jnp.float64)
    draws, res = model.fit_advi(n_steps=1500, seed=3)
    # ELBO improved and tau2 (well-identified) lands near truth
    elbo = np.asarray(res.elbo_trace)
    assert elbo[-100:].mean() > elbo[:100].mean()
    assert 0.03 < draws["tau2"].mean() < 0.4

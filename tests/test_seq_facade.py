"""SeqNNGP facade: reference workflow construct -> sample -> predict."""

import jax
import numpy as np
import jax.numpy as jnp

from pynngp_tpu import SeqNNGP
from tests.conftest import simulate_gp_field


def test_latent_workflow_end_to_end(rng):
    coords, w_true, y = simulate_gp_field(
        rng, n=220, name="exponential", sigma2=1.0, phi=0.3, tau2=0.05
    )
    train, test = slice(0, 200), slice(200, 220)
    gp = SeqNNGP(
        y[train], coords[train], m=8, cov_model="exponential", model="latent",
        dtype=jnp.float64,
    )
    gp.sample(n_samples=300, n_burn=300, seed=9)
    s = gp.summary()
    assert set(s) >= {"sigma2", "tau2", "phi"}
    pred = gp.predict(coords[test], key=jax.random.PRNGKey(1))
    assert pred["mean"].shape == (300, 20)
    pm = np.asarray(pred["mean"]).mean(axis=0)
    # predictive mean tracks the held-out observations
    assert np.corrcoef(pm, y[test])[0, 1] > 0.7
    rmse = np.sqrt(np.mean((pm - y[test]) ** 2))
    assert rmse < np.std(y[train])


def test_response_workflow_end_to_end(rng):
    coords, w_true, y = simulate_gp_field(
        rng, n=220, name="sqexp", sigma2=1.0, phi=0.3, tau2=0.1
    )
    train, test = slice(0, 200), slice(200, 220)
    gp = SeqNNGP(
        y[train], coords[train], m=10, cov_model="sqexp", model="response",
        dtype=jnp.float64,
    )
    gp.sample(n_samples=300, n_burn=300, seed=10)
    pred = gp.predict(coords[test])
    pm = np.asarray(pred["mean"]).mean(axis=0)
    rmse = np.sqrt(np.mean((pm - y[test]) ** 2))
    assert rmse < np.std(y[train])


def test_multichain_facade_predict(rng):
    coords, w_true, y = simulate_gp_field(rng, n=120, name="exponential")
    gp = SeqNNGP(y, coords, m=6, cov_model="exponential", model="response",
                 dtype=jnp.float64)
    gp.sample(n_samples=100, n_burn=100, n_chains=2, seed=3)
    pred = gp.predict(coords[:5], thin=4)
    assert pred["mean"].shape == (50, 5)

"""Prediction vs exact dense kriging (SURVEY.md section 4: 'prediction RMSE
vs exact kriging')."""

import jax
import jax.numpy as jnp
import numpy as np

from pynngp_tpu import kernels, predict
from pynngp_tpu.gold.dense_gp import dense_krig_predict
from tests.conftest import simulate_gp_field


def test_full_neighbor_kriging_equals_dense(rng):
    """With m = n training neighbors, NNGP kriging == exact GP kriging."""
    n, n0 = 50, 12
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n)
    new = rng.uniform(size=(n0, 2))
    sigma2, phi, tau2 = 1.2, 0.4, 0.15
    table = predict.build_prediction_table(coords, new, m=n, dtype=jnp.float64)
    out = predict.predict_draws(
        kernels.SqExp(),
        table,
        jnp.asarray(y),
        {
            "sigma2": np.array([sigma2]),
            "tau2": np.array([tau2]),
            "phi": np.array([phi]),
        },
        jitter=0.0,
    )
    mean_gold, var_gold = dense_krig_predict(
        y, coords, new, "sqexp", sigma2, phi, tau2
    )
    np.testing.assert_allclose(np.asarray(out["mean"][0]), mean_gold, rtol=1e-8)
    # gold var already includes the nugget on the target (noise_scale=True)
    np.testing.assert_allclose(np.asarray(out["var"][0]), var_gold, rtol=1e-7)


def test_predict_shapes_and_sampling(rng):
    coords = rng.uniform(size=(100, 2))
    y = rng.standard_normal(100)
    new = rng.uniform(size=(7, 2))
    table = predict.build_prediction_table(coords, new, m=10, dtype=jnp.float64)
    s_draws = {
        "sigma2": rng.uniform(0.5, 1.5, size=5),
        "tau2": rng.uniform(0.05, 0.2, size=5),
        "phi": rng.uniform(0.2, 0.5, size=5),
    }
    out = predict.predict_draws(
        kernels.Exponential(), table, jnp.asarray(y), s_draws,
        key=jax.random.PRNGKey(0),
    )
    assert out["mean"].shape == (5, 7)
    assert out["var"].shape == (5, 7)
    assert out["samples"].shape == (5, 7)
    assert (np.asarray(out["var"]) > 0).all()


def test_prediction_rmse_close_to_exact(rng):
    """m=15 NNGP prediction nearly matches exact kriging on a real field."""
    coords, w, y = simulate_gp_field(rng, n=220, name="exponential",
                                     sigma2=1.0, phi=0.3, tau2=0.1)
    train, test = slice(0, 200), slice(200, 220)
    table = predict.build_prediction_table(
        coords[train], coords[test], m=15, dtype=jnp.float64
    )
    out = predict.predict_draws(
        kernels.Exponential(), table, jnp.asarray(y[train]),
        {"sigma2": np.array([1.0]), "tau2": np.array([0.1]),
         "phi": np.array([0.3])},
        jitter=0.0,
    )
    mean_gold, _ = dense_krig_predict(
        y[train], coords[train], coords[test], "exponential", 1.0, 0.3, 0.1
    )
    # neighbor-truncated mean within a small fraction of the exact one
    rmse = np.sqrt(np.mean((np.asarray(out["mean"][0]) - mean_gold) ** 2))
    spread = np.std(y[train])
    assert rmse < 0.05 * spread

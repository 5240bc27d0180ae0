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


def test_fixed_effects_prediction_equals_dense(rng):
    """predict with x0/beta (SURVEY.md sec 3.3 predict(coords0, X0)):
    with m = n neighbors, response-model prediction with covariates equals
    exact kriging on the residuals plus x0 @ beta."""
    n, n0, p = 50, 10, 2
    coords = rng.uniform(size=(n, 2))
    new = rng.uniform(size=(n0, 2))
    x = rng.standard_normal((n, p))
    x0 = rng.standard_normal((n0, p))
    beta = np.array([1.5, -0.7])
    y = rng.standard_normal(n) + x @ beta
    sigma2, phi, tau2 = 1.2, 0.4, 0.15
    table = predict.build_prediction_table(coords, new, m=n, dtype=jnp.float64)
    out = predict.predict_draws(
        kernels.SqExp(), table, jnp.asarray(y),
        {"sigma2": np.array([sigma2]), "tau2": np.array([tau2]),
         "phi": np.array([phi])},
        x0=x0, beta_draws=beta[None], x_train=jnp.asarray(x),
        jitter=0.0,
    )
    mean_gold, var_gold = dense_krig_predict(
        y - x @ beta, coords, new, "sqexp", sigma2, phi, tau2
    )
    np.testing.assert_allclose(
        np.asarray(out["mean"][0]), mean_gold + x0 @ beta, rtol=1e-8
    )
    np.testing.assert_allclose(np.asarray(out["var"][0]), var_gold, rtol=1e-7)


def test_latent_fixed_effects_mean_shift(rng):
    """Latent model: x0 @ beta shifts the predictive mean, conditioning on w
    stays unchanged."""
    n, n0, p, s = 60, 5, 2, 3
    coords = rng.uniform(size=(n, 2))
    new = rng.uniform(size=(n0, 2))
    x0 = rng.standard_normal((n0, p))
    beta_draws = rng.standard_normal((s, p))
    w_draws = rng.standard_normal((s, n))
    table = predict.build_prediction_table(coords, new, m=8, dtype=jnp.float64)
    dr = {"sigma2": np.full(s, 1.0), "tau2": np.full(s, 0.1),
          "phi": np.full(s, 0.3)}
    base = predict.predict_draws(
        kernels.Exponential(), table, None, dr, values_draws=w_draws
    )
    shifted = predict.predict_draws(
        kernels.Exponential(), table, None, dr, values_draws=w_draws,
        x0=x0, beta_draws=beta_draws,
    )
    np.testing.assert_allclose(
        np.asarray(shifted["mean"]),
        np.asarray(base["mean"]) + beta_draws @ x0.T,
        rtol=1e-8,
    )
    np.testing.assert_allclose(np.asarray(shifted["var"]),
                               np.asarray(base["var"]), rtol=1e-12)


def test_batch_draws_consistency(rng):
    """Vmapped draw blocks (batch_draws) match sequential processing."""
    coords = rng.uniform(size=(80, 2))
    y = rng.standard_normal(80)
    new = rng.uniform(size=(6, 2))
    table = predict.build_prediction_table(coords, new, m=10, dtype=jnp.float64)
    dr = {"sigma2": rng.uniform(0.5, 1.5, 7), "tau2": rng.uniform(0.05, 0.2, 7),
          "phi": rng.uniform(0.2, 0.5, 7)}
    a = predict.predict_draws(kernels.SqExp(), table, jnp.asarray(y), dr,
                              batch_draws=1)
    b = predict.predict_draws(kernels.SqExp(), table, jnp.asarray(y), dr,
                              batch_draws=4)
    np.testing.assert_allclose(np.asarray(a["mean"]), np.asarray(b["mean"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["var"]), np.asarray(b["var"]),
                               rtol=1e-12)


def test_facade_predict_with_covariates(rng):
    """End-to-end: SeqNNGP fit with covariates predicts with x0."""
    from pynngp_tpu.models.seq import SeqNNGP

    n, p = 120, 2
    coords = rng.uniform(size=(n, 2))
    x = rng.standard_normal((n, p))
    beta_true = np.array([2.0, -1.0])
    y = x @ beta_true + 0.5 * rng.standard_normal(n)
    mdl = SeqNNGP(y, coords, m=6, cov_model="sqexp", model="response",
                  x=x, backend="xla")
    mdl.sample(30, n_burn=30, seed=0)
    new = rng.uniform(size=(4, 2))
    x0 = rng.standard_normal((4, p))
    out = mdl.predict(new, x0=x0)
    assert out["mean"].shape[1] == 4
    assert np.isfinite(np.asarray(out["mean"])).all()
    # the fixed effect dominates here: mean should correlate with x0 @ beta
    pred = np.asarray(out["mean"]).mean(axis=0)
    want = x0 @ beta_true
    assert np.corrcoef(pred, want)[0, 1] > 0.9

"""Numerics sanity under jax_debug_nans (SURVEY.md section 5.2: the TPU
analog of sanitizer builds — the core paths must not produce NaN/Inf on
well-conditioned inputs even with NaN-trapping enabled)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu import kernels, vecchia
from pynngp_tpu.models.response import ResponseNNGP
from tests.conftest import simulate_gp_field


def test_core_paths_under_debug_nans(rng):
    coords, w, y = simulate_gp_field(rng, n=80, name="exponential", tau2=0.1)
    with jax.debug_nans(True):
        data, tab = vecchia.make_vecchia_data(coords, 6, dtype=jnp.float64)
        y_ord = jnp.asarray(y[tab.order])
        ll = vecchia.vecchia_loglik(
            kernels.Exponential(), {"phi": jnp.asarray(0.3)}, data, y_ord,
            jnp.asarray(1.0), alpha=0.1,
        )
        g = jax.grad(
            lambda p: vecchia.vecchia_loglik(
                kernels.Exponential(), {"phi": p}, data, y_ord,
                jnp.asarray(1.0), alpha=0.1,
            )
        )(jnp.asarray(0.3))
        assert np.isfinite(float(ll)) and np.isfinite(float(g))


def test_x64_guard_fires_on_mwg_entry_points(rng, monkeypatch):
    """The f64-accumulation warning covers the MWG `sample` entry points,
    not just the gradient samplers (round-4 verdict weak #5)."""
    import warnings

    from pynngp_tpu.models.latent import LatentNNGP
    from pynngp_tpu.utils import numerics

    # direct threshold semantics at a realistic n
    numerics._warned.clear()
    jax.config.update("jax_enable_x64", False)
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            numerics.warn_if_x64_off(25_000, "unit-direct")
        assert any("f64-accumulated" in str(w.message) for w in rec)

        # wiring: both models' MWG sample() call the guard (threshold
        # lowered so the test stays small/fast)
        monkeypatch.setattr(numerics, "X64_WARN_MIN_N", 50)
        coords, w, y = simulate_gp_field(rng, n=60, name="exponential",
                                         tau2=0.1)
        numerics._warned.clear()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            ResponseNNGP(coords, y, kernel="exponential", m=5).sample(
                2, n_burn=1)
        assert any("ResponseNNGP.sample" in str(w.message) for w in rec)
        numerics._warned.clear()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            LatentNNGP(coords, y, kernel="exponential", m=5).sample(
                2, n_burn=1)
        assert any("LatentNNGP.sample" in str(w.message) for w in rec)
    finally:
        jax.config.update("jax_enable_x64", True)
        numerics._warned.clear()


def test_sampler_step_under_debug_nans(rng):
    coords, w, y = simulate_gp_field(rng, n=60, name="exponential", tau2=0.1)
    model = ResponseNNGP(coords, y, kernel="exponential", m=5, dtype=jnp.float64)
    with jax.debug_nans(True):
        st = model.init_state(jax.random.PRNGKey(0))
        st = model.step(jax.random.PRNGKey(1), st)
        assert np.isfinite(float(st.value))

"""Preemption resilience: checkpointed runs resume and complete."""

import numpy as np
import jax.numpy as jnp

from pynngp_tpu.models.response import ResponseNNGP
from tests.conftest import simulate_gp_field


def test_driver_checkpoint_resume(rng, tmp_path):
    coords, w, y = simulate_gp_field(rng, n=100)
    model = ResponseNNGP(coords, y, kernel="sqexp", m=5, dtype=jnp.float64)
    ck = str(tmp_path / "run")
    # full run with checkpointing on
    full = model.sample(
        n_samples=120, n_burn=60, seed=7, chunk=20,
        checkpoint_path=ck, checkpoint_every=1,
    )
    # the final checkpoint exists and resuming from it finishes instantly-ish
    import os

    assert os.path.exists(ck + ".npz")
    resumed = model.sample(
        n_samples=120, n_burn=60, seed=7, chunk=20,
        checkpoint_path=ck, checkpoint_every=1,
    )
    assert resumed["sigma2"].shape == full["sigma2"].shape
    # earlier draws (restored from the draws checkpoint) match the original
    n_restored = 100  # last checkpoint within the first run covered >= 100
    np.testing.assert_allclose(
        resumed["sigma2"][:n_restored], full["sigma2"][:n_restored]
    )
    assert np.isfinite(resumed["loglik"]).all()

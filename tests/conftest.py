"""Test configuration: run on CPU with a virtual 8-device backend (the
standard JAX way to exercise sharding/collectives without a pod — SURVEY.md
section 4), and enable x64 so gold-oracle comparisons are fp64-tight."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site config in this image forces jax_platforms to "axon,cpu" (tunneled
# TPU) regardless of the env var; override it after import so tests never
# touch the real chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: repeat suite runs skip recompiles
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def simulate_gp_field(rng, n, d=2, name="sqexp", sigma2=1.0, phi=0.5, tau2=0.1, nu=None):
    """Simulate coords + exact GP draw y = w + noise (dense fp64)."""
    from pynngp_tpu.gold.dense_gp import dense_cov

    coords = rng.uniform(0.0, 1.0, size=(n, d))
    c = dense_cov(coords, name, sigma2, phi, 0.0, nu)
    lw = np.linalg.cholesky(c + 1e-10 * np.eye(n))
    w = lw @ rng.standard_normal(n)
    y = w + np.sqrt(tau2) * rng.standard_normal(n)
    return coords, w, y


@pytest.fixture
def gp_field(rng):
    return simulate_gp_field(rng, n=80)

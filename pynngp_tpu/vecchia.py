"""Batched Vecchia B/F builder and log-likelihood — the TPU-native rebuild of
the reference's hot kernel ``SeqNNGP::updateBF`` (SURVEY.md section 2 "Vecchia
B/F builder" row; update equations in section 3.2).

Reference semantics (per ordered site i with neighbor set N(i), |N(i)| <= m):

    B_i = C_{N(i),N(i)}^{-1} c_i          (m-vector of kriging weights)
    F_i = C_ii - c_i^T B_i                (conditional variance)
    log p(y) = sum_i log N(y_i | B_i . y_{N(i)}, F_i)

where C is the *unit-variance* correlation (+ relative nugget alpha =
tau^2/sigma^2 on the diagonal for the response model), so that sigma^2
factors out and stays inverse-gamma-conjugate (reference ``updateSigmaSq``).

TPU-first design (vs the reference's OpenMP loop of Eigen LLT solves):

- everything is one jitted, differentiable function of static ``(n, m)``
  shapes; ragged first-m sites handled by masking (identity rows/cols in
  C_N, zero cross-covariance => B = 0 there, exactly reproducing the
  reference's growing conditioning sets);
- neighbor gathers are ``jnp.take`` on fixed tables (XLA gather);
- the n independent m-by-m factorizations run as one batched
  ``lax.linalg.cholesky`` on an ``(n, m, m)`` tensor (MXU/VPU), or through
  the fused Pallas kernel in :mod:`pynngp_tpu.ops.pallas_bf`;
- distances can be precomputed once per dataset (they never depend on
  hyperparameters) or recomputed from gathered coords to save HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from pynngp_tpu.distance import Euclidean, get_distance
from pynngp_tpu.neighbors import NeighborTable, build_neighbor_table

__all__ = [
    "VecchiaData",
    "make_vecchia_data",
    "vecchia_bf",
    "vecchia_suffstats",
    "vecchia_loglik",
    "LOG_2PI",
]

LOG_2PI = 1.8378770664093453


class VecchiaData(NamedTuple):
    """Device-side static-shape Vecchia structure (ordered site space).

    ``nn_dist`` (n, m) and ``nn_cross_dist`` (n, m, m) are the
    hyperparameter-independent distance caches; pass ``None`` to recompute
    from gathered coords on the fly (lower memory, more VPU work).
    """

    coords: jax.Array  # (n, d)
    nn_idx: jax.Array  # (n, m) int32
    nn_mask: jax.Array  # (n, m) bool
    # Host-side (numpy) distance caches: the Pallas lane cache consumes them
    # on the host (device round-trips of the (n, m, m) table cost ~45 s at
    # n=100k over remote-dispatch links); the XLA path closes over them, so
    # they are embedded/transferred once per compile, not per call.
    nn_dist: Optional[jax.Array] = None  # (n, m) numpy
    nn_cross_dist: Optional[jax.Array] = None  # (n, m, m) numpy

    @property
    def n(self) -> int:
        return self.coords.shape[0]

    @property
    def m(self) -> int:
        return self.nn_idx.shape[1]


def neighbor_distances(coords, nn_idx, dist_fn=None):
    """Compute (n, m) site-to-neighbor and (n, m, m) neighbor-pair distances."""
    dist_fn = Euclidean() if dist_fn is None else dist_fn
    nbr = jnp.take(coords, nn_idx, axis=0)  # (n, m, d)
    d_in = dist_fn.one_to_many(coords, nbr)  # (n, m)
    d_nn = dist_fn.pairwise(nbr, nbr)  # (n, m, m)
    return d_in, d_nn


def make_vecchia_data(
    coords,
    m: int,
    ordering: str = "coordinate",
    distance="euclidean",
    precompute_distances: bool = True,
    table: Optional[NeighborTable] = None,
    dtype=jnp.float32,
):
    """Host-side setup: order sites, build the neighbor table, move to device.

    Returns (data, table): ``data`` has coords *in ordered space*; use
    ``table.order`` / ``table.inverse_order`` to map user arrays.
    """
    import numpy as np

    coords = np.asarray(coords)
    dist_fn = get_distance(distance)
    if table is None:
        table = build_neighbor_table(coords, m, ordering=ordering, metric=dist_fn.name)
    pts_host = coords[table.order]
    pts = jnp.asarray(pts_host, dtype=dtype)
    nn_idx = jnp.asarray(table.nn_idx)
    nn_mask = jnp.asarray(table.nn_mask)
    if precompute_distances:
        # One-time, hyperparameter-independent: compute on host in numpy f64
        # and ship the result — eager device ops here would round-trip per op
        # AND inherit TPU matmul precision (bf16 MXU) on non-Euclidean paths.
        nbr = pts_host[table.nn_idx]  # (n, m, d)
        d_in = dist_fn.one_to_many_np(pts_host, nbr)
        d_nn = dist_fn.pairwise_np(nbr, nbr)
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        data = VecchiaData(
            pts, nn_idx, nn_mask, d_in.astype(np_dtype), d_nn.astype(np_dtype)
        )
    else:
        data = VecchiaData(pts, nn_idx, nn_mask)
    return data, table


def _distances(data: VecchiaData, dist_fn=None):
    if data.nn_dist is not None and data.nn_cross_dist is not None:
        return data.nn_dist, data.nn_cross_dist
    return neighbor_distances(data.coords, data.nn_idx, dist_fn)


def vecchia_bf(kernel, params, data: VecchiaData, alpha=0.0, jitter=1e-6, dist_fn=None):
    """Batched kriging weights and conditional variances.

    Args:
      kernel: correlation kernel (:mod:`pynngp_tpu.kernels`).
      params: kernel hyperparameter pytree (natural space).
      alpha: relative nugget tau^2/sigma^2 added to the diagonal (response
        model); 0 for the latent-process covariance.  Either a scalar
        (homogeneous noise) or an (n,) vector of per-site relative nuggets
        (heterogeneous noise model, reference ``noiseModel.h`` variants):
        site i's own diagonal gets alpha[i] and its neighbor block's
        diagonal alpha[nn_idx[i]].

    Returns:
      B: (n, m) weights (0 in masked slots), F: (n,) conditional variances of
      the *unit-variance* process (multiply by sigma^2 for the real scale).
    """
    d_in, d_nn = _distances(data, dist_fn)
    mask = data.nn_mask
    dtype = d_in.dtype
    m = mask.shape[1]
    eye = jnp.eye(m, dtype=dtype)
    mask_f = mask.astype(dtype)
    mask2 = mask_f[:, :, None] * mask_f[:, None, :]
    rho_nn = kernel.correlation(d_nn, params)
    alpha = jnp.asarray(alpha, dtype)
    if alpha.ndim == 0:
        alpha_own = alpha
        alpha_nbr = jnp.broadcast_to(alpha, mask.shape)
    else:
        alpha_own = alpha
        alpha_nbr = jnp.take(alpha, data.nn_idx, axis=0)  # (n, m)
    diag_add = (alpha_nbr + jitter)[..., None] * eye
    # valid: rho + alpha_j on diag; masked slots: identity row/col (=> B = 0)
    c_mat = (rho_nn + diag_add) * mask2 + eye * (1.0 - mask2 * eye)
    c_vec = kernel.correlation(d_in, params) * mask_f
    with jax.named_scope("vecchia_bf_cholesky"):
        chol = lax.linalg.cholesky(c_mat)  # batched (n, m, m)
    # B = C^{-1} c via two triangular solves.
    tmp = lax.linalg.triangular_solve(
        chol, c_vec[..., None], left_side=True, lower=True
    )
    b = lax.linalg.triangular_solve(
        chol, tmp, left_side=True, lower=True, transpose_a=True
    )[..., 0]
    f = (1.0 + alpha_own) - jnp.sum(b * c_vec, axis=-1)
    return b, f


def vecchia_suffstats(b, f, y, data: VecchiaData):
    """Sufficient statistics of the Vecchia quadratic form for vector y.

    Returns (logdet, quad, resid): sum_i log F_i, sum_i r_i^2 / F_i, and the
    per-site residuals r_i = y_i - B_i . y_{N(i)} (needed for the conjugate
    sigma^2 update and the latent Gibbs scan).
    """
    y_nbr = jnp.take(y, data.nn_idx, axis=0) * data.nn_mask.astype(y.dtype)
    resid = y - jnp.sum(b * y_nbr, axis=-1)
    # f64-accumulated reductions (cast back so callers see the input dtype):
    # at n=100k the fp32 tree-sum carries O(0.1-0.5) noise, which caps the
    # NUTS acceptance statistic at ~e^-noise regardless of step size and
    # wedges dual averaging at tiny steps (measured on v5e).  Under
    # jax_enable_x64=False the dtype request is a no-op — enable x64 in the
    # driving process (bench.py does) to get the accurate path.
    logdet = jnp.sum(jnp.log(f), dtype=jnp.float64).astype(f.dtype)
    quad = jnp.sum(resid * resid / f, dtype=jnp.float64).astype(f.dtype)
    return logdet, quad, resid


def vecchia_loglik(
    kernel,
    params,
    data: VecchiaData,
    y,
    sigma2,
    alpha=0.0,
    jitter=1e-6,
    dist_fn=None,
):
    """Vecchia (NNGP) log-likelihood of y under sigma^2 * (rho + alpha I).

    One jitted, differentiable scalar — the center of every sampler
    (SURVEY.md section 7 design stance).  O(n m^3) flops, O(n m) memory.
    """
    b, f = vecchia_bf(kernel, params, data, alpha=alpha, jitter=jitter, dist_fn=dist_fn)
    logdet, quad, _ = vecchia_suffstats(b, f, y, data)
    n = y.shape[-1]
    return -0.5 * (n * (LOG_2PI + jnp.log(sigma2)) + logdet + quad / sigma2)

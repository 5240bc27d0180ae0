"""Multi-device sharding: mesh construction and the location-sharded Vecchia
log-likelihood (SURVEY.md section 2.1 parallelism inventory; section 5.7/5.8).

Design (TPU-first, per the scaling-book recipe):

- 2-D logical mesh ``(chains, sites)``: chains/particles are the
  data-parallel axis; the n-site axis of the batched per-site log-lik terms
  is the model-parallel axis.
- Inputs: per-site tables (neighbor indices, masks, cached distances) are
  sharded along the site axis; the value vector ``y`` (a few MB even at
  n=500k) is *replicated* so every device gathers neighbor values locally —
  m-sparse dependence means no ring/halo machinery is needed
  (SURVEY.md section 5.7).
- Each device computes its site block's (sum log F, quadratic form)
  contributions; one scalar ``psum`` over the ``sites`` axis yields the
  replicated log-likelihood.  Chains vectorize inside the shard via vmap,
  sharded across the ``chains`` axis.
- Gradients flow through ``psum`` (collectives are differentiable), so the
  same function feeds NUTS/HMC/SMC/VI on a pod slice.

The reference has no distributed capability at all (single process,
SURVEY.md section 2.1); everything here is new TPU-native design.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pynngp_tpu.vecchia import LOG_2PI, VecchiaData

__all__ = [
    "make_mesh",
    "pad_data_for_sharding",
    "shard_vecchia_data",
    "make_sharded_suffstats",
    "make_sharded_loglik",
    "make_sharded_bf",
    "shard_color_tables",
    "make_sharded_chromatic",
]


def make_mesh(
    n_chain_shards: int = 1,
    n_site_shards: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build the (chains, sites) device mesh.  Intra-slice ICI carries the
    site-axis psum; the chain axis needs no communication during sampling."""
    devices = list(devices if devices is not None else jax.devices())
    nd = len(devices)
    if n_site_shards is None:
        n_site_shards = nd // n_chain_shards
    assert n_chain_shards * n_site_shards == nd, (
        f"mesh {n_chain_shards}x{n_site_shards} != {nd} devices"
    )
    arr = np.asarray(devices).reshape(n_chain_shards, n_site_shards)
    return Mesh(arr, axis_names=("chains", "sites"))


def pad_data_for_sharding(data: VecchiaData, n_shards: int) -> VecchiaData:
    """Pad the site axis to a multiple of n_shards with fully-masked rows.

    Padded rows have empty conditioning sets (mask all False => B = 0,
    F = 1 + alpha) and must be excluded from logdet/quad via the row mask —
    the sharded suffstats below handles this with a validity vector."""
    n = data.n
    n_pad = (-n) % n_shards
    if n_pad == 0:
        return data, jnp.ones((n,), bool)
    def pad(a, value=0):
        if a is None:
            return None
        pad_width = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width, constant_values=value)

    padded = VecchiaData(
        coords=pad(data.coords),
        nn_idx=pad(data.nn_idx),
        nn_mask=pad(data.nn_mask, False),
        nn_dist=pad(data.nn_dist),
        nn_cross_dist=pad(data.nn_cross_dist),
    )
    valid = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((n_pad,), bool)])
    return padded, valid


def shard_vecchia_data(data: VecchiaData, mesh: Mesh, y=None):
    """device_put the per-site tables sharded over the 'sites' axis and the
    gathered-from vectors replicated.

    Returns (data, y_own, y_full, valid): ``y_own`` is the padded,
    site-sharded copy (each device's own sites); ``y_full`` the unpadded
    replicated copy every device gathers neighbor values from."""
    n = data.n
    data, valid = pad_data_for_sharding(data, mesh.shape["sites"])
    site_sharded = NamedSharding(mesh, P("sites"))
    replicated = NamedSharding(mesh, P())

    def put(a, sharding):
        return None if a is None else jax.device_put(a, sharding)

    out = VecchiaData(
        coords=put(data.coords, site_sharded),
        nn_idx=put(data.nn_idx, site_sharded),
        nn_mask=put(data.nn_mask, site_sharded),
        nn_dist=put(data.nn_dist, site_sharded),
        nn_cross_dist=put(data.nn_cross_dist, site_sharded),
    )
    valid = jax.device_put(valid, site_sharded)
    y_own = y_full = None
    if y is not None:
        y = jnp.asarray(y)
        n_pad = out.nn_idx.shape[0] - n
        y_pad = jnp.pad(y, (0, n_pad)) if n_pad else y
        y_own = jax.device_put(y_pad, site_sharded)
        y_full = jax.device_put(y, replicated)
    return out, y_own, y_full, valid


def _block_bf(kernel, params, alpha, jitter, nn_mask, d_in, d_nn,
              v_own=None, v_nbr=None):
    """Per-site-block Vecchia B/F — the same batched math as
    vecchia.vecchia_bf on a local block of sites.

    ``v_own``/``v_nbr``: optional per-site noise weights for the
    heterogeneous nugget alpha * v_i (reference noiseModel.h analog) — the
    neighbor diagonal becomes diag(alpha v_N) and the own-site variance
    1 + alpha v_0."""
    dtype = d_in.dtype
    m = nn_mask.shape[1]
    eye = jnp.eye(m, dtype=dtype)
    mask_f = nn_mask.astype(dtype)
    mask2 = mask_f[:, :, None] * mask_f[:, None, :]
    rho_nn = kernel.correlation(d_nn, params)
    a_diag = alpha if v_nbr is None else (alpha * v_nbr)[..., None]
    c_mat = (rho_nn + (a_diag + jitter) * eye) * mask2 + eye * (1.0 - mask2 * eye)
    c_vec = kernel.correlation(d_in, params) * mask_f
    chol = lax.linalg.cholesky(c_mat)
    tmp = lax.linalg.triangular_solve(chol, c_vec[..., None], left_side=True, lower=True)
    b = lax.linalg.triangular_solve(
        chol, tmp, left_side=True, lower=True, transpose_a=True
    )[..., 0]
    a_own = alpha if v_own is None else alpha * v_own
    f = (1.0 + a_own) - jnp.sum(b * c_vec, axis=-1)
    return b, f, mask_f


def _block_suffstats(kernel, params, alpha, jitter, nn_idx, nn_mask, d_in, d_nn,
                     y_own, y_full, valid, v_own=None, v_full=None):
    """Per-site-block Vecchia build — the same batched math as
    vecchia.vecchia_bf/vecchia_suffstats on a local block, with neighbor
    values gathered from the replicated y_full."""
    v_nbr = None if v_full is None else jnp.take(v_full, nn_idx, axis=0)
    b, f, mask_f = _block_bf(
        kernel, params, alpha, jitter, nn_mask, d_in, d_nn, v_own, v_nbr
    )
    y_nbr = jnp.take(y_full, nn_idx, axis=0) * mask_f
    resid = y_own - jnp.sum(b * y_nbr, axis=-1)
    vf = valid.astype(d_in.dtype)
    logdet = jnp.sum(jnp.log(f) * vf)
    quad = jnp.sum(resid * resid / f * vf)
    return logdet, quad


def make_sharded_suffstats(kernel, mesh: Mesh, jitter: float = 1e-6,
                           hetero: bool = False):
    """Build fn(params, alpha, data, y_own, y_full, valid[, v_own, v_full])
    -> (logdet, quad) scalars, computed with the site axis sharded over the
    mesh's 'sites' axis and psum-reduced.

    The shard_map is explicit over 'sites' ONLY (``axis_names``): any other
    mesh axes (e.g. 'chains') stay under compiler control, so callers can
    vmap this function over a chain batch and let jit shard that batch over
    the 'chains' axis — the composition the NUTS/HMC kernels need.

    ``hetero``: per-site nugget alpha * v_i; v rides like y (site-sharded
    own copy + replicated gather copy)."""

    def impl(params, alpha, nn_idx, nn_mask, d_in, d_nn, y_own, y_full,
             valid, *v):
        v_own, v_full = v if hetero else (None, None)
        logdet, quad = _block_suffstats(
            kernel, params, alpha, jitter, nn_idx, nn_mask, d_in, d_nn,
            y_own, y_full, valid, v_own, v_full,
        )
        return lax.psum(logdet, "sites"), lax.psum(quad, "sites")

    in_specs = (
        P(),  # params pytree leaves (replicated scalars)
        P(),  # alpha
        P("sites", None),  # nn_idx
        P("sites", None),  # nn_mask
        P("sites", None),  # d_in
        P("sites", None, None),  # d_nn
        P("sites"),  # y_own (site-sharded)
        P(),  # y_full replicated
        P("sites"),  # valid
    )
    if hetero:
        in_specs = in_specs + (P("sites"), P())  # v_own, v_full

    sharded = shard_map(
        impl,
        mesh=mesh,
        axis_names=frozenset({"sites"}),
        in_specs=in_specs,
        out_specs=(P(), P()),
    )

    def fn(params, alpha, data: VecchiaData, y_own, y_full, valid, *v):
        return sharded(
            params,
            alpha,
            data.nn_idx,
            data.nn_mask,
            data.nn_dist,
            data.nn_cross_dist,
            y_own,
            y_full,
            valid,
            *v,
        )

    return fn


def make_sharded_loglik(kernel, mesh: Mesh, n: int, jitter: float = 1e-6,
                        hetero: bool = False):
    """Per-chain response-model log-likelihood over the mesh.

    fn(params, sigma2, alpha, data, y_own, y_full, valid[, v_own, v_full])
    -> scalar log-likelihood (``n`` is the true, unpadded site count).  vmap
    over a chain batch composes with the 'chains' mesh axis (see
    make_sharded_suffstats)."""
    suff = make_sharded_suffstats(kernel, mesh, jitter, hetero=hetero)

    def fn(params, sigma2, alpha, data, y_own, y_full, valid, *v):
        logdet, quad = suff(params, alpha, data, y_own, y_full, valid, *v)
        return -0.5 * (
            n * (LOG_2PI + jnp.log(sigma2)) + logdet + quad / sigma2
        )

    return fn


def make_sharded_bf(kernel, mesh: Mesh, n: int, jitter: float = 1e-6,
                    hetero: bool = False):
    """Site-sharded Vecchia B/F build: the hot O(n m^3) loop runs on local
    site blocks; the (n, m) weight matrix and (n,) conditional variances come
    back site-sharded (padded rows sliced off).

    Consumers that gather B at arbitrary global sites (the latent chromatic
    Gibbs, the fixed-effects update) let GSPMD insert the all-gather — one
    (n m)-float collective per theta update, vs the O(n m^3) build that is
    actually sharded."""

    def impl(params, alpha, nn_mask, d_in, d_nn, nn_idx, *v):
        if hetero:
            v_own, v_full = v
            v_nbr = jnp.take(v_full, nn_idx, axis=0)
        else:
            v_own = v_nbr = None
        b, f, _ = _block_bf(
            kernel, params, alpha, jitter, nn_mask, d_in, d_nn, v_own, v_nbr
        )
        return b, f

    in_specs = (
        P(),  # params pytree (replicated scalars)
        P(),  # alpha
        P("sites", None),
        P("sites", None),
        P("sites", None, None),
        P("sites", None),  # nn_idx (only consulted for hetero gathers)
    )
    if hetero:
        in_specs = in_specs + (P("sites"), P())

    sharded = shard_map(
        impl,
        mesh=mesh,
        axis_names=frozenset({"sites"}),
        in_specs=in_specs,
        out_specs=(P("sites", None), P("sites")),
    )

    def fn(params, alpha, data: VecchiaData, *v):
        b, f = sharded(
            params, alpha, data.nn_mask, data.nn_dist, data.nn_cross_dist,
            data.nn_idx, *v,
        )
        return b[:n], f[:n]

    return fn


def shard_color_tables(colors: np.ndarray, n_shards: int):
    """Partition each color class round-robin across shards (host-side, once).

    Returns (sites, mask): (n_shards, n_colors, msz) int32 global site ids +
    bool validity, padded so every shard sweeps the same static shape.  Any
    balanced partition is correct — same-color sites are conditionally
    independent by the moral coloring, so which shard updates which site is
    pure load balancing."""
    n_colors = int(colors.max()) + 1
    groups = [np.nonzero(colors == c)[0] for c in range(n_colors)]
    msz = max(
        max((len(g) + n_shards - 1) // n_shards for g in groups), 1
    )
    sites = np.zeros((n_shards, n_colors, msz), np.int32)
    mask = np.zeros((n_shards, n_colors, msz), bool)
    for c, g in enumerate(groups):
        for s in range(n_shards):
            part = g[s::n_shards]
            sites[s, c, : len(part)] = part
            mask[s, c, : len(part)] = True
    return sites, mask


def make_sharded_chromatic(mesh: Mesh, n_colors: int):
    """Site-sharded exact chromatic Gibbs sweep for the latent-w model.

    Each device updates its partition of every color class (tables from
    :func:`shard_color_tables`); per color, the collision-free (w, resid)
    scatter deltas are psum'd over the 'sites' axis so every device holds the
    identical post-color state.  Given the same per-site normal draws ``eps``
    this reproduces the single-device chromatic sweep exactly (modulo
    reduction order): the per-site conditional moments are computed from the
    same pre-color (w, resid) regardless of which shard owns the site.

    State arrays (w, resid, B, per-site precomputes) ride in replicated —
    dependence is m-sparse but *global* (children cross any block boundary),
    and at a few MB per n=500k vector replication beats halo machinery
    (SURVEY.md section 5.7).  The O(n m^3) build is sharded separately in
    :func:`make_sharded_bf`.

    Returns fn(csites, csmask, w, resid, eps, child_idx, b_child, fp_child,
    v, sd, ytil, fprec) -> new replicated w.
    """

    def impl(csites, csmask, w, resid, eps, child_idx,
             b_child, fp_child, v, sd, ytil, fprec):
        n = w.shape[0]
        # Same restructure as the single-device sweep (models/latent.py):
        # stack every w-independent per-site quantity into this shard's
        # color-major layout with one gather each, and derive the own-site
        # conditional mean from the maintained residual invariant
        # mu_own = w_i - r_i instead of a per-color (msz, m) neighbor
        # gather.  Keeping the two sweeps formula-identical preserves the
        # sharded == single parity (modulo psum reduction order).
        cs = csites[0]  # (n_colors, msz) this shard's partitions
        xs = (
            cs,
            csmask[0].astype(w.dtype),
            jnp.take(b_child, cs, axis=0),
            jnp.take(fp_child, cs, axis=0),
            jnp.take(child_idx, cs, axis=0),
            jnp.take(v, cs), jnp.take(sd, cs), jnp.take(eps, cs),
            jnp.take(ytil, cs), jnp.take(fprec, cs),
        )

        def color_pass(carry, x):
            w, resid = carry
            sites, smask, bc_s, fp_s, ci_s, v_s, sd_s, eps_s, ytil_s, fprec_s = x
            w_s = jnp.take(w, sites)
            mu_own = w_s - jnp.take(resid, sites)
            resid_excl = jnp.take(resid, ci_s) + bc_s * w_s[:, None]
            rhs = ytil_s + mu_own * fprec_s + jnp.sum(
                bc_s * fp_s * resid_excl, axis=-1
            )
            w_new = v_s * rhs + sd_s * eps_s
            delta = (w_new - w_s) * smask  # pad slots contribute 0
            # one stacked (2, n) psum per color: dw and dresid deltas
            dz = jnp.zeros((2, n), w.dtype)
            dz = dz.at[0, sites].add(delta)
            # each child j of a color-c site has exactly one parent in c;
            # masked child slots carry b_child = 0
            idx = jnp.concatenate([sites, ci_s.reshape(-1)])
            upd = jnp.concatenate(
                [delta, (-bc_s * delta[:, None]).reshape(-1)]
            )
            dz = dz.at[1, idx].add(upd)
            dz = lax.psum(dz, "sites")
            return (w + dz[0], resid + dz[1]), None

        (w, _), _ = lax.scan(color_pass, (w, resid), xs)
        return w

    return shard_map(
        impl,
        mesh=mesh,
        axis_names=frozenset({"sites"}),
        in_specs=(
            P("sites", None, None),  # csites
            P("sites", None, None),  # csmask
        ) + (P(),) * 10,
        out_specs=P(),
    )

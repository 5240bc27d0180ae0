"""Shared model plumbing: data preparation, the device-resident MCMC driver
(burn-in + thinned collection under ``lax.scan``), and posterior summaries.

The reference keeps the whole MCMC loop inside one C++ method
(``SeqNNGP::sample(N)``, SURVEY.md section 3.2); the TPU analog keeps it
inside one jitted ``lax.scan`` so no host round-trip happens per iteration —
chains vectorize with vmap and shard across devices.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pynngp_tpu.vecchia import make_vecchia_data

__all__ = ["SpatialData", "prepare_spatial_data", "run_mcmc", "run_chains"]


class SpatialData(NamedTuple):
    """Ordered, device-resident data bundle shared by the models."""

    vecchia: object  # VecchiaData
    table: object  # NeighborTable (host)
    y: jax.Array  # (n,) ordered response
    x: Optional[jax.Array]  # (n, p) ordered covariates or None


def prepare_spatial_data(
    coords,
    y,
    m,
    x=None,
    ordering="coordinate",
    distance="euclidean",
    dtype=jnp.float32,
    precompute_distances=True,
):
    coords = np.asarray(coords)
    y = np.asarray(y)
    data, table = make_vecchia_data(
        coords,
        m,
        ordering=ordering,
        distance=distance,
        dtype=dtype,
        precompute_distances=precompute_distances,
    )
    y_ord = jnp.asarray(y[table.order], dtype)
    x_ord = None
    if x is not None:
        x_ord = jnp.asarray(np.asarray(x)[table.order], dtype)
    return SpatialData(data, table, y_ord, x_ord)


def run_mcmc(
    key,
    state,
    step_fn: Callable,
    collect_fn: Callable,
    n_samples: int,
    n_burn: int = 0,
    thin: int = 1,
):
    """Burn-in then collect ``n_samples`` thinned draws, all on device.

    step_fn: (key, state) -> state; collect_fn: state -> pytree of scalars
    (or small arrays) recorded per retained draw.
    """

    def one(state, i):
        return step_fn(jax.random.fold_in(key, i), state), None

    state, _ = lax.scan(one, state, jnp.arange(n_burn))

    def keep(state, i):
        def inner(s, j):
            return step_fn(jax.random.fold_in(key, n_burn + i * thin + j), s), None

        state, _ = lax.scan(inner, state, jnp.arange(thin))
        return state, collect_fn(state)

    state, draws = lax.scan(keep, state, jnp.arange(n_samples))
    return state, draws


def run_chains(
    key,
    init_fn: Callable,
    step_fn: Callable,
    collect_fn: Callable,
    n_chains: int,
    n_samples: int,
    n_burn: int = 0,
    thin: int = 1,
):
    """vmap chains over a leading axis — the data-parallel axis that shards
    across devices (SURVEY.md section 2.1 'chain parallelism')."""
    keys = jax.random.split(key, n_chains + 1)
    init_states = jax.vmap(init_fn)(keys[1:])

    def single(k, s):
        return run_mcmc(k, s, step_fn, collect_fn, n_samples, n_burn, thin)

    chain_keys = jax.vmap(lambda i: jax.random.fold_in(keys[0], i))(
        jnp.arange(n_chains)
    )
    return jax.vmap(single)(chain_keys, init_states)

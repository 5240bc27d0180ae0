"""Multi-host bring-up and cross-host data distribution (SURVEY.md
section 5.8: 'jax.distributed.initialize for multi-host; ICI for
intra-slice, DCN across slices').

The reference is single-process; everything here is new TPU-native design.
On a pod slice each host runs the same program: call
:func:`initialize_distributed` first, build the global (chains, sites) mesh
over ``jax.devices()`` (all hosts), and use
:func:`host_local_to_global` to assemble globally-sharded arrays from
host-local shards (multihost arrays cannot be materialized from one host).

Design notes for the n=500k multi-host run (SPEC config 5):
  - the neighbor table / lane caches are deterministic functions of
    (coords, m): each host builds them identically (cheap via the native
    kd-tree) or builds only its site-block rows;
  - the replicated vectors (y, w) are a few MB — fully replicated on every
    device, so no halo exchange is ever required (SURVEY.md sec 5.7);
  - chain/particle state is sharded over the 'chains' axis; collectives:
    psum (site reduction, SMC weight normalization), all_gather
    (resampling, cross-chain R-hat/ESS pooling).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

__all__ = [
    "initialize_distributed",
    "global_mesh",
    "host_local_to_global",
    "process_chain_slice",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bring up jax.distributed (no-op when single-process or already up).

    On Cloud TPU the arguments are discovered from the environment; pass
    them explicitly for manual clusters."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        # single-process environment (tests, one chip): nothing to do
        pass


def global_mesh(n_chain_shards: int = 1, n_site_shards: Optional[int] = None):
    """(chains, sites) mesh over ALL devices of all hosts.  Lay chains along
    the outer (DCN-crossing) dimension so the per-step psum over 'sites'
    stays on intra-slice ICI."""
    from pynngp_tpu.parallel.sharded import make_mesh

    return make_mesh(n_chain_shards, n_site_shards, devices=jax.devices())


def host_local_to_global(mesh, pspec, host_arrays):
    """Assemble a globally-sharded jax.Array from per-host numpy shards.

    ``host_arrays``: this host's slice of the global array, covering exactly
    the rows its addressable devices own under ``pspec``."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    if jax.process_count() == 1:
        return jax.device_put(host_arrays, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(host_arrays))


def process_chain_slice(n_chains_total: int):
    """Which chains this host owns under pure chain sharding."""
    pc, pi = jax.process_count(), jax.process_index()
    per = n_chains_total // pc
    return slice(pi * per, (pi + 1) * per)

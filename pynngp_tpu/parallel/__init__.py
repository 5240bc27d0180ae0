"""Multi-device / multi-host parallelism: mesh setup, location-sharded
log-likelihood, distributed init and cross-chain collectives (SURVEY.md
sections 2.1, 5.7, 5.8 — all new TPU-native design; the reference is a
single shared-memory process)."""

from pynngp_tpu.parallel.distributed import (
    global_mesh,
    host_local_to_global,
    initialize_distributed,
    process_chain_slice,
)
from pynngp_tpu.parallel.sharded import (
    make_mesh,
    make_sharded_bf,
    make_sharded_chromatic,
    make_sharded_loglik,
    make_sharded_suffstats,
    pad_data_for_sharding,
    shard_color_tables,
    shard_vecchia_data,
)

__all__ = [
    "make_mesh",
    "make_sharded_bf",
    "make_sharded_chromatic",
    "make_sharded_loglik",
    "make_sharded_suffstats",
    "pad_data_for_sharding",
    "shard_color_tables",
    "shard_vecchia_data",
    "initialize_distributed",
    "global_mesh",
    "host_local_to_global",
    "process_chain_slice",
]

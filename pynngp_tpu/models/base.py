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
    across devices (SURVEY.md section 2.1 'chain parallelism').

    Monolithic (single-program) variant: fine on CPU / in tests; for real
    device runs use :func:`run_chains_chunked` (device watchdogs kill
    long-running single executions)."""
    keys = jax.random.split(key, n_chains + 1)
    init_states = jax.vmap(init_fn)(keys[1:])

    def single(k, s):
        return run_mcmc(k, s, step_fn, collect_fn, n_samples, n_burn, thin)

    chain_keys = jax.vmap(lambda i: jax.random.fold_in(keys[0], i))(
        jnp.arange(n_chains)
    )
    return jax.vmap(single)(chain_keys, init_states)


def run_chains_chunked(
    key,
    init_fn: Callable,
    step_fn: Callable,
    collect_fn: Callable,
    n_chains: int,
    n_samples: int,
    n_burn: int = 0,
    thin: int = 1,
    chunk: int = None,
    target_chunk_seconds: float = 12.0,
    progress_fn: Callable = None,
    worst_case_factor_fn: Callable = None,
    checkpoint_path: str = None,
    checkpoint_every: int = 0,
    metrics=None,
    health_fn: Callable = None,
    config=None,
    collect_every: dict = None,
):
    """Host-chunked multi-chain MCMC driver.

    Each device program executes at most ``chunk`` iterations (one
    ``lax.scan`` over a vmap of chains); the sampler state stays on device
    between chunks, so host overhead is one dispatch per chunk.  This bounds
    single-program runtime (device/tunnel watchdogs kill executions over
    ~60 s) and provides natural checkpoints.  ``chunk=None`` measures one
    step and sizes chunks to ~``target_chunk_seconds``; exactly two programs
    are compiled (single step + chunk scan) and reused for every chunk.

    With ``checkpoint_path`` the full chain state (plus progress counters) is
    saved every ``checkpoint_every`` chunks and a run that finds an existing
    checkpoint resumes from it — preemption resilience (SURVEY.md sec 5.3/5.4;
    the reference simply reruns crashed jobs).

    Observability (SURVEY.md sec 5.5): ``metrics`` is a
    utils.metrics.MetricsLogger, or a path (one JSON line per chunk appended
    to that file), or True (lines to stderr); ``health_fn(states) -> dict``
    supplies sampler-specific fields (acceptance, step size, divergences) —
    the models pass a suitable default.  ``config`` (config.NNGPConfig or
    dict) is stored in every checkpoint sidecar, written next to it as
    ``<path>.config.json``, and validated on resume (a changed config
    refuses to reinterpret the state).

    ``collect_every`` maps collect-pytree keys to a keep-every-k stride:
    those keys are sliced ON DEVICE per chunk before any transfer, so a
    large per-draw field (e.g. the latent model's (n,) w surface — 320 MB
    of draws at n=10k x 8 chains x 1000 draws, minutes over a tunneled
    link) costs 1/k of the readback.  Thinned keys come back with
    ~n_samples/k rows; RNG and chain state are untouched, so the kept rows
    are bit-identical to the corresponding rows of an unthinned run.

    Returns (final_states, draws) with draws stacked (n_chains, n_samples).
    """
    import os
    import time

    from pynngp_tpu.utils.metrics import MetricsLogger

    # multi-host: every process runs this driver; persistence is per-process
    # (addressable shards only) and draw collection pulls only local data
    proc = jax.process_index() if jax.process_count() > 1 else None

    if metrics is True:
        metrics = MetricsLogger()
    elif isinstance(metrics, (str, os.PathLike)):
        metrics = MetricsLogger(stream=open(metrics, "a"))

    def _emit(phase, done, total, iters, dt):
        if metrics is None:
            return
        fields = {}
        if health_fn is not None:
            try:
                fields = {
                    k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
                    for k, v in health_fn(states_box[0]).items()
                }
            except Exception:
                pass
        metrics.log(
            phase, done=int(done), total=int(total),
            seconds=round(dt, 3),
            iters_per_sec=round(iters / dt, 3) if dt > 0 else None,
            **fields,
        )

    k_init, k_run = jax.random.split(key)
    init_keys = jax.random.split(k_init, n_chains)
    from pynngp_tpu.utils.jit import jit_bound

    states = jit_bound(jax.vmap(init_fn))(init_keys)

    _suffix = "" if proc is None else f".p{proc}"
    resume_burn, resume_draws, prior_blocks = 0, 0, []
    if checkpoint_path and os.path.exists(
        checkpoint_path + _suffix + ".npz"
    ):
        import json

        from pynngp_tpu.utils.checkpoint import load_state

        with open(checkpoint_path + _suffix + ".json") as fh:
            meta = json.load(fh).get("extra", {})
        states = load_state(
            checkpoint_path, states, config=config, process_index=proc
        )
        resume_burn = int(meta.get("burn_done", 0))
        resume_draws = int(meta.get("draws_done", 0))
        draws_file = checkpoint_path + _suffix + ".draws.npz"
        if resume_draws and os.path.exists(draws_file):
            z = np.load(draws_file, allow_pickle=True)
            prior_blocks = [
                {k: z[k] for k in z.files}
            ]
        if metrics is not None:
            metrics.log(
                "resume", burn_done=resume_burn, draws_done=resume_draws
            )

    def _checkpoint(burn_done, draws_done, collected):
        if not checkpoint_path:
            return
        from pynngp_tpu.utils.checkpoint import save_state

        save_state(
            checkpoint_path, states_box[0],
            extra={"burn_done": int(burn_done), "draws_done": int(draws_done)},
            config=config, process_index=proc,
        )
        if config is not None:
            import dataclasses
            import json

            cfg = (
                dataclasses.asdict(config)
                if dataclasses.is_dataclass(config)
                else dict(config)
            )
            with open(checkpoint_path + ".config.json", "w") as fh:
                json.dump(cfg, fh, indent=2)
        if collected:
            from pynngp_tpu.utils.checkpoint import host_local_array

            merged = jax.tree.map(
                lambda *xs: np.concatenate(
                    [host_local_array(x) for x in xs], axis=0
                ),
                *collected,
            )
            np.savez(checkpoint_path + _suffix + ".draws.npz", **merged)

    states_box = [states]

    def batched_step(states, i):
        ks = jax.vmap(lambda c: jax.random.fold_in(jax.random.fold_in(k_run, i), c))(
            jnp.arange(n_chains)
        )
        return jax.vmap(step_fn)(ks, states)

    if chunk is None:
        one = jit_bound(lambda s: batched_step(s, jnp.zeros((), jnp.int32)))
        states_test = one(states)
        jax.block_until_ready(states_test)  # compile
        # Warm (first post-compile executions pay one-time program-load
        # costs on remote-dispatch platforms), then time a PIPELINE of 16
        # async dispatches: a blocking single-step probe measures the
        # host<->device round-trip (~100 ms on tunneled chips), not the
        # ~0.6 ms device step, and the resulting ~100x-too-small chunks
        # throttled the n=100k MWG bench to ~5% of device speed.
        states_test = one(states_test)
        jax.block_until_ready(states_test)
        t0 = time.time()
        for _ in range(16):
            states_test = one(states_test)
        jax.block_until_ready(states_test)
        dt = max((time.time() - t0) / 16, 1e-5)
        # steps with data-dependent cost (e.g. NUTS tree depth) supply a
        # worst-case/measured cost ratio so no chunk can exceed the budget
        factor = 1.0
        if worst_case_factor_fn is not None:
            factor = float(worst_case_factor_fn(states_test))
        chunk = int(max(1, min(4096, target_chunk_seconds / (dt * factor))))
        # quantize to a power of two: chunk is baked into the compiled
        # burn/draw programs, so probe jitter would otherwise recompile
        # them (~minutes on remote-compile platforms) on every run
        chunk = 1 << (chunk.bit_length() - 1)
        # never run (much) more than the work actually requested
        chunk = min(chunk, max(n_burn, 1), max(n_samples * thin, 1))

    def burn_chunk(states, i0):
        def body(s, j):
            return batched_step(s, i0 + j), None

        states, _ = lax.scan(body, states, jnp.arange(chunk))
        return states

    burn_c = jit_bound(burn_chunk)
    it = resume_burn
    chunks_since_ckpt = 0
    while it < n_burn:
        t_chunk = time.time()
        states = burn_c(states, jnp.asarray(it, jnp.int32))
        if metrics is not None:  # honest per-chunk timing costs one sync
            jax.block_until_ready(states)
        states_box[0] = states
        it += chunk
        chunks_since_ckpt += 1
        if checkpoint_every and chunks_since_ckpt >= checkpoint_every:
            _checkpoint(it, 0, [])
            chunks_since_ckpt = 0
        if progress_fn:
            progress_fn("burn", min(it, n_burn), n_burn)
        _emit("burn", min(it, n_burn), n_burn, chunk, time.time() - t_chunk)
    burn_total = max(it, n_burn)  # may exceed n_burn by < chunk (harmless)

    chunk_draws = max(1, chunk // thin)

    def draw_chunk(states, i0):
        def body(s, j):
            base_i = i0 + j * thin
            # thin is static: UNROLL small thin counts.  A nested lax.scan
            # here re-threads the model's table arguments (jit_bound passes
            # them as parameters, not constants) through the inner while
            # loop, and XLA inserts per-entry copies of those tables —
            # measured 84 vs 1200+ draws/s at n=100k, m=15 on v5e.
            if thin <= 8:
                for t in range(thin):
                    s = batched_step(s, base_i + t)
            else:
                def inner(s2, t):
                    return batched_step(s2, base_i + t), None

                s, _ = lax.scan(inner, s, jnp.arange(thin))
            return s, jax.vmap(collect_fn)(s)

        return lax.scan(body, states, jnp.arange(chunk_draws))

    draw_c = jit_bound(draw_chunk)
    collected = list(prior_blocks)
    got = resume_draws
    while got < n_samples:
        t_chunk = time.time()
        states, block = draw_c(
            states, jnp.asarray(burn_total + got * thin, jnp.int32)
        )
        states_box[0] = states
        if collect_every:
            # device-side stride-slice of the (chunk_draws, chains, ...)
            # block; offset keeps the global draw index i % k == 0 rows
            # regardless of chunk boundaries or resume point
            block = dict(block)
            for key, k in collect_every.items():
                if key in block and k > 1:
                    block[key] = block[key][(-got) % k :: k]
        # keep draw blocks ON DEVICE: a device->host readback over
        # remote-dispatch links costs 0.3-8 s PER ARRAY regardless of size
        # (measured on a tunneled v5e), so per-chunk np.asarray of ~7
        # collect leaves was 90%+ of the n=100k MWG wall clock.  Blocks
        # concatenate on device and transfer once after the loop.
        collected.append(block)
        got += chunk_draws
        chunks_since_ckpt += 1
        if checkpoint_every and chunks_since_ckpt >= checkpoint_every:
            _checkpoint(burn_total, got, collected)
            chunks_since_ckpt = 0
        if progress_fn:
            progress_fn("sample", min(got, n_samples), n_samples)
        _emit(
            "sample", min(got, n_samples), n_samples,
            chunk_draws * thin, time.time() - t_chunk,
        )
    from pynngp_tpu.utils.checkpoint import host_local_array

    def _cat(*xs):
        if isinstance(xs[0], jax.Array):
            if len(xs[0].sharding.device_set) > 1:
                # Assemble MESH-SHARDED draw blocks on host: an eager
                # lax.concatenate over multi-device blocks intermittently
                # SIGABRTs in the XLA:CPU client (captured by
                # tools/crash_hunt.sh on the (2, 4) virtual mesh — the
                # round-4 'Fatal Python error' flake).  Per-block readback
                # is fine here: sharded runs already read host-local
                # shards, and the single-device fast path below is what
                # the tunneled-chip benches use.
                hs = [host_local_array(x) for x in xs]
                return np.concatenate(hs, axis=0) if len(hs) > 1 else hs[0]
            out = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
            return host_local_array(out)  # ONE readback per leaf per run
        return np.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]

    draws = jax.tree.map(_cat, *collected)
    if isinstance(draws, dict):
        _lim = {
            key: -(-n_samples // k)  # ceil: thinned keys keep i % k == 0 rows
            for key, k in (collect_every or {}).items()
        }
        draws = {
            key: jax.tree.map(
                lambda a: np.asarray(a)[: _lim.get(key, n_samples)], sub
            )
            for key, sub in draws.items()
        }
    else:
        draws = jax.tree.map(lambda a: np.asarray(a)[:n_samples], draws)
    # draws axes are (n_draws, n_chains, ...) -> (n_chains, n_draws, ...)
    draws = jax.tree.map(lambda a: np.swapaxes(a, 0, 1), draws)
    return states, draws

"""Two-process checkpoint -> kill -> resume worker (driven by
tests/test_distributed.py::test_two_process_checkpoint_resume).

Phase 1: bring up jax.distributed, build a chain-sharded sampler-state
pytree (4 chains over 2 processes — the chain-DP layout), advance it
deterministically, and save per-process addressable shards
(utils/checkpoint.save_state(process_index=...)).  The process then EXITS —
the kill.

Phase 2 (a fresh coordinator — new port, new processes): rebuild the
sharded template, load this process's shard file back into globally-sharded
arrays (load_state(process_index=...) ->
jax.make_array_from_process_local_data), verify the resumed state is
exactly what phase 1 computed, and advance it again to prove the resumed
state is live.
"""

import os
import sys


def main():
    port, pid, phase, ckpt_dir = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_PLATFORMS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pynngp_tpu.utils.checkpoint import load_state, save_state

    mesh = Mesh(np.array(jax.devices()).reshape(4), ("chains",))
    csh = NamedSharding(mesh, P("chains"))

    def local_init(pid):
        # 2 local chains per process, deterministic content
        base = 10.0 * pid
        u = np.stack([
            np.array([base + c, base + c + 0.5, base + c + 0.25], np.float32)
            for c in range(2)
        ])
        it = np.zeros((2,), np.int32)
        return {"u": u, "iteration": it}

    def to_global(local):
        return {
            "u": jax.make_array_from_process_local_data(csh, local["u"], (4, 3)),
            "iteration": jax.make_array_from_process_local_data(
                csh, local["iteration"], (4,)
            ),
        }

    @jax.jit
    def step(s):
        return {
            "u": s["u"] * 1.5 + 1.0,
            "iteration": s["iteration"] + 1,
        }

    path = os.path.join(ckpt_dir, "dist_ckpt")
    n_steps = 3

    if phase == "save":
        state = to_global(local_init(pid))
        for _ in range(n_steps):
            state = step(state)
        save_state(path, state, extra={"steps": n_steps}, process_index=pid)
        # verify the per-process file holds exactly the local 2 chains
        z = np.load(f"{path}.p{pid}.npz")
        assert z["leaf_1"].shape == (2, 3), z["leaf_1"].shape  # dict order: iteration, u
        print(f"CKPT SAVE OK pid={pid}", flush=True)
        return

    # phase == "resume": fresh processes after the kill
    template = to_global(
        {"u": np.zeros((2, 3), np.float32), "iteration": np.zeros((2,), np.int32)}
    )
    state = load_state(path, template, process_index=pid)
    assert not state["u"].is_fully_addressable  # genuinely multi-host sharded

    # expected: n_steps of the deterministic update applied to this
    # process's initial chains
    want = local_init(pid)
    for _ in range(n_steps):
        want = {"u": want["u"] * 1.5 + 1.0, "iteration": want["iteration"] + 1}
    from pynngp_tpu.utils.checkpoint import host_local_array

    np.testing.assert_allclose(host_local_array(state["u"]), want["u"], rtol=1e-6)
    np.testing.assert_array_equal(
        host_local_array(state["iteration"]), want["iteration"]
    )
    # resumed state is live: one more global step
    state = step(state)
    assert int(host_local_array(state["iteration"])[0]) == n_steps + 1
    print(f"CKPT RESUME OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()

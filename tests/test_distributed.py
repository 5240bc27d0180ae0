"""Real multi-process jax.distributed test (SURVEY.md section 4 distributed
test plan): two CPU processes, localhost coordinator, global 2x4 mesh,
host_local_to_global via make_array_from_process_local_data, sharded
log-lik == single-process, cross-process batch reduction == local sum.

The heavy lifting is in tests/_distributed_worker.py; this test only spawns
and checks the two workers."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(worker)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-3000:]}"
        assert "DIST OK" in out, f"missing OK line:\n{out}\n{err[-2000:]}"


def _run_ckpt_phase(phase: str, ckpt_dir: str, marker: str):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_ckpt_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(worker)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), phase, ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"{phase} worker failed (rc={rc}):\n{out}\n{err[-3000:]}"
        assert marker in out, f"missing {marker}:\n{out}\n{err[-2000:]}"


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    """Multi-host persistence (SURVEY.md section 5.4 'host-sharded saves'):
    two real processes save per-process addressable shards, DIE (fresh
    coordinator), and two new processes reassemble the globally-sharded
    state exactly and keep sampling."""
    _run_ckpt_phase("save", str(tmp_path), "CKPT SAVE OK")
    # both per-process shard files exist after the kill
    assert (tmp_path / "dist_ckpt.p0.npz").exists()
    assert (tmp_path / "dist_ckpt.p1.npz").exists()
    _run_ckpt_phase("resume", str(tmp_path), "CKPT RESUME OK")

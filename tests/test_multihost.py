"""Multi-host (DCN) training integration test.

Launches TWO separate Python processes, each owning 2 virtual CPU
devices, connected through `jax.distributed` (the reference's
DDP/NCCL analog, trainer.py:152-173). The Trainer must build one global
4-device mesh, shard a global batch 4 across both processes' loader
shards, and take real SPMD training steps whose gradient all-reduce
crosses the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_pair(tmp_path, attempt):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    work = os.path.join(str(tmp_path), f"try{attempt}")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), work],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return work, procs, outs


@pytest.mark.slow
def test_two_process_training(tmp_path):
    # The gloo collective-join window is ~30 s while first-run jit
    # compiles can skew by more under host load (this CI box has ONE
    # core); the trainer's coordination barrier absorbs init skew and
    # the persistent compile cache makes a retry's compiles near-
    # instant, so one retry makes the test robust without masking real
    # failures (a correctness bug fails both attempts identically).
    last = None
    for attempt in range(2):
        work, procs, outs = _launch_pair(tmp_path, attempt)
        if all(p.returncode == 0 for p in procs):
            break
        last = outs
    else:
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    assert "MULTIHOST_OK" in outs[0], outs[0][-4000:]
    # rank 0 wrote the checkpoint; rank 1 did not double-write
    import pathlib

    ckpt = pathlib.Path(work) / "ckpts" / "mh_desc" / "001" / "backbone.msgpack"
    assert ckpt.exists()

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


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
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
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    assert "MULTIHOST_OK" in outs[0], outs[0][-4000:]
    # rank 0 wrote the checkpoint; rank 1 did not double-write
    ckpt = tmp_path / "ckpts" / "mh_desc" / "001" / "backbone.msgpack"
    assert ckpt.exists()

"""Worker process for the 2-process multi-host integration test.

Invoked by tests/test_multihost.py as
  python tests/multihost_worker.py <process_id> <num_processes> <port> <workdir>

Each worker owns 2 virtual CPU devices; `multihost` in the train config
wires jax.distributed so the Trainer builds a global 2x2=4-device mesh
and takes one real SPMD stage-1 step across processes (the DDP analog,
reference trainer.py:152-173).
"""

import json
import os
import sys

pid, nproc, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
# the container's axon site-hook selects the TPU programmatically; the
# package knob overrides it (see README "Platform")
os.environ["POSFEAT_PLATFORM"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", "")
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# cross-process CPU collectives
jax.config.update("jax_cpu_collectives_implementation", "gloo")

# initialize the process group BEFORE anything can touch the backend
# (site hooks may eagerly query devices at import time, which would pin
# a single-process backend). Trainer's own config-driven init_multihost
# is idempotent on top of this.
from posfeat_tpu.core.mesh import init_multihost

init_multihost({
    "coordinator_address": f"localhost:{port}",
    "num_processes": nproc,
    "process_id": pid,
})

from test_e2e import _train_config  # reuse the synthetic stage-1 recipe

from posfeat_tpu.train import Trainer

cfg = _train_config(None, "desc")  # tmp_path unused for the desc stage
cfg["checkpoint_name"] = "mh_desc"
cfg["data_config_train"]["batch_size"] = 4  # global batch over 4 devices
cfg["multihost"] = {
    "coordinator_address": f"localhost:{port}",
    "num_processes": nproc,
    "process_id": pid,
}

t = Trainer(cfg, ckpt_root=os.path.join(workdir, "ckpts"))
assert t.num_processes == nproc, t.num_processes
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert t.mesh.devices.size == 2 * nproc
t.train()

if pid == 0:
    mpath = os.path.join(workdir, "ckpts", "mh_desc", "metrics.jsonl")
    with open(mpath) as f:
        recs = [json.loads(line) for line in f]
    assert recs, "no metrics logged"
    import numpy as np

    assert np.isfinite(recs[-1]["total_loss"]), recs[-1]
    print(f"MULTIHOST_OK loss={recs[-1]['total_loss']:.4f}")

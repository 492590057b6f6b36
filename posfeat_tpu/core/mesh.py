"""Device mesh + sharding helpers.

The reference's one parallelism strategy is NCCL data-parallel DDP
(trainer.py:152-173, SURVEY §2.7). The TPU-native equivalent: a 1-D
`data` mesh over all local devices; batches are sharded over it, params
replicated, and XLA SPMD inserts the gradient all-reduce over ICI.
`shard_batch` pads the leading axis when the batch doesn't divide the
mesh (masking is the caller's job — training batches are static-shaped).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_MULTIHOST_INIT = False


def init_multihost(cfg) -> int:
    """`jax.distributed.initialize` from a config block — the DCN analog
    of the reference's `torch.distributed.init_process_group` (reference
    trainer.py:152-173, env:// NCCL). Must run before the first backend
    query.

    cfg keys (all optional — absent keys fall back to jax's own
    auto-detection from the cluster environment, e.g. TPU pod metadata):
      coordinator_address: "host:port" of process 0
      num_processes:       world size
      process_id:          this process's rank
      local_device_ids:    devices this process owns (CPU testing)

    Returns this process's index. Idempotent."""
    global _MULTIHOST_INIT
    if _MULTIHOST_INIT:
        return jax.process_index()
    kwargs = {}
    for key in (
        "coordinator_address", "num_processes", "process_id",
        "local_device_ids",
    ):
        if cfg.get(key) is not None:
            kwargs[key] = cfg[key]
    jax.distributed.initialize(**kwargs)
    _MULTIHOST_INIT = True
    return jax.process_index()


def multihost_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier (pure gRPC — no device collective).

    Used to line processes up before the first SPMD step executes: the
    gloo/ICI collective context has a short join window (~30 s), while
    per-process jit compile times can skew by minutes on loaded or
    heterogeneous hosts. Waiting here instead means the skew is absorbed
    by a generous barrier timeout rather than failing the first
    all-reduce. No-op when jax.distributed isn't initialized."""
    # the coordination-service client lives in a private module whose
    # layout moves across JAX releases (ADVICE r4); degrade to the
    # public device-collective barrier rather than fail startup
    try:
        from jax._src import distributed

        client = getattr(distributed.global_state, "client", None)
    except (ImportError, AttributeError):
        client = None
        if jax.process_count() > 1:
            # executes a psum across processes — heavier than the gRPC
            # barrier (it compiles) but release-stable
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)
            return
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put array leaves with the batch axis sharded over `data`.

    On a multi-process (DCN) mesh each process passes only its LOCAL
    slice of the global batch (the DistributedSampler analog: the
    loader shards indices per process) and the global array is
    assembled from the addressable shards without any cross-host data
    movement."""
    bs = batch_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        if isinstance(x, (str, list, tuple)):
            return x
        x = np.asarray(x)
        if multiproc:
            return jax.make_array_from_process_local_data(bs, x)
        return jax.device_put(x, bs)

    return {k: put(v) for k, v in batch.items()}

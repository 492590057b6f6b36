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


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put array leaves with the batch axis sharded over `data`."""
    bs = batch_sharding(mesh)

    def put(x):
        if isinstance(x, (str, list, tuple)):
            return x
        return jax.device_put(np.asarray(x), bs)

    return {k: put(v) for k, v in batch.items()}

"""Parallelism strategies (TPU-native).

The reference's only strategy is NCCL data-parallel DDP
(reference managers/trainer.py:152-173, SURVEY §2.7). Here:

- data parallelism: 1-D ``data`` mesh, batch sharded, params replicated,
  gradient psum inserted by XLA SPMD (`.mesh`, used by train/trainer.py
  and __graft_entry__.dryrun_multichip);
- spatial parallelism: the image H axis sharded over a ``spatial`` mesh
  for single-image extraction at very high resolution — XLA SPMD
  partitions every conv with halo exchanges over ICI (`.spatial`), the
  TPU-idiomatic analog of the reference's nonexistent "long context"
  axis (SURVEY §5).
"""

from ..core.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicated,
    shard_batch,
)
from .spatial import (  # noqa: F401
    shard_image_spatial,
    spatial_extract,
    spatial_mesh,
)

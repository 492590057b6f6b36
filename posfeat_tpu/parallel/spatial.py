"""Spatial (image-height) sharding for high-resolution extraction.

The reference caps scale by cropping arbitrary-size images to %16 and
running them whole on one GPU (reference datasets/hpatches.py:36-38,
managers/extractor.py:318-355). On TPU the idiomatic way to go past
single-chip memory for >4K inputs (Aachen) is to shard the image's H
axis over a 1-D ``spatial`` mesh and let XLA SPMD partition the conv
stack — halo exchanges for 3×3/7×7 windows ride ICI automatically, and
global reductions (instance-norm statistics, top-k) become collectives.
No model code changes: sharding is induced purely by in/out sharding
annotations on the jitted program (SURVEY §5 "long-context equivalent").

Extraction runs the network in eval mode (frozen BatchNorm running
averages), so there are no cross-device statistics to manage; results
are bitwise-identical to the unsharded program up to XLA reduction
order.

Note: use the XLA head dataflows (fused_upsample True/"phase"/False)
with spatial sharding — the Mosaic fused head (`"pallas"`) is a
single-device kernel and is not SPMD-partitionable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mesh(devices=None) -> Mesh:
    """1-D mesh over the ``spatial`` axis (all local devices by default)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("spatial",))


def shard_image_spatial(im: Any, mesh: Mesh) -> jax.Array:
    """Device-put an NHWC image batch with H sharded over the mesh."""
    return jax.device_put(
        im, NamedSharding(mesh, P(None, "spatial", None, None))
    )


def spatial_extract(
    model,
    mesh: Mesh,
    postprocess: Callable | None = None,
) -> Callable:
    """Build a jitted `(variables, im) -> outputs` extraction step whose
    image input is H-sharded over `mesh` and whose outputs are fully
    replicated.

    `model` is a posfeat_tpu.models.PoSFeat; `postprocess`, if given,
    maps the model's output dict (local_map/local_point/...) to the final
    extraction products (e.g. detector + descriptor sampling) inside the
    same jitted program, so NMS/top-k also run sharded.
    """
    im_sh = NamedSharding(mesh, P(None, "spatial", None, None))
    repl = NamedSharding(mesh, P())

    def fn(variables, im):
        outputs = model.extract(variables, im, train=False)
        if postprocess is not None:
            return postprocess(outputs)
        return outputs

    if postprocess is not None:
        # postprocessed outputs (keypoint slates, descriptors) are small;
        # replicate them for host consumption
        return jax.jit(fn, in_shardings=(repl, im_sh), out_shardings=repl)
    # raw full-resolution maps: let XLA keep them H-sharded — replicating
    # would all-gather them onto every device and reintroduce the
    # single-chip memory footprint this module exists to avoid
    return jax.jit(fn, in_shardings=(repl, im_sh))

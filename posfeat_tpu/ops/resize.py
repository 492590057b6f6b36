"""Bilinear resize with exact torch F.interpolate semantics (NHWC).

The reference mixes align_corners=True (decoder upsampling, DescNet.py:189)
and align_corners=False (detector head, DeteNet.py:109); both are needed
for parity. Implemented as two dense 1-D interpolation matmuls — separable,
MXU-friendly, and numerically exact for both corner conventions.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def _weights_np(in_size: int, out_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        src = np.clip(src, 0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    W = np.zeros((out_size, in_size), np.float32)
    W[np.arange(out_size), i0] += 1 - w1
    W[np.arange(out_size), i1] += w1
    return W


def interpolate_bilinear(
    x: jnp.ndarray, size, align_corners: bool = False
) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, size[0], size[1], C]."""
    out_h, out_w = int(size[0]), int(size[1])
    B, H, W, C = x.shape
    if (out_h, out_w) == (H, W):
        return x
    dt = x.dtype
    Wh = jnp.asarray(_weights_np(H, out_h, align_corners), dt)
    Ww = jnp.asarray(_weights_np(W, out_w, align_corners), dt)
    x = jnp.einsum("oh,bhwc->bowc", Wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", Ww, x, precision=jax.lax.Precision.HIGHEST)
    return x

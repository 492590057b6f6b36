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


def _phase_taps(k: int):
    """Fixed 2-tap filter phases for integer ×k align_corners=False
    upsampling: output i = k*j + r samples source j + (r+0.5)/k - 0.5."""
    taps = []
    for r in range(k):
        off = (r + 0.5) / k - 0.5
        i0 = int(np.floor(off))
        w1 = off - i0
        taps.append((i0, np.float32(1.0 - w1), np.float32(w1)))
    return taps


def _upsample_axis_int(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Exact bilinear ×k along one spatial axis via phase decomposition:
    per output phase, a 2-tap weighted sum of (edge-clamped) shifted
    inputs — pure VPU adds, no matmul, no large intermediate. Matches the
    dense-matrix formulation bit-for-bit (borders: both taps clamp to the
    edge pixel, same as torch's source-index clamping)."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")

    def sl(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + n)
        return xp[tuple(idx)]

    phases = []
    for i0, w0, w1 in _phase_taps(k):
        a = sl(1 + i0)
        b = sl(2 + i0)
        phases.append(a * jnp.asarray(w0, x.dtype) + b * jnp.asarray(w1, x.dtype))
    y = jnp.stack(phases, axis=axis + 1)  # [..., n, k, ...]
    new_shape = list(x.shape)
    new_shape[axis] = n * k
    return y.reshape(new_shape)


def interpolate_bilinear(
    x: jnp.ndarray, size, align_corners: bool = False
) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, size[0], size[1], C]."""
    out_h, out_w = int(size[0]), int(size[1])
    B, H, W, C = x.shape
    if (out_h, out_w) == (H, W):
        return x
    # fast path: integer upscale, align_corners=False (the head's H/4 -> H
    # upsample, DeteNet.py:109 — the hot resize of the extraction program)
    if (
        not align_corners
        and out_h % H == 0
        and out_w % W == 0
        and out_h // H <= 8
        and out_w // W <= 8
    ):
        x = _upsample_axis_int(x, out_h // H, 1)
        return _upsample_axis_int(x, out_w // W, 2)
    dt = x.dtype
    Wh = jnp.asarray(_weights_np(H, out_h, align_corners), dt)
    Ww = jnp.asarray(_weights_np(W, out_w, align_corners), dt)
    x = jnp.einsum("oh,bhwc->bowc", Wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", Ww, x, precision=jax.lax.Precision.HIGHEST)
    return x

"""Stride-1/stride-k window pooling helpers (NHWC) used across the op library.

Thin wrappers over lax.reduce_window so every caller shares one fused,
TPU-friendly formulation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def avg_pool2d(x: jnp.ndarray, window: int, stride: int = 1) -> jnp.ndarray:
    """Valid (unpadded) average pooling. x: [..., H, W, C]."""
    n = x.ndim
    dims = [1] * n
    strides = [1] * n
    dims[n - 3], dims[n - 2] = window, window
    strides[n - 3], strides[n - 2] = stride, stride
    s = lax.reduce_window(x, 0.0, lax.add, tuple(dims), tuple(strides), "VALID")
    return s / (window * window)


def max_pool2d(x: jnp.ndarray, window: int, stride: int = 1) -> jnp.ndarray:
    """Valid (unpadded) max pooling. x: [..., H, W, C]."""
    n = x.ndim
    dims = [1] * n
    strides = [1] * n
    dims[n - 3], dims[n - 2] = window, window
    strides[n - 3], strides[n - 2] = stride, stride
    return lax.reduce_window(
        x, -jnp.inf, lax.max, tuple(dims), tuple(strides), "VALID"
    )


def pad2d(x: jnp.ndarray, pad, mode: str = "constant", value: float = 0.0):
    """Pad H and W of [..., H, W, C]. pad = (left, right, top, bottom)."""
    l, r, t, b = pad
    n = x.ndim
    widths = [(0, 0)] * n
    widths[n - 3] = (t, b)
    widths[n - 2] = (l, r)
    if mode == "constant":
        return jnp.pad(x, widths, mode="constant", constant_values=value)
    return jnp.pad(x, widths, mode=mode)

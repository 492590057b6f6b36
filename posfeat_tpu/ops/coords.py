"""Coordinate transforms between pixel indices and normalized [-1, 1] space.

Semantics match the reference convention (preprocess_utils.py:9-38,84-87):
normalization is centered at (size-1)/2 so pixel 0 maps to -1 and pixel
(size-1) maps to +1 ("align_corners=True"-style normalization), even though
feature sampling itself uses align_corners=False — this asymmetry is
load-bearing for numeric parity and is preserved.

Coordinates are always (x, y) pairs in the trailing dimension.
"""

from __future__ import annotations

import jax.numpy as jnp


def homogenize(coord: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the trailing coordinate dim: [..., 2] -> [..., 3]."""
    return jnp.concatenate([coord, jnp.ones_like(coord[..., :1])], axis=-1)


def _center(h: int, w: int, dtype) -> jnp.ndarray:
    return jnp.array([(w - 1) / 2.0, (h - 1) / 2.0], dtype=dtype)


def normalize_coords(coord: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Pixel indices -> [-1, 1]. coord: [..., 2] (x, y)."""
    c = _center(h, w, coord.dtype)
    return (coord - c) / c


def denormalize_coords(coord_n: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[-1, 1] -> pixel indices. coord_n: [..., 2] (x, y)."""
    c = _center(h, w, coord_n.dtype)
    return coord_n * c + c


def gen_grid(
    h_min: float,
    h_max: float,
    w_min: float,
    w_max: float,
    len_h: int,
    len_w: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Row-major (x, y) coordinate grid, shape [len_h*len_w, 2].

    Entry r*len_w + c is (linspace_w[c], linspace_h[r]) — matches the
    reference gen_grid (preprocess_utils.py:84-87).
    """
    ys = jnp.linspace(h_min, h_max, len_h, dtype=dtype)
    xs = jnp.linspace(w_min, w_max, len_w, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1).reshape(-1, 2)

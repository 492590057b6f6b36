"""Bilinear feature sampling at normalized coordinates (NHWC).

Numerically matches torch.nn.functional.grid_sample with
align_corners=False for padding modes 'zeros' and 'border'
(reference call sites: preprocess_utils.py:48,673,737,649).

Implemented as a gather-based XLA formulation: 4 corner gathers fused by
XLA into one kernel; on TPU the gathers vectorize over the lane dimension
(C), which is the layout this module's NHWC convention targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=False: -1 -> -0.5, +1 -> size - 0.5
    return ((coord + 1.0) * size - 1.0) / 2.0


def _sample_one(img: jnp.ndarray, pts: jnp.ndarray, padding_mode: str) -> jnp.ndarray:
    """img: [H, W, C]; pts: [N, 2] normalized (x, y) -> [N, C]."""
    H, W, _ = img.shape
    ix = _unnormalize(pts[:, 0], W)
    iy = _unnormalize(pts[:, 1], H)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1.0)
        iy = jnp.clip(iy, 0.0, H - 1.0)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xc, yc, wx, wy):
        xi = xc.astype(jnp.int32)
        yi = yc.astype(jnp.int32)
        if padding_mode == "zeros":
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            w = jnp.where(inb, wx * wy, 0.0)
        else:  # border: indices may only exceed by the zero-weight corner
            w = wx * wy
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        vals = img[yi, xi]  # [N, C] gather
        return vals * w[:, None].astype(img.dtype)

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out


def grid_sample(
    image: jnp.ndarray, grid: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """Sample image [B, H, W, C] at grid [B, ..., 2] -> [B, ..., C].

    Grid holds normalized (x, y) with torch align_corners=False semantics.
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    lead = grid.shape[1:-1]
    B = image.shape[0]
    flat = grid.reshape(B, -1, 2)
    out = jax.vmap(_sample_one, in_axes=(0, 0, None))(image, flat, padding_mode)
    return out.reshape((B,) + lead + (image.shape[-1],))


def sample_feat_by_coord(
    x: jnp.ndarray, coord_n: jnp.ndarray, norm: bool = False
) -> jnp.ndarray:
    """Sample descriptors at normalized points (reference putils:40-53).

    :param x: feature map [B, H, W, C]
    :param coord_n: normalized coords [B, N, 2]
    :param norm: L2-normalize sampled descriptors over channels
    :return: [B, N, C]
    """
    feat = grid_sample(x, coord_n, padding_mode="zeros")
    if norm:
        feat = feat / jnp.clip(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12, None
        )
    return feat


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2) parity: denominator clamped at eps."""
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps, None)

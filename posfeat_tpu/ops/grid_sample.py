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


def _sample_one(
    img: jnp.ndarray, pts: jnp.ndarray, padding_mode: str, lerp32: bool = False
) -> jnp.ndarray:
    """img: [H, W, C]; pts: [N, 2] normalized (x, y) -> [N, C].

    lerp32: gather corner values in the map's dtype (bf16 gathers move
    half the HBM bytes) but accumulate the bilinear lerp in f32 —
    removes the interpolation rounding from the bf16 fast path at no
    gather-bandwidth cost. Output is f32 when set.
    """
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
    acc_dt = jnp.float32 if lerp32 else img.dtype

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
        vals = img[yi, xi].astype(acc_dt)  # [N, C] gather
        return vals * w[:, None].astype(acc_dt)

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out


def _sample_one_pair(
    img: jnp.ndarray, pts: jnp.ndarray, lerp32: bool = False
) -> jnp.ndarray:
    """Pair-gather bilinear sampling, 'zeros' padding ([H, W, C], [N, 2]).

    The two x-adjacent corners of each bilinear footprint are contiguous
    in a row-major [H*W, C] view, so the 4 single-row gathers of the
    reference formulation collapse into 2 gathers of (2, C) slices —
    same bytes from HBM, half the random-access descriptors (the TPU
    gather cost is dominated by per-index row fetches). Out-of-bounds
    corners read a clamped/wrapped row but carry zero weight, matching
    torch grid_sample(padding_mode='zeros'); the lerp is factored
    (x first, then y), algebraically identical to the 4-corner sum but
    rounded differently at the last ulp in low precision.
    """
    H, W, C = img.shape
    ix = _unnormalize(pts[:, 0], W)
    iy = _unnormalize(pts[:, 1], H)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = (ix - x0).astype(jnp.float32)
    wy1 = (iy - y0).astype(jnp.float32)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    acc_dt = jnp.float32 if lerp32 else img.dtype

    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    # per-corner zero weights for out-of-bounds reads
    vx0 = (xi >= 0) & (xi < W)
    vx1 = (xi + 1 >= 0) & (xi + 1 < W)

    def vy(y):
        return (y >= 0) & (y < H)

    # one zero row on both ends so every flattened pair start lands
    # in-bounds without clamping (clamping would shift which pixel each
    # slice element refers to); OOB corners then read zero/wrapped rows
    # that carry zero weight
    flat = jnp.concatenate(
        [jnp.zeros((1, C), img.dtype), img.reshape(H * W, C),
         jnp.zeros((1, C), img.dtype)]
    )

    def pair(yrow, valid_y):
        # rows r, r+1 of the flattened map: one gather of (2, C) slices
        r = 1 + yrow * W + jnp.clip(xi, -1, W - 1)  # [0, H*W]
        v = jax.lax.gather(
            flat,
            r[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [N, 2, C]
        w0 = jnp.where(valid_y & vx0, wx0, 0.0)
        w1 = jnp.where(valid_y & vx1, wx1, 0.0)
        return (
            v[:, 0].astype(acc_dt) * w0[:, None].astype(acc_dt)
            + v[:, 1].astype(acc_dt) * w1[:, None].astype(acc_dt)
        )

    top = pair(jnp.clip(yi, 0, H - 1), vy(yi))
    bot = pair(jnp.clip(yi + 1, 0, H - 1), vy(yi + 1))
    return (
        top * wy0[:, None].astype(acc_dt)
        + bot * wy1[:, None].astype(acc_dt)
    )


def _sample_one_quad(
    img: jnp.ndarray, pts: jnp.ndarray, lerp32: bool = False
) -> jnp.ndarray:
    """All-4-corner single-gather bilinear sampling ('zeros' padding).

    Extends the pair trick one level: a row-pair map `map2[p] =
    concat(flat[p], flat[p+W])` puts BOTH y-rows of a bilinear footprint
    in one 2C-wide row, so the whole 4-corner fetch is ONE gather of
    (2, 2C) slices — half the random-access rows of 'pair' (the TPU
    gather cost is per fetched row, 0.108 ms/img each at the 480x640
    8192-pt operating point, r4 trace) for one cheap dense concat
    (~2x map bytes, sequential bandwidth). Values are identical to
    'pair' up to the same factored-lerp rounding.
    """
    H, W, C = img.shape
    ix = _unnormalize(pts[:, 0], W)
    iy = _unnormalize(pts[:, 1], H)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = (ix - x0).astype(jnp.float32)
    wy1 = (iy - y0).astype(jnp.float32)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    acc_dt = jnp.float32 if lerp32 else img.dtype

    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    vx0 = (xi >= 0) & (xi < W)
    vx1 = (xi + 1 >= 0) & (xi + 1 < W)
    vy0 = (yi >= 0) & (yi < H)
    vy1 = (yi + 1 >= 0) & (yi + 1 < H)

    flat = img.reshape(H * W, C)
    # aug rows: [W zero rows][flat][2W zero rows]; map2[i] pairs aug[i]
    # (row y0, for base index i=(y0+1)*W+x) with aug[i+W] (row y0+1) —
    # the leading zero-block makes y0=-1 legal, the trailing one makes
    # y0=H-1's bottom half read zeros (both carry zero weight)
    z = jnp.zeros((W, C), img.dtype)
    aug = jnp.concatenate([z, flat, z, z])
    n2 = H * W + W
    map2 = jnp.concatenate([aug[:n2], aug[W : n2 + W]], axis=1)  # [n2, 2C]
    # one zero row on both ends so every pair start lands in-bounds
    # without clamping (same device as 'pair'); wrapped/zero reads carry
    # zero weight
    zr = jnp.zeros((1, 2 * C), img.dtype)
    map2 = jnp.concatenate([zr, map2, zr])

    r = 1 + (jnp.clip(yi, -1, H - 1) + 1) * W + jnp.clip(xi, -1, W - 1)
    v = jax.lax.gather(
        map2,
        r[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(),
            start_index_map=(0,),
        ),
        slice_sizes=(2, 2 * C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [N, 2, 2C]: [:, xpair, ytop|ybot]
    w00 = jnp.where(vy0 & vx0, wx0 * wy0, 0.0)[:, None].astype(acc_dt)
    w01 = jnp.where(vy0 & vx1, wx1 * wy0, 0.0)[:, None].astype(acc_dt)
    w10 = jnp.where(vy1 & vx0, wx0 * wy1, 0.0)[:, None].astype(acc_dt)
    w11 = jnp.where(vy1 & vx1, wx1 * wy1, 0.0)[:, None].astype(acc_dt)
    return (
        v[:, 0, :C].astype(acc_dt) * w00
        + v[:, 1, :C].astype(acc_dt) * w01
        + v[:, 0, C:].astype(acc_dt) * w10
        + v[:, 1, C:].astype(acc_dt) * w11
    )


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    impl: str = "corner",
    lerp32: bool = False,
) -> jnp.ndarray:
    """Sample image [B, H, W, C] at grid [B, ..., 2] -> [B, ..., C].

    Grid holds normalized (x, y) with torch align_corners=False semantics.
    impl='pair' (zeros padding only) gathers x-adjacent corner pairs as
    (2, C) slices — fewer random-access rows on TPU, identical values.
    lerp32: accumulate the lerp in f32 (bf16 corners gathered as-is).
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    lead = grid.shape[1:-1]
    B = image.shape[0]
    flat = grid.reshape(B, -1, 2)
    if impl == "quad":
        assert padding_mode == "zeros", "quad impl implements zeros padding"
        out = jax.vmap(_sample_one_quad, in_axes=(0, 0, None))(
            image, flat, lerp32
        )
    elif impl == "pair":
        assert padding_mode == "zeros", "pair impl implements zeros padding"
        out = jax.vmap(_sample_one_pair, in_axes=(0, 0, None))(
            image, flat, lerp32
        )
    else:
        out = jax.vmap(_sample_one, in_axes=(0, 0, None, None))(
            image, flat, padding_mode, lerp32
        )
    return out.reshape((B,) + lead + (image.shape[-1],))


def sample_feat_by_coord(
    x: jnp.ndarray, coord_n: jnp.ndarray, norm: bool = False
) -> jnp.ndarray:
    """Sample descriptors at normalized points (reference putils:40-53).

    :param x: feature map [B, H, W, C]
    :param coord_n: normalized coords [B, N, 2]
    :param norm: L2-normalize sampled descriptors over channels
    :return: [B, N, C]

    POSFEAT_SAMPLE_IMPL=pair selects the pair-gather formulation
    (read at trace time; identical values, fewer random-access rows).
    """
    import os

    impl = os.environ.get("POSFEAT_SAMPLE_IMPL", "corner")
    # POSFEAT_SAMPLE_F32 (default on): gather bf16 corners but lerp and
    # L2-normalize in f32 — the gathers move the same (bf16) bytes, the
    # cast happens on the gathered [N, C] slates inside the gather's
    # consumer fusion, and the descriptor slate leaves here f32 (the
    # npz contract is f32 anyway). On the trained probe this removes
    # ~60% of the bf16 fast path's MMA delta (-0.0177 -> -0.0069).
    lerp32 = (
        os.environ.get("POSFEAT_SAMPLE_F32", "1") == "1"
        and x.dtype != jnp.float32
    )
    feat = grid_sample(x, coord_n, padding_mode="zeros", impl=impl, lerp32=lerp32)
    if norm:
        feat = feat / jnp.clip(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12, None
        )
    return feat


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2) parity: denominator clamped at eps."""
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps, None)

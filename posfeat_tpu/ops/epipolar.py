"""Epipolar geometry ops: point-to-line costs, line/image intersection,
line-probe correspondence search, windowed soft-argmax refinement.

Reference: losses/epipolarloss.py:16-22, preprocess_utils.py:490-520,
661-758. Pixel coordinates are (x, y); fundamental matrices are [B, 3, 3]
mapping image-1 points to image-2 epipolar lines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import homogenize, normalize_coords, gen_grid
from .correlation import compute_prob
from .grid_sample import grid_sample


def epipolar_cost(
    coord1: jnp.ndarray, coord2: jnp.ndarray, fmatrix: jnp.ndarray
) -> jnp.ndarray:
    """|distance of coord2 to the epipolar line of coord1| (epipolarloss.py:16).

    coord1, coord2: [B, n, 2] pixel coords; fmatrix: [B, 3, 3] -> [B, n].
    """
    coord1_h = homogenize(coord1).transpose(0, 2, 1)  # [B, 3, n]
    coord2_h = homogenize(coord2).transpose(0, 2, 1)
    line = jnp.matmul(fmatrix, coord1_h, precision=jax.lax.Precision.HIGHEST)
    line = line / jnp.clip(
        jnp.linalg.norm(line[:, :2, :], axis=1, keepdims=True), 1e-8, None
    )
    return jnp.abs(jnp.sum(coord2_h * line, axis=1))


def epipolar_pairwise_dist(
    coord1: jnp.ndarray, coord2: jnp.ndarray, fmatrix: jnp.ndarray
) -> jnp.ndarray:
    """All-pairs point-to-epipolar-line distance (kploss.py:58-61).

    coord1: [B, m, 2], coord2: [B, n, 2] -> [B, m, n]: distance of each
    coord2 point to the epipolar line of each coord1 point.
    """
    coord1_h = homogenize(coord1).transpose(0, 2, 1)  # [B, 3, m]
    coord2_h = homogenize(coord2).transpose(0, 2, 1)  # [B, 3, n]
    line = jnp.matmul(fmatrix, coord1_h, precision=jax.lax.Precision.HIGHEST)  # [B, 3, m]
    line = line / jnp.clip(
        jnp.linalg.norm(line[:, :2, :], axis=1, keepdims=True), 1e-8, None
    )
    return jnp.abs(
        jax.lax.dot_general(
            line.transpose(0, 2, 1),
            coord2_h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )


def _line_border_candidates(epipolar_line: jnp.ndarray, h: int, w: int):
    """Intersections of [B, 3, n] lines with the 4 image borders.

    Returns points [B, n, 4, 2] (left, right, up, bottom) and the
    in-bounds candidate mask [B, n, 4] with the reference's invalid-line
    fix-up applied, plus valid [B, n] (exactly-two-crossings test).
    """
    a = epipolar_line[:, 0, :]
    b = epipolar_line[:, 1, :]
    c = epipolar_line[:, 2, :]
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    point_l = jnp.stack([zeros, -c / b], -1)
    point_r = jnp.stack([(w - 1) * ones, -(a * (w - 1) + c) / b], -1)
    point_u = jnp.stack([-(b * (h - 1) + c) / a, (h - 1) * ones], -1)
    point_b = jnp.stack([-c / a, zeros], -1)
    points = jnp.stack([point_l, point_r, point_u, point_b], axis=2)  # [B,n,4,2]
    mask = (
        (points[..., 0] >= 0)
        & (points[..., 0] <= w - 1)
        & (points[..., 1] >= 0)
        & (points[..., 1] <= h - 1)
    )
    valid = jnp.sum(mask, axis=-1) == 2
    fallback = jnp.array([True, True, False, False])
    mask = jnp.where(valid[..., None], mask, fallback[None, None, :])
    return points, mask, valid


def _first_two(points: jnp.ndarray, mask: jnp.ndarray):
    """Select the first two mask-True candidates (stable order l,r,u,b)."""
    order = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    first = (mask & (order == 1)).astype(points.dtype)[..., None]
    second = (mask & (order == 2)).astype(points.dtype)[..., None]
    # NaN/inf coords of masked-out candidates must not poison the sum.
    safe = jnp.where(jnp.isfinite(points), points, 0.0)
    return jnp.sum(first * safe, axis=2), jnp.sum(second * safe, axis=2)


def get_endpoints(coords: jnp.ndarray, fmat: jnp.ndarray, h: int, w: int):
    """Epipolar line ∩ image border (putils:696-719).

    coords: [B, n, 2] pixel coords in image 1; h, w: image-2 size.
    Returns normalized endpoints [B, n, 2] x2 and valid [B, n].
    """
    coord_h = homogenize(coords).transpose(0, 2, 1)
    line = jnp.matmul(fmat, coord_h, precision=jax.lax.Precision.HIGHEST)  # [B, 3, n]
    points, mask, valid = _line_border_candidates(line, h, w)
    p1, p2 = _first_two(points, mask)
    return normalize_coords(p1, h, w), normalize_coords(p2, h, w), valid


def valid_points(
    epipolar_line: jnp.ndarray, im_size, linelen_thr: float
) -> jnp.ndarray:
    """Validity of precomputed [B, 3, n] epipolar lines (putils:490-520)."""
    h, w = im_size
    points, mask, valid = _line_border_candidates(epipolar_line, h, w)
    p1, p2 = _first_two(points, mask)
    e1 = normalize_coords(p1, h, w)
    e2 = normalize_coords(p2, h, w)
    line_len = e2 - e1
    len_mask = jnp.sqrt(jnp.sum(line_len**2, axis=-1)) > linelen_thr
    return valid & len_mask


def epipolar_line_search(
    coord: jnp.ndarray,
    fmat: jnp.ndarray,
    feat1: jnp.ndarray,
    featmap2: jnp.ndarray,
    h: int,
    w: int,
    *,
    key: jax.Array = None,
    line_step: int = 100,
    use_nn: bool = True,
    loc_rand: bool = True,
    window_size: float = 0.125,
):
    """Probe descriptors along each query's epipolar line (putils:661-694).

    :param coord: [B, n, 2] pixel coords in image 1
    :param feat1: [B, n, d] query descriptors
    :param featmap2: [B, H2, W2, d] reference map (already scaled/normalized
        by the caller, matching the reference's temperature*F.normalize)
    :param h, w: image-2 pixel size
    :param key: PRNG key for loc_rand jitter
    :return: (expected_coord [B,n,2], expected_coord_org, valid [B,n], std [B,n])

    The whole search runs under stop_gradient (reference @torch.no_grad).
    """
    def _search(coord, fmat, feat1, featmap2):
        B, n, d = feat1.shape
        e1, e2, valid = get_endpoints(coord, fmat, h, w)
        ts = jnp.linspace(0.0, 1.0, line_step, dtype=coord.dtype)
        sg = jnp.stack([ts, ts], -1)  # [step, 2]
        line_len = e2 - e1
        grids = line_len[:, :, None, :] * sg[None, None] + e1[:, :, None, :]

        samples = grid_sample(featmap2, grids, padding_mode="border")  # [B,n,step,d]
        prob = compute_prob(
            feat1.reshape(B * n, 1, d), samples.reshape(B * n, line_step, d)
        ).reshape(B, n, line_step)

        if use_nn:
            m = (prob == prob.max(axis=-1, keepdims=True)).astype(grids.dtype)
            expected = jnp.sum(m[..., None] * grids, axis=2)
        else:
            expected = jnp.sum(prob[..., None] * grids, axis=2)

        expected_org = expected
        if loc_rand:
            assert key is not None, "loc_rand requires a PRNG key"
            jitter = 0.707 * window_size * (
                2 * jax.random.uniform(key, expected.shape, expected.dtype) - 1
            )
            expected = expected + jitter
        border_ok = (
            (expected[..., 0] >= -1)
            & (expected[..., 0] <= 1)
            & (expected[..., 1] >= -1)
            & (expected[..., 1] <= 1)
        )
        valid = valid & border_ok

        var = jnp.sum(grids**2 * prob[..., None], axis=2) - expected**2
        std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10, None)), axis=-1)
        return expected, expected_org, valid, std

    return jax.tree.map(
        jax.lax.stop_gradient, _search(coord, fmat, feat1, featmap2)
    )


def get_expected_correspondence_within_window(
    feat1: jnp.ndarray,
    featmap2: jnp.ndarray,
    coord2_n: jnp.ndarray,
    window_size: float,
    with_std: bool = False,
    with_sim: bool = False,
):
    """Windowed soft-argmax around a center estimate (putils:721-758).

    :param feat1: [B, n, d] query descriptors
    :param featmap2: [B, H2, W2, d] (temperature-scaled/normalized by caller)
    :param coord2_n: [B, n, 2] normalized window centers
    :return: (expected [B,n,2], window grid [B,n,K,2][, std [B,n], prob]
              [, sim [B,n,wh,ww]])
    """
    B, h2, w2, d = featmap2.shape
    n = coord2_n.shape[1]
    wh, ww = int(window_size * h2), int(window_size * w2)
    grid_n = gen_grid(
        -window_size, window_size, -window_size, window_size, wh, ww,
        dtype=coord2_n.dtype,
    )  # [K, 2]
    coord_grid = coord2_n[:, :, None, :] + grid_n[None, None]  # [B, n, K, 2]
    feat2_win = grid_sample(featmap2, coord_grid, padding_mode="zeros")

    K = wh * ww
    prob, sim = compute_prob(
        feat1.reshape(B * n, 1, d), feat2_win.reshape(B * n, K, d), return_sim=True
    )
    prob = prob.reshape(B, n, K)

    expected = jnp.sum(coord_grid * prob[..., None], axis=2)

    out = [expected, coord_grid]
    if with_std:
        var = jnp.sum(coord_grid**2 * prob[..., None], axis=2) - expected**2
        std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10, None)), axis=-1)
        out += [std, prob]
    if with_sim:
        out.append(sim.reshape(B, n, wh, ww))
    return tuple(out)

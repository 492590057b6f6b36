"""Exact and soft non-maximum suppression on score maps (NHWC).

`nms` reproduces the reference's index-based formulation
(preprocess_utils.py:449-464): the score map is reflect-padded by the
radius, and a pixel survives iff it is *the argmax of its own window*
under max_pool2d-with-indices tie-breaking (first maximal element in
row-major scan order of the padded image). This differs from the naive
`score == window_max` test exactly on ties, which the reference relies on
to never emit two adjacent equal-score keypoints.

Implemented as a static unrolled shift-scan: O(window²) fused elementwise
updates over [B, H, W] arrays — no gather, no sort, VPU-only.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pooling import avg_pool2d, pad2d


def nms(score: jnp.ndarray, patch_radius: int) -> jnp.ndarray:
    """score: [B, H, W, 1] -> bool mask [B, H, W, 1]."""
    r = patch_radius
    B, H, W, C = score.shape
    assert C == 1
    s = score[..., 0]  # [B, H, W]
    sp = jnp.pad(s, ((0, 0), (r, r), (r, r)), mode="reflect")
    Hp, Wp = H + 2 * r, W + 2 * r

    # linear index of every padded position (matches reference coords array)
    lin = jnp.arange(Hp * Wp, dtype=jnp.int32).reshape(1, Hp, Wp)

    best_val = jnp.full((B, H, W), -jnp.inf, dtype=s.dtype)
    best_idx = jnp.full((B, H, W), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            v = sp[:, dy : dy + H, dx : dx + W]
            li = lin[:, dy : dy + H, dx : dx + W]
            better = (v > best_val) | ((v == best_val) & (li < best_idx))
            best_val = jnp.where(better, v, best_val)
            best_idx = jnp.where(better, li, best_idx)

    center = lin[:, r : r + H, r : r + W]
    mask = best_idx == center
    return mask[..., None]


def soft_nms(score: jnp.ndarray, patch_radius: int) -> jnp.ndarray:
    """softplus(score - local mean) (reference putils:431-447).

    score: [B, H, W, 1] -> [B, H, W, 1]. Gradient is stopped, matching the
    reference's .detach().
    """
    import jax

    window = 2 * patch_radius + 1
    s = jax.lax.stop_gradient(score)
    local_mean = avg_pool2d(
        pad2d(s, (patch_radius,) * 4, mode="reflect"), window, stride=1
    )
    return jax.nn.softplus(s - local_mean)

"""Fused Line2Window engine: window stage matches the reference op
exactly; line stage picks in-band, on-image maxima."""

import numpy as np
import jax
import jax.numpy as jnp

from posfeat_tpu.ops.epipolar import get_expected_correspondence_within_window
from posfeat_tpu.ops.grid_sample import l2_normalize
from posfeat_tpu.ops.line_window import (
    fused_line_window,
    window_expectation_fused,
)
from tests.test_ops_parity import rand_fundamental


def test_window_fused_matches_reference(rng):
    B, Hf, Wf, D, N = 2, 24, 32, 16, 33
    fm = 30.0 * l2_normalize(
        jnp.asarray(rng.randn(B, Hf, Wf, D).astype(np.float32)), -1
    )
    f1 = l2_normalize(jnp.asarray(rng.randn(B, N, D).astype(np.float32)), -1)
    centers = jnp.asarray((rng.rand(B, N, 2) * 2.2 - 1.1).astype(np.float32))
    ws = 0.25  # wh=6, ww=8

    ref_exp, _, ref_std, _ = get_expected_correspondence_within_window(
        f1, fm, centers, ws, with_std=True
    )
    exp, std = window_expectation_fused(fm, f1, centers, ws, chunk=8)
    np.testing.assert_allclose(np.asarray(exp), np.asarray(ref_exp), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(std), np.asarray(ref_std), rtol=1e-3, atol=1e-4)


def test_window_fused_grads_match(rng):
    B, Hf, Wf, D, N = 1, 16, 16, 8, 9
    fm = jnp.asarray(rng.randn(B, Hf, Wf, D).astype(np.float32))
    f1 = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    centers = jnp.asarray((rng.rand(B, N, 2) * 1.2 - 0.6).astype(np.float32))
    ws = 0.25

    def loss_ref(fm, f1):
        e, _, s, _ = get_expected_correspondence_within_window(
            f1, fm, centers, ws, with_std=True
        )
        return jnp.sum(e**2) + jnp.sum(s)

    def loss_fused(fm, f1):
        e, s = window_expectation_fused(fm, f1, centers, ws, chunk=4)
        return jnp.sum(e**2) + jnp.sum(s)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(fm, f1)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(fm, f1)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_line_window_centers_on_line(rng):
    B, Hf, Wf, D, N = 2, 30, 40, 16, 25
    h_img, w_img = 4 * Hf, 4 * Wf
    fm = 30.0 * l2_normalize(
        jnp.asarray(rng.randn(B, Hf, Wf, D).astype(np.float32)), -1
    )
    f1 = l2_normalize(jnp.asarray(rng.randn(B, N, D).astype(np.float32)), -1)
    coord1 = jnp.asarray(
        (rng.rand(B, N, 2) * [w_img - 1, h_img - 1]).astype(np.float32)
    )
    Fm = jnp.asarray(rand_fundamental(rng, B))

    centers, centers_org, valid, win_exp, win_std = fused_line_window(
        fm, f1, coord1, Fm, h_img, w_img,
        key=jax.random.PRNGKey(0), window_size=0.2, use_nn=True,
        loc_rand=False, chunk=8,
    )
    centers = np.asarray(centers_org)
    valid = np.asarray(valid)

    # every valid center is inside the image and near its epipolar line
    assert valid.any()
    c = np.asarray(coord1)
    F = np.asarray(Fm)
    for bi in range(B):
        for ni in range(N):
            if not valid[bi, ni]:
                continue
            assert -1 <= centers[bi, ni, 0] <= 1
            assert -1 <= centers[bi, ni, 1] <= 1
            # distance in image px to the epipolar line
            x = centers[bi, ni, 0] * (w_img - 1) / 2 + (w_img - 1) / 2
            y = centers[bi, ni, 1] * (h_img - 1) / 2 + (h_img - 1) / 2
            line = F[bi] @ np.array([c[bi, ni, 0], c[bi, ni, 1], 1.0])
            d = abs(line @ np.array([x, y, 1.0])) / np.linalg.norm(line[:2])
            # band is +-0.71 featmap px = +-~3 image px (4x downsample)
            assert d < 4.0, (bi, ni, d)

    # window expectation stays within the window of the center
    w = np.asarray(win_exp) - np.asarray(fused_line_window(
        fm, f1, coord1, Fm, h_img, w_img,
        key=jax.random.PRNGKey(0), window_size=0.2, use_nn=True,
        loc_rand=False, chunk=8,
    )[0])
    assert np.abs(w[valid]).max() <= 0.2 * 1.05

"""Pallas fused head tail (interpret mode) vs the reference XLA dataflow."""

import numpy as np
import jax
import jax.numpy as jnp

from posfeat_tpu.ops.pallas.fused_head import fused_head_tail
from posfeat_tpu.ops.resize import interpolate_bilinear
from posfeat_tpu.models.keypoint_det import instance_norm


def reference_tail(trunk, z_img, k2t, b2, w3, b3, a, act="Softplus"):
    H, W = z_img.shape[1:3]
    xu = interpolate_bilinear(trunk, (H, W), align_corners=False)
    z = jax.lax.conv_general_dilated(
        xu, k2t, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + z_img + b2
    x = instance_norm(z)
    x = jnp.where(x >= 0, x, a * x)
    u = jax.lax.conv_general_dilated(
        x, w3, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b3
    xn = instance_norm(u)
    return jax.nn.softplus(xn) if act == "Softplus" else jax.nn.sigmoid(xn)


def _setup(rng, B=2, h=12, w=16, cin=24, cout=32, out=2):
    trunk = jnp.asarray(rng.randn(B, h, w, cin).astype(np.float32))
    z_img = jnp.asarray(rng.randn(B, 4 * h, 4 * w, cout).astype(np.float32))
    k2t = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(1, 1, cout, out).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(out).astype(np.float32) * 0.1)
    a = jnp.asarray([0.25], np.float32)
    return trunk, z_img, k2t, b2, w3, b3, a


def test_fused_head_tail_interpret_matches(rng):
    trunk, z_img, k2t, b2, w3, b3, a = _setup(rng)
    ref = np.asarray(reference_tail(trunk, z_img, k2t, b2, w3, b3, a[0]))
    got = np.asarray(
        fused_head_tail(
            trunk, z_img, k2t, b2, w3, b3, a, act="Softplus", interpret=True
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_fused_head_tail_odd_tiles(rng):
    # h=12 -> th=4 fallback path; w=20 -> tw=4
    trunk, z_img, k2t, b2, w3, b3, a = _setup(rng, B=1, h=6, w=20, cin=8, cout=16, out=1)
    ref = np.asarray(reference_tail(trunk, z_img, k2t, b2, w3, b3, a[0]))
    got = np.asarray(
        fused_head_tail(
            trunk, z_img, k2t, b2, w3, b3, a, act="Softplus", interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)

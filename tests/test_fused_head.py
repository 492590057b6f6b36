"""Equivalence of the fused upsample+conv2 dataflow with the reference
dataflow: exact on the interior, bounded deviation on the 1-px border."""

import numpy as np
import jax
import jax.numpy as jnp

from posfeat_tpu.models.keypoint_det import fused_upsample_conv3x3
from posfeat_tpu.ops.resize import interpolate_bilinear


def reference_path(trunk, kernel):
    xu = interpolate_bilinear(trunk, (trunk.shape[1] * 4, trunk.shape[2] * 4))
    return jax.lax.conv_general_dilated(
        xu, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def test_fused_upsample_conv_matches(rng):
    trunk = jnp.asarray(rng.randn(2, 12, 16, 7).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 7, 5).astype(np.float32) * 0.1)

    ref = np.asarray(reference_path(trunk, kernel))
    fused = np.asarray(fused_upsample_conv3x3(trunk, kernel, 4))

    assert fused.shape == ref.shape
    # exact everywhere (border ring recomputed with reference semantics)
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)


import pytest


@pytest.mark.parametrize("mode", ["always", "phase", "pallas"])
def test_fused_head_full_model(rng, mode):
    """Full KeypointDet: fused (dilated-composite and phase-layout)
    dataflows vs the reference dataflow, same params."""
    from posfeat_tpu.models import KeypointDet

    fm = jnp.asarray(rng.rand(1, 16, 20, 32).astype(np.float32))
    img = jnp.asarray(rng.rand(1, 64, 80, 3).astype(np.float32))

    m_ref = KeypointDet(in_channels=32, out_channels=2, prior="identity",
                        act="Softplus", fused_upsample=False)
    variables = m_ref.init(jax.random.PRNGKey(0), fm, img)
    m_fused = KeypointDet(in_channels=32, out_channels=2, prior="identity",
                          act="Softplus", fused_upsample=mode)

    ref = np.asarray(m_ref.apply(variables, fm, img))
    fused = np.asarray(m_fused.apply(variables, fm, img))
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-5)

"""Native C++ preprocessing == numpy reference (and compiles here)."""

import numpy as np

from posfeat_tpu.data import native
from posfeat_tpu.data.utils import IMAGENET_MEAN, IMAGENET_STD


def test_native_matches_numpy(rng):
    im = (rng.rand(67, 93, 3) * 255).astype(np.uint8)
    out = native.normalize_crop16(im)
    h, w = 64, 80
    ref = (im[:h, :w].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    assert out.shape == (h, w, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_native_library_builds():
    # the toolchain is present in this image; the fused path must be live
    assert native.native_available()

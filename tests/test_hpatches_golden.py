"""Golden regression against the reference's published HPatches results.

The reference ships its exact CVPR numbers as data
(evaluations/hpatches/cache/PoSFeat_CVPR.npy). Loading that cache through
OUR summary formulas must reproduce the published metrics (BASELINE.md):
MMA@3px 0.764/0.808/0.724 and MMAscore 0.775/0.826/0.728. This pins the
MMA/MMAscore math to the reference's implementation bit-for-bit.

Skipped when the reference checkout isn't present (CI without it).
"""

import os

import pytest

CACHE = "/root/reference/evaluations/hpatches/cache/PoSFeat_CVPR.npy"


@pytest.mark.skipif(not os.path.exists(CACHE), reason="reference cache absent")
def test_published_cache_through_our_formulas():
    from posfeat_tpu.evals.hpatches import load_reference_cache, mma_at, mma_score

    errors = load_reference_cache(CACHE)

    mma3 = mma_at(errors, 3)
    assert abs(mma3[0] - 0.764) < 0.0015, mma3
    assert abs(mma3[1] - 0.808) < 0.0015, mma3
    assert abs(mma3[2] - 0.724) < 0.0015, mma3

    score = mma_score(errors)
    assert abs(score[0] - 0.775) < 0.0015, score
    assert abs(score[1] - 0.826) < 0.0015, score
    assert abs(score[2] - 0.728) < 0.0015, score


@pytest.mark.skipif(not os.path.exists(CACHE), reason="reference cache absent")
def test_comparison_methods_ordering():
    """Sanity: the published per-method MMA@3 ordering from BASELINE.md
    reproduces through our loader (PoSFeat > ASLFeat > DISK-W > R2D2 >
    SuperPoint > CAPS)."""
    from posfeat_tpu.evals.hpatches import load_reference_cache, mma_at

    root = os.path.dirname(CACHE)
    vals = {}
    for name, fn in [
        ("posfeat", "PoSFeat_CVPR.npy"),
        ("aslfeat", "aslfeat.npy"),
        ("disk", "disk-epipolar.npy"),
        ("r2d2", "r2d2.npy"),
        ("superpoint", "superpoint.npy"),
        ("caps", "caps.npy"),
    ]:
        path = os.path.join(root, fn)
        if not os.path.exists(path):
            pytest.skip(f"{fn} absent")
        vals[name] = mma_at(load_reference_cache(path), 3)[0]

    assert vals["posfeat"] > vals["aslfeat"] > vals["disk"]
    assert vals["disk"] > vals["r2d2"] > vals["superpoint"]
    assert abs(vals["caps"] - 0.628) < 0.0015

"""Fast-path selection stability (VERDICT round-1 item #4).

HPatches MMA depends on top-k ORDERING (reference putils:249-261), so
the bf16 Pallas extraction default could churn top-k membership vs the
f32 XLA program even when score values agree to ~1e-2. The
tools/selection_stability.py probe runs BOTH full extraction programs on
textured images and measures top-k membership overlap and match-level
agreement; this test asserts the thresholds that protect the 0.5% MMA
budget (BASELINE.md).

The probe needs the real TPU (Mosaic kernels + bf16 hardware rounding;
interpret-mode numerics do not reproduce device behavior, see
ARCHITECTURE.md numerics section for measured values), so it skips on
CPU. Run manually: python tools/selection_stability.py 16 8192
"""

import sys

import pytest
import jax


@pytest.mark.slow
def test_bf16_pallas_topk_stability():
    if jax.default_backend() != "tpu":
        pytest.skip("selection-stability probe needs real TPU bf16/Mosaic")
    sys.path.insert(0, ".")
    from tools.selection_stability import main

    rec = main(n_images=8, num_pts=8192)
    # membership: on textured images virtually the same keypoint set
    # must survive NMS+top-k in both programs
    assert rec["topk_overlap_mean"] >= 0.99, rec
    assert rec["topk_overlap_min"] >= 0.97, rec
    # match-level: mutual-NN matches reproduce almost everywhere
    assert rec["match_agreement_mean"] >= 0.98, rec

"""Fast-path selection stability (VERDICT round-1 item #4).

HPatches MMA depends on top-k ORDERING (reference putils:249-261), so
the bf16 Pallas extraction default could churn top-k membership vs the
f32 XLA program. Measured on v5e (see tools/selection_stability.py
docstring and ARCHITECTURE.md numerics section), raw top-k churn on
RANDOM-INIT weights is dominated by probe conditioning — f32-XLA vs
bf16-XLA with no custom kernels anywhere already drops to 0.137 overlap
because an untrained head's smooth score map puts the top-k boundary
inside a dense band of near-equal scores.

The assertable quantity is therefore measured with TRAINED weights
(peaked score maps) and judged in MMA units — the budget the 0.5%
parity bar is written in. This test self-provisions a trained
checkpoint (two-stage synthetic training in a CPU subprocess — the
TPU-relay process itself must stay on the TPU backend), then runs the
full f32-XLA and bf16-Pallas extraction programs through the shipped
Extractor and asserts the fast path costs no measurable MMA.

Slow (~10 min CPU training + TPU compiles on first run):
  POSFEAT_RUN_STABILITY=1 python -m pytest tests/test_selection_stability.py -x -q -s
"""

import os
import subprocess
import sys

import pytest
import jax

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("POSFEAT_RUN_STABILITY") != "1",
        reason="slow TPU probe; set POSFEAT_RUN_STABILITY=1",
    ),
]


def test_trained_bf16_pallas_mma_parity(tmp_path):
    if jax.default_backend() != "tpu":
        pytest.skip("selection-stability probe needs real TPU bf16/Mosaic")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.environ.get("POSFEAT_STABILITY_CKPT")
    if not ckpt:
        env = dict(os.environ, POSFEAT_PLATFORM="cpu")
        subprocess.run(
            [
                sys.executable,
                os.path.join(root, "tools", "selection_stability.py"),
                "--train-ckpt",
                str(tmp_path),
            ],
            env=env,
            check=True,
            cwd=root,
        )
        ckpt = os.path.join(str(tmp_path), "ckpts", "conv_kp", "001")

    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tools"))
    from selection_stability import trained_probe

    rec = trained_probe(ckpt, work=os.path.join(str(tmp_path), "probe"))
    # the fast path must not cost measurable matching quality; the 0.5%
    # MMA budget (BASELINE.md) is the unit that matters
    assert abs(rec["delta_mma3"]) <= 0.01, rec
    # and with peaked (trained) score maps the programs should mostly
    # agree at the keypoint level too
    assert rec["topk_overlap_mean"] >= 0.75, rec
    assert rec["match_agreement_mean"] >= 0.60, rec

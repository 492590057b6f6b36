"""End-to-end proof the system LEARNS (VERDICT round-1 item #3).

Trains stage 1 (Line2Window + EpipolarLoss, the shipped train_desc
recipe shape) from random init on SyntheticPairs, then stage 2
(DiskLoss) on top, and evaluates HPatches-protocol MMA@3px on an unseen
same-distribution fixture:

- stage-1 metric uses SIFT keypoints + our descriptors — the
  reference's own stage-1 val protocol (train_desc.yaml val detector
  'sift'), since the score head is untrained in stage 1;
- stage 2 is judged by its REINFORCE health trends (n_pairs — the
  count of epipolar-consistent sampled pairs — must rise) plus a
  measured-improvement bound on learned-detector MMA (+0.03 over the
  untrained head; both dated re-runs measured +0.070). The reference explicitly
  documents stage-2 loss values as uninformative and uses score-map
  inspection as the stopping criterion (reference README.md:72-77).

Nuisance calibration (tools/convergence_experiment.py): at mild
magnitudes a random-init CNN's descriptors are already near-ceiling
(MMA ~0.9); at hard magnitudes (±30°, scale 0.7-1.3) the
weakly-supervised bootstrap fails from RANDOM init — the reference
always starts from an ImageNet-pretrained encoder (train_desc.yaml
pretrained: True), which this environment cannot download. The test
therefore runs the calibrated medium regime, enables the grid loss
term (w_g=1) alongside the window term (from random init the window
supervision is circular — see the W_G note in the experiment module —
while the dense grid term bootstraps from scratch), and uses a hotter
from-scratch stage-1 recipe (lr 3e-4, 512 distinct pairs) than the
reference's fine-tune-from-ImageNet one. The hard nuisance regime
(rot 30 / scale 0.3 / photo 1.3) was also measured: stage-1 gains only
+0.009 and stage-2 health degrades (n_pairs falls) — the bootstrap
needs the medium regime without a pretrained encoder.

Slow (~45 min on 1 CPU core): POSFEAT_RUN_CONVERGENCE=1 python -m
pytest tests/test_training_convergence.py -x -q -s
"""

import os
import sys

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("POSFEAT_RUN_CONVERGENCE") != "1",
        reason="~30 min training run; set POSFEAT_RUN_CONVERGENCE=1",
    ),
]


def test_two_stage_training_improves_matching(tmp_path, monkeypatch):
    monkeypatch.setenv("CONV_ROT", "20")
    monkeypatch.setenv("CONV_SCALE", "0.18")
    monkeypatch.setenv("CONV_PHOTO", "1.15")
    # from-scratch bootstrap needs a hotter LR than the reference's
    # fine-tune-from-ImageNet recipe (1e-4), and enough distinct pairs
    # that 500 steps x batch 4 doesn't relearn the same 256 scenes:
    # lr 3e-4 + 512 pairs moves MMA@3px by +0.06 where 1e-4 + 256 gave
    # +0.008..+0.029 across runs (calibration log, 2026-08-17)
    monkeypatch.setenv("CONV_LR1", "3e-4")
    monkeypatch.setenv("CONV_PAIRS", "512")
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import importlib

    import convergence_experiment as ce

    importlib.reload(ce)  # pick up the env-configured nuisance

    rec = ce.run(steps=500, work=str(tmp_path))
    print(rec)
    # stage 1 learns: SIFT-keypoint MMA improves by a clear margin
    # (calibration measured +0.063 @3px, +0.045 @1px at these settings;
    # the asserted margins leave ~2x headroom for CPU-thread
    # nondeterminism, which moved weaker recipes by ~0.02 run-to-run)
    assert rec["mma3_sift_stage1"] >= rec["mma3_sift_random_init"] + 0.03, rec
    assert rec["mma1_sift_stage1"] >= rec["mma1_sift_random_init"] + 0.02, rec
    # stage 2 health: epipolar-consistent sampled pairs increase and the
    # REINFORCE objective demonstrably optimizes (the reference documents
    # stage-2 loss magnitudes as uninformative and uses score-map
    # inspection as its stopping criterion) ...
    assert rec["n_pairs_last"] > rec["n_pairs_first"], rec
    assert rec["reinforce_last"] < rec["reinforce_first"], rec
    # ... and stage 2 demonstrably IMPROVES the detector over the
    # untrained head (r2 and r3 dated re-runs both measured +0.070,
    # 0.608 -> 0.678, PROOFS.md; +0.03 leaves ~2x headroom). The full
    # 5x200 reference schedule reaches 0.74-0.77 (stage-2 sweep,
    # PROOFS.md) — this short 150-step run is the CI-scale proxy.
    assert (
        rec["mma3_learned_stage2"] >= rec["mma3_learned_stage1"] + 0.03
    ), rec

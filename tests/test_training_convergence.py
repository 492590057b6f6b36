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
  no-collapse bound on learned-detector MMA. The reference explicitly
  documents stage-2 loss values as uninformative and uses score-map
  inspection as the stopping criterion (reference README.md:72-77).

Nuisance calibration (tools/convergence_experiment.py): at mild
magnitudes a random-init CNN's descriptors are already near-ceiling
(MMA ~0.9); at hard magnitudes (±30°, scale 0.7-1.3) the
weakly-supervised bootstrap fails from RANDOM init — the reference
always starts from an ImageNet-pretrained encoder (train_desc.yaml
pretrained: True), which this environment cannot download. The test
therefore runs the calibrated medium regime where learning is
demonstrable from scratch.

Slow (~30 min on 1 CPU core): POSFEAT_RUN_CONVERGENCE=1 python -m
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
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import importlib

    import convergence_experiment as ce

    importlib.reload(ce)  # pick up the env-configured nuisance

    rec = ce.run(steps=500, work=str(tmp_path))
    print(rec)
    # stage 1 learns: SIFT-keypoint MMA@3px improves by a clear margin
    assert rec["mma3_sift_stage1"] >= rec["mma3_sift_random_init"] + 0.03, rec
    # stage 2 health: epipolar-consistent sampled pairs increase ...
    assert rec["n_pairs_last"] > rec["n_pairs_first"], rec
    # ... and the learned detector does not collapse
    assert (
        rec["mma3_learned_stage2"] >= rec["mma3_learned_stage1"] - 0.05
    ), rec

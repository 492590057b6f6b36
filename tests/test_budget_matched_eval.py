"""tools/budget_matched_eval.py truncation semantics.

The tool's validity rests on two invariants: (1) truncating the npz
slates keeps the score-descending top-n rows (the extractor's top-k
contract, reference extractor.py:254-271 / putils:249-261), and
(2) the per-image matched budget uses each image's OWN SIFT count,
not a global mean.
"""
import os
import sys

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]

from budget_matched_eval import truncate_dir  # noqa: E402


def _write_slate(path, n, seed):
    rng = np.random.RandomState(seed)
    scores = np.sort(rng.rand(n, 1).astype(np.float32), axis=0)[::-1]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(
        open(path, "wb"),
        keypoints=rng.rand(n, 2).astype(np.float32) * 100,
        scores=scores,
        descriptors=rng.rand(n, 8).astype(np.float32),
    )


def test_truncate_keeps_top_rows_per_image(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    _write_slate(str(src / "seq_a" / "1.ppm.c"), 128, seed=0)
    _write_slate(str(src / "seq_b" / "2.ppm.c"), 128, seed=1)
    counts = {
        os.path.join("seq_a", "1.ppm.c"): 50,
        os.path.join("seq_b", "2.ppm.c"): 70,
    }
    truncate_dir(str(src), str(dst), "c", lambda rel: counts[rel])

    for rel, n in counts.items():
        z_src = np.load(str(src / rel))
        z_dst = np.load(str(dst / rel))
        assert z_dst["keypoints"].shape == (n, 2)
        assert z_dst["scores"].shape == (n, 1)
        assert z_dst["descriptors"].shape == (n, 8)
        # the kept rows are exactly the first (highest-score) n
        np.testing.assert_array_equal(z_dst["keypoints"], z_src["keypoints"][:n])
        np.testing.assert_array_equal(z_dst["scores"], z_src["scores"][:n])
        # and they dominate every dropped score
        assert z_dst["scores"].min() >= z_src["scores"][n:].max()


def test_truncate_clamps_to_available(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    _write_slate(str(src / "seq" / "1.ppm.c"), 40, seed=2)
    truncate_dir(str(src), str(dst), "c", lambda rel: 999)
    z = np.load(str(dst / "seq" / "1.ppm.c"))
    assert z["keypoints"].shape[0] == 40

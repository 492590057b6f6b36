"""Host-side COLMAP pipeline units: db import, pair ids, pose conversion,
matcher behavior — no COLMAP binary required."""

import os
import sqlite3

import pytest

import numpy as np

from posfeat_tpu.evals import colmap_db as cdb
from posfeat_tpu.ops.matchers import (
    mutual_nn_matcher,
    mutual_nn_ratio_matcher,
    ratio_matcher,
)


def _make_db(path):
    conn = sqlite3.connect(path)
    cur = conn.cursor()
    cur.execute(
        "CREATE TABLE images (image_id INTEGER PRIMARY KEY, name TEXT, camera_id INTEGER);"
    )
    cur.execute(
        "CREATE TABLE keypoints (image_id INTEGER, rows INTEGER, cols INTEGER, data BLOB);"
    )
    cur.execute(
        "CREATE TABLE matches (pair_id INTEGER, rows INTEGER, cols INTEGER, data BLOB);"
    )
    cur.execute("INSERT INTO images VALUES (1, 'a.jpg', 10);")
    cur.execute("INSERT INTO images VALUES (2, 'b.jpg', 11);")
    conn.commit()
    return conn


def test_pair_id_ordering():
    assert cdb.image_ids_to_pair_id(1, 2) == cdb.image_ids_to_pair_id(1, 2)
    assert cdb.image_ids_to_pair_id(2, 1) == cdb.image_ids_to_pair_id(1, 2)
    assert cdb.image_ids_to_pair_id(3, 7) == 2147483647 * 3 + 7


def test_quaternion_and_center_conversion():
    q = np.array([0.9, 0.1, -0.2, 0.3])
    R = cdb.quaternion_to_rotation_matrix(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(R) > 0.99
    c = np.array([1.0, -2.0, 3.0])
    t = cdb.camera_center_to_translation(c, q)
    np.testing.assert_allclose(t, -R @ c, atol=1e-12)


def test_db_image_recovery_and_keypoint_import(tmp_path, rng):
    db = str(tmp_path / "test.db")
    conn = _make_db(db)
    conn.close()

    images, cameras = cdb.recover_database_images_and_ids(db)
    assert images == {"a.jpg": 1, "b.jpg": 2}
    assert cameras == {"a.jpg": 10, "b.jpg": 11}

    for name in images:
        kpts = rng.rand(50, 2).astype(np.float32) * 100
        desc = rng.rand(50, 16).astype(np.float32)
        # write via file handle so np.savez doesn't append .npz (same as
        # the extractor's writer)
        with open(str(tmp_path / f"{name}.m"), "wb") as f:
            np.savez(f, keypoints=kpts, descriptors=desc)

    cdb.import_keypoints(
        db, images, lambda n: str(tmp_path / f"{n}.m"), with_scale_ori=True
    )
    conn = sqlite3.connect(db)
    cur = conn.cursor()
    cur.execute("SELECT image_id, rows, cols, data FROM keypoints;")
    rows = cur.fetchall()
    assert len(rows) == 2
    image_id, r, c, blob = rows[0]
    arr = np.frombuffer(blob, np.float32).reshape(r, c)
    assert c == 4  # x, y, scale placeholder, orientation placeholder
    np.testing.assert_allclose(arr[:, 2], 1.0)
    np.testing.assert_allclose(arr[:, 3], 0.0)
    conn.close()


def test_insert_matches_order_swap(tmp_path, rng):
    db = str(tmp_path / "m.db")
    conn = _make_db(db)
    cur = conn.cursor()
    matches = np.array([[0, 3], [1, 4]], np.uint32)
    pair_id = cdb.insert_matches(cur, 2, 1, matches.copy())  # id1 > id2: swap
    conn.commit()
    cur.execute("SELECT data FROM matches WHERE pair_id=?;", (pair_id,))
    blob = cur.fetchone()[0]
    arr = np.frombuffer(blob, np.int32).reshape(-1, 2)
    np.testing.assert_array_equal(arr, matches[:, [1, 0]])
    conn.close()


def test_matchers_mutual_consistency(rng):
    # identical descriptor sets: every point must match itself
    d = rng.rand(40, 32).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m = mutual_nn_matcher(d, d)
    np.testing.assert_array_equal(m[:, 0], m[:, 1])
    assert m.shape[0] == 40

    m2 = mutual_nn_ratio_matcher(d, d, ratio=0.99)
    np.testing.assert_array_equal(m2[:, 0], m2[:, 1])

    # ratio test kills ambiguous matches: queries NOT in the reference
    # set, whose two nearest references are equally distant near-copies
    def jitter(x, s):
        y = x + rng.randn(*x.shape).astype(np.float32) * s
        return y / np.linalg.norm(y, axis=1, keepdims=True)

    q = jitter(d, 1e-2)
    dd = np.concatenate([jitter(d, 1e-4), jitter(d, 1e-4)], axis=0)
    m3 = ratio_matcher(q, dd, ratio=0.9)
    assert m3.shape[0] == 0


def test_hpatches_plot_and_table(tmp_path, rng):
    """MMA curve figure + txt results table (reference evaluation.py:181-256)."""
    from posfeat_tpu.evals import hpatches as hp

    def fake_errors(level):
        i_err = {int(t): level * hp.N_I * 5 for t in hp.THRESHOLDS}
        v_err = {int(t): level * hp.N_V * 5 * 0.9 for t in hp.THRESHOLDS}
        aux = [
            np.array(["i", "v"]),
            np.array([1000, 1200]),
            np.array([400, 500]),
        ]
        return (i_err, v_err, aux)

    methods = {"ours": fake_errors(0.8), "baseline": fake_errors(0.6)}
    table = hp.results_table(methods)
    lines = table.splitlines()
    assert len(lines) == 3 and lines[1].startswith("ours")
    # MMAscore of the constant-0.8/0.72 curves
    s = hp.mma_score(methods["ours"])
    assert abs(s[1] - 0.8) < 1e-9 and abs(s[2] - 0.72) < 1e-9

    out = str(tmp_path / "curves.pdf")
    hp.plot_mma_curves(methods, out)
    assert os.path.exists(out) and os.path.exists(str(tmp_path / "curves.png"))


def test_extraction_dataset_sharding(tmp_path, rng):
    """Image-list sharding covers every image exactly once across shards."""
    import cv2

    from posfeat_tpu.data.extraction import HPatch_SIFT

    root = tmp_path / "hp"
    for si in range(2):
        seq = root / f"i_fake{si}"
        seq.mkdir(parents=True)
        for ii in range(1, 4):
            im = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(seq / f"{ii}.ppm"), im)

    full = HPatch_SIFT(configs={"data_path": str(root)})
    names = sorted(d["name1"] for d in full)
    sharded = []
    for s in range(3):
        ds = HPatch_SIFT(
            configs={"data_path": str(root), "num_shards": 3, "shard_index": s}
        )
        sharded.extend(d["name1"] for d in ds)
    assert sorted(sharded) == names and len(names) == 6


@pytest.mark.slow
def test_two_shard_extractors_share_output_root(tmp_path):
    """Two Extractor instances with num_shards=2 writing one output_root
    (the multi-host pattern) must not clobber or refuse each other, and
    together must cover every image exactly once (extractor.py shard
    logic; reference DistributedSampler analog)."""
    import glob

    from test_e2e import MODEL_CONFIG, make_mini_hpatches
    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root, n_seq=2, n_img=3)  # 6 images

    def cfg(shard):
        return {
            "output_root": "hp/shared",
            "postfix": "s",
            "load_path": None,
            "loss_distance": "cos",
            "output_desc": True,
            "output_img": False,
            "model": "PoSFeat",
            "model_config": MODEL_CONFIG,
            "data": "HPatch_SIFT",
            "data_config_extract": {
                "data_path": data_root,
                "batch_size": 2,
                "workers": 2,
                "num_shards": 2,
                "shard_index": shard,
            },
            "local_thr": 0.99,
            "use_sift": False,
            "detector": "generate_kpts_single",
            "detector_config": {
                "num_pts": 128, "stable": True, "use_nms": True,
                "nms_radius": 1, "thr": False,
            },
        }

    root = str(tmp_path / "ckpts")
    n0, _ = Extractor(cfg(0), ckpt_root=root).extract()
    # second shard into the SAME non-empty output_root must not raise
    n1, _ = Extractor(cfg(1), ckpt_root=root).extract()
    assert n0 + n1 == 6

    files = sorted(glob.glob(os.path.join(root, "hp/shared/desc/*/*.s")))
    assert len(files) == 6  # every image exactly once, no clobbers
    for shard in (0, 1):
        lst = os.path.join(root, "hp/shared/image", f"name_list.shard{shard}.txt")
        assert os.path.exists(lst)
    lines = sum(
        len(open(os.path.join(root, "hp/shared/image", f"name_list.shard{s}.txt"))
            .read().strip().splitlines())
        for s in (0, 1)
    )
    assert lines == 6

"""End-to-end plumbing tests for the Aachen and ETH pipelines using a
fake `colmap` executable — validates NVM parsing, pose conversion, db
import, matching, and submission/stat export without COLMAP installed."""

import os
import sqlite3
import stat
import sys

import numpy as np
import pytest

FAKE_COLMAP = r'''#!/usr/bin/env python3
import os, sys

args = sys.argv[1:]
cmd = args[0]
opts = dict(zip(args[1::2], args[2::2]))

def write_model(path):
    os.makedirs(path, exist_ok=True)
    open(os.path.join(path, "cameras.txt"), "w").write(
        "# Camera list\n# Number of cameras: 2\n"
        "1 SIMPLE_RADIAL 64 64 60 32 32 0\n2 SIMPLE_RADIAL 64 64 60 32 32 0\n")
    open(os.path.join(path, "images.txt"), "w").write(
        "# Image list\n# lines\n# header\n# more\n"
        "1 1 0 0 0 0.1 0.2 0.3 1 db/a.jpg\n\n"
        "2 1 0 0 0 0.4 0.5 0.6 2 query/night/x/q.jpg\n\n")
    open(os.path.join(path, "points3D.txt"), "w").write("")

if cmd in ("point_triangulator", "image_registrator"):
    write_model(opts["--output_path"])
elif cmd == "model_converter":
    write_model(opts["--output_path"])
elif cmd == "mapper":
    write_model(os.path.join(opts["--output_path"], "0"))
elif cmd == "matches_importer":
    pass
elif cmd == "model_analyzer":
    print("Registered images: 2")
    print("Points: 10")
    print("Observations: 20")
    print("Mean track length: 2.0")
    print("Mean observations per image: 10.0")
    print("Mean reprojection error: 0.5px")
sys.exit(0)
'''


@pytest.fixture
def fake_colmap(tmp_path):
    p = tmp_path / "colmap"
    p.write_text(FAKE_COLMAP)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def _make_db(path, names):
    conn = sqlite3.connect(path)
    cur = conn.cursor()
    cur.execute(
        "CREATE TABLE images (image_id INTEGER PRIMARY KEY, name TEXT, camera_id INTEGER);"
    )
    cur.execute("CREATE TABLE keypoints (image_id INTEGER, rows INTEGER, cols INTEGER, data BLOB);")
    cur.execute("CREATE TABLE descriptors (image_id INTEGER, rows INTEGER, cols INTEGER, data BLOB);")
    cur.execute("CREATE TABLE matches (pair_id INTEGER, rows INTEGER, cols INTEGER, data BLOB);")
    cur.execute("CREATE TABLE two_view_geometries (pair_id INTEGER, rows INTEGER, cols INTEGER, data BLOB);")
    for i, name in enumerate(names, 1):
        cur.execute("INSERT INTO images VALUES (?, ?, ?);", (i, name, i))
    conn.commit()
    conn.close()


def _write_feats(root, names, rng):
    for name in names:
        path = os.path.join(root, name + ".m")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        d = rng.rand(30, 16).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        with open(path, "wb") as f:
            np.savez(f, keypoints=rng.rand(30, 2).astype(np.float32) * 60,
                     scores=np.ones((30, 1), np.float32), descriptors=d)


def test_aachen_pipeline_e2e(tmp_path, fake_colmap, rng):
    from posfeat_tpu.evals import aachen

    ds = tmp_path / "aachen"
    names = ["db/a.jpg", "db/b.jpg", "query/night/x/q.jpg"]
    (ds / "others").mkdir(parents=True)
    _make_db(str(ds / "others/database.db"), names)
    (ds / "others/image_pairs_to_match.txt").write_text(
        "db/a.jpg db/b.jpg\ndb/a.jpg query/night/x/q.jpg\n"
    )
    m3d = ds / "3D-models/aachen_v_1"
    m3d.mkdir(parents=True)
    (m3d / "database_intrinsics.txt").write_text(
        "db/a.jpg SIMPLE_RADIAL 64 64 60 32 32 0\n"
        "db/b.jpg SIMPLE_RADIAL 64 64 60 32 32 0\n"
    )
    (m3d / "aachen_cvpr2018_db.nvm").write_text(
        "NVM_V3\n\n2\n"
        "db/a.jpg 60 1 0 0 0 1.0 2.0 3.0 0 0\n"
        "db/b.jpg 60 0.9 0.1 0.2 0.3 2.0 1.0 0.5 0 0\n"
    )
    (ds / "queries").mkdir()
    (ds / "queries/night_time_queries_with_intrinsics.txt").write_text(
        "query/night/x/q.jpg SIMPLE_RADIAL 64 64 60 32 32 0\n"
    )
    feats = tmp_path / "feats"
    _write_feats(str(feats), names, rng)

    aachen.main([
        "--dataset_path", str(ds),
        "--feature_path", str(feats),
        "--colmap_path", fake_colmap,
        "--method_name", "m",
    ])

    # keypoints imported with placeholder scale/orientation
    conn = sqlite3.connect(str(ds / "intermedia/m/m.db"))
    cur = conn.cursor()
    cur.execute("SELECT count(*) FROM keypoints;")
    assert cur.fetchone()[0] == 3
    cur.execute("SELECT count(*) FROM matches;")
    assert cur.fetchone()[0] == 2
    conn.close()

    # empty reconstruction carries NVM->COLMAP converted poses
    images_txt = (ds / "intermedia/m/sparse-m-empty/images.txt").read_text()
    assert "db/a.jpg" in images_txt and "db/b.jpg" in images_txt
    # t = -R c for identity rotation is -c
    assert "-1.0 -2.0 -3.0" in images_txt

    # submission file contains the query pose from the final TXT model
    sub = (ds / "results/Aachen_eval_[m].txt").read_text()
    assert sub.strip().startswith("q.jpg ")
    assert "0.4 0.5 0.6" in sub


def test_eth_pipeline_e2e(tmp_path, fake_colmap, rng):
    import yaml

    from posfeat_tpu.evals import eth

    scene = "TestScene"
    ds = tmp_path / "eth"
    scene_dir = ds / scene
    (scene_dir / "images").mkdir(parents=True)
    names = ["i0.jpg", "i1.jpg", "i2.jpg"]
    _make_db(str(scene_dir / "database.db"), names)

    ckpt_root = tmp_path / "ckpts"
    feats_root = ckpt_root / "out/desc" / scene
    _write_feats(str(feats_root), names, rng)

    cfg = {
        "output_root": "out",
        "postfix": "m",
        "colmap_path": fake_colmap,
        "matcher": "mutual_nn_matcher",
        "matcher_config": {},
        "data_config_extract": {"data_path": str(ds), "subfolder": scene},
    }
    cfg_path = tmp_path / "eth.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    eth.main(["--config", str(cfg_path), "--ckpt_root", str(ckpt_root)])

    # all-pairs matches inserted; result row written
    conn = sqlite3.connect(str(ckpt_root / "out/desc" / f"{scene}_m.db"))
    cur = conn.cursor()
    cur.execute("SELECT count(*) FROM matches;")
    assert cur.fetchone()[0] == 3  # C(3,2)
    conn.close()
    res = (ckpt_root / "out/desc" / f"res_{scene}_m.txt").read_text()
    assert "num_reg_images" in res and "2" in res

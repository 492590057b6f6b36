"""End-to-end smoke tests: extraction -> npz -> HPatches eval, and one
train step of each stage on synthetic geometric data. Small images +
resnet18 encoder keep CPU compile time bounded."""

import os

import numpy as np
import pytest
import jax

from posfeat_tpu.data.synthetic import SyntheticPairs, _texture


MODEL_CONFIG = {
    "backbone": "ResUNet",
    "backbone_config": {
        "encoder": "resnet18",
        "pretrained": False,
        "coarse_out_ch": 64,
        "fine_out_ch": 64,
    },
    "localheader": "KeypointDet",
    "localheader_config": {
        "in_channels": 128,  # 64 local_map + 64 local_map_small
        "prior": "identity",
        "act": "Softplus",
    },
    "align_local_grad": False,
    "local_input_elements": ["local_map", "local_map_small"],
    "local_with_img": True,
}


def make_mini_hpatches(root, n_seq=2, n_img=6, h=96, w=128):
    """Tiny HPatches-layout dataset with known homographies."""
    import cv2

    rng = np.random.RandomState(7)
    for si in range(n_seq):
        seq = os.path.join(root, ("i_fake" if si == 0 else "v_fake") + str(si))
        os.makedirs(seq, exist_ok=True)
        base = _texture(rng, h, w)
        cv2.imwrite(os.path.join(seq, "1.ppm"), cv2.cvtColor(base, cv2.COLOR_RGB2BGR))
        for ii in range(2, n_img + 1):
            H = np.eye(3)
            H[0, 2] = rng.uniform(-4, 4)
            H[1, 2] = rng.uniform(-4, 4)
            warped = cv2.warpPerspective(base, H, (w, h), borderMode=cv2.BORDER_REFLECT)
            cv2.imwrite(
                os.path.join(seq, f"{ii}.ppm"), cv2.cvtColor(warped, cv2.COLOR_RGB2BGR)
            )
            np.savetxt(os.path.join(seq, f"H_1_{ii}"), H)


@pytest.mark.slow
def test_extract_and_eval_smoke(tmp_path):
    from posfeat_tpu.extract import Extractor
    from posfeat_tpu.evals import hpatches as hp

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root)

    config = {
        "output_root": "hpatches/smoke",
        "postfix": "smoke",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "data_config_extract": {"data_path": data_root, "batch_size": 1, "workers": 2},
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 256,
            "stable": True,
            "use_nms": True,
            "nms_radius": 1,
            "thr": 0.9,
            "thr_mod": "abs",
        },
    }
    ex = Extractor(config, ckpt_root=str(tmp_path / "ckpts"))
    n_images, _ = ex.extract()
    assert n_images == 12

    # npz format parity: keypoints [n,2] px, scores [n,1], descriptors [n,c]
    f = np.load(
        str(tmp_path / "ckpts/hpatches/smoke/desc/i_fake0/1.ppm.smoke")
    )
    assert set(f.files) == {"keypoints", "scores", "descriptors"}
    n = f["keypoints"].shape[0]
    assert 128 <= n <= 256
    assert f["descriptors"].shape == (n, 64)
    assert f["scores"].shape == (n, 1)
    # L2-normalized descriptors
    np.testing.assert_allclose(
        np.linalg.norm(f["descriptors"], axis=1), 1.0, atol=1e-4
    )
    # keypoints inside the image
    assert (f["keypoints"][:, 0] < 128).all() and (f["keypoints"][:, 1] < 96).all()

    errors = hp.benchmark_features(
        hp.generate_read_function(
            str(tmp_path / "ckpts/hpatches/smoke/desc"), "smoke"
        ),
        data_root,
    )
    # random weights: we only assert the harness produces well-formed output
    assert set(errors[0]) == set(int(t) for t in hp.THRESHOLDS)
    o, i, v = hp.mma_at(errors, 3, n_i=1, n_v=1)
    assert 0 <= o <= 1


@pytest.mark.slow
def test_sift_passthrough_extraction(tmp_path):
    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root, n_seq=1, n_img=2)

    config = {
        "output_root": "hpatches/sift_smoke",
        "postfix": "smoke",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "data_config_extract": {"data_path": data_root, "batch_size": 1, "workers": 2},
        "use_sift": True,
    }
    ex = Extractor(config, ckpt_root=str(tmp_path / "ckpts"))
    ex.extract()
    f = np.load(str(tmp_path / "ckpts/hpatches/sift_smoke/desc/i_fake0/1.ppm.smoke"))
    assert f["keypoints"].shape[0] == f["descriptors"].shape[0]
    assert (f["scores"] == 1).all()


def _train_config(tmp_path, stage: str):
    base = {
        "checkpoint_name": f"smoke_{stage}",
        "epoch": 1,
        "epoch_step": 2,
        "lr_decay_step": 1,
        "lr_decay_factor": 0.5,
        "log_freq": 1,
        "grad_clip": False,
        "clip_norm": 10.0,
        "optimizer": "Adam",
        "seed": 0,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "SyntheticPairs",
        "data_config_train": {
            "num_pairs": 8,
            "height": 96,
            "width": 128,
            "num_pts": 64,
            "batch_size": 2,
            "workers": 2,
        },
        # stage-1 recipe uses the sift val detector (train_desc.yaml);
        # stage-2 overrides with the learned detector below
        "val_config": {
            "detector": "sift",
            "loss_distance": "cos",
            "vis_topk": 20,
            "vis_err_thr": 5,
            "n_vis": 1,
        },
    }
    if stage == "desc":
        base.update(
            {
                "optimal_modules": ["backbone"],
                "optimal_lrs": [1e-4],
                "preprocess_train": "Preprocess_Line2Window",
                "preprocess_train_config": {
                    "kps_generator": "generate_kpts_regular_grid_random",
                    "kps_generator_config": {
                        "grid_size": 16,
                        "map_init": "identity",
                        "keep_spatial": True,
                        "random_select": "random",
                    },
                    "window_size": 0.1,
                    "loss_distance": "cos",
                    "use_nn_grid": False,
                    "use_line_search": True,
                    "line_search_config": {
                        "line_step": 20,
                        "use_nn": True,
                        "loc_rand": True,
                    },
                    "temperature_base": 60,
                    "temperature_max": 60,
                },
                "losses": ["EpipolarLoss_full"],
                "losses_weight": [1],
                "tb_component": ["loss_w1", "loss_w2"],
                "EpipolarLoss_full_config": {
                    "grid_cost_thr": 0.5,
                    "win_cost_thr": 0.1,
                    "use_std_as_weight": True,
                    "weight_grid": 0,
                    "weight_window": 1,
                },
            }
        )
    else:
        base["val_config"].update(
            {
                "detector": "generate_kpts_single",
                "detector_config": {
                    "num_pts": 128,
                    "stable": True,
                    "use_nms": True,
                    "nms_radius": 1,
                    "thr": False,
                },
            }
        )
        base.update(
            {
                "optimal_modules": ["localheader"],
                "optimal_lrs": [1e-3],
                "optimizer": "SGD",
                "losses": ["DiskLoss"],
                "losses_weight": [1],
                "tb_component": ["reinforce", "kp_penalty"],
                "DiskLoss_config": {
                    "grid_size": 8,
                    "loss_distance": "cos",
                    "temperature_base": 60,
                    "temperature_max": 60,
                    "epipolar_reward": "constant_reward",
                    "reward_config": {"reward_thr": 2, "rescale_thr": False},
                    "cor_detach": True,
                    "good_reward": 1,
                    "bad_reward": -0.25,
                    "kp_penalty": -0.001,
                    "match_grad": False,
                },
            }
        )
    return base


@pytest.mark.slow
def test_train_stage1_smoke(tmp_path):
    from posfeat_tpu.train import Trainer

    t = Trainer(_train_config(tmp_path, "desc"), ckpt_root=str(tmp_path / "ckpts"))
    t.train()
    # epoch checkpoints exist with per-module payloads
    assert os.path.exists(str(tmp_path / "ckpts/smoke_desc/001/backbone.msgpack"))
    assert os.path.exists(str(tmp_path / "ckpts/smoke_desc/001/localheader.msgpack"))
    # metrics logged with finite loss
    import json

    with open(str(tmp_path / "ckpts/smoke_desc/metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs and np.isfinite(recs[-1]["total_loss"])
    # the persisted val batch (reference val_data.npz, trainer.py:136-145)
    assert os.path.exists(str(tmp_path / "ckpts/smoke_desc/val_data.npz"))
    # sift-val visual dumps: all six reference image sets per val sample
    vis_root = str(tmp_path / "ckpts/smoke_desc/vis/sample0")
    for folder in (
        "0_original_images",
        "1_score_maps",
        "2_all_keypoints",
        "3_matched_keypoints",
        "4_matches_less",
        "5_matches_all",
    ):
        files = os.listdir(os.path.join(vis_root, folder))
        assert files, f"no vis dump in {folder}"


@pytest.mark.slow
def test_train_stage2_smoke(tmp_path):
    from posfeat_tpu.train import Trainer

    t = Trainer(_train_config(tmp_path, "kp"), ckpt_root=str(tmp_path / "ckpts"))
    t.train()
    assert os.path.exists(str(tmp_path / "ckpts/smoke_kp/001/localheader.msgpack"))
    # learned-detector val path produced the match dumps (and the log
    # carries no silenced val_and_vis failure)
    assert os.listdir(str(tmp_path / "ckpts/smoke_kp/vis/sample0/5_matches_all"))
    log = open(str(tmp_path / "ckpts/smoke_kp/logging_file.txt")).read()
    assert "val_and_vis failed" not in log


@pytest.mark.slow
def test_batched_extraction_matches_single(tmp_path):
    """The shape-bucketed batched pipeline (batch_size=4, incl. a padded
    partial bucket) must produce the same feature files as batch-1."""
    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root, n_seq=2, n_img=3)  # 6 images, bs=4 -> pad

    base = {
        "postfix": "b",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 256, "stable": True, "use_nms": True,
            "nms_radius": 1, "thr": 0.9, "thr_mod": "abs",
        },
    }
    import copy

    cfg1 = copy.deepcopy(base)
    cfg1["output_root"] = "hp/single"
    cfg1["data_config_extract"] = {
        "data_path": data_root, "batch_size": 1, "workers": 2,
    }
    cfg4 = copy.deepcopy(base)
    cfg4["output_root"] = "hp/batched"
    cfg4["data_config_extract"] = {
        "data_path": data_root, "batch_size": 4, "workers": 2,
    }
    root = str(tmp_path / "ckpts")
    Extractor(cfg1, ckpt_root=root).extract()
    Extractor(cfg4, ckpt_root=root).extract()

    import glob

    singles = sorted(glob.glob(os.path.join(root, "hp/single/desc/*/*.b")))
    assert len(singles) == 6
    for sp in singles:
        bp = sp.replace("/single/", "/batched/")
        fs, fb = np.load(sp), np.load(bp)
        assert fs["keypoints"].shape == fb["keypoints"].shape
        np.testing.assert_allclose(fs["keypoints"], fb["keypoints"], atol=1e-4)
        np.testing.assert_allclose(
            fs["descriptors"], fb["descriptors"], atol=1e-4
        )
        np.testing.assert_allclose(fs["scores"], fb["scores"], atol=1e-5)
    # name_list is ordered and complete in both
    nl = open(os.path.join(root, "hp/batched/image/name_list.txt")).read()
    assert len(nl.strip().splitlines()) == 6


@pytest.mark.slow
def test_partial_bucket_flush_matches_single(tmp_path, monkeypatch):
    """Shape-diverse dataset + a small pending cap: partial buckets are
    flushed (padded) mid-stream to bound host memory, and the features
    still match the batch-1 path exactly."""
    import cv2

    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    rng = np.random.RandomState(9)
    for si, (h, w) in enumerate([(96, 128), (80, 112), (112, 96)]):
        seq = os.path.join(data_root, f"v_shape{si}")
        os.makedirs(seq)
        base = _texture(rng, h, w)
        cv2.imwrite(os.path.join(seq, "1.ppm"),
                    cv2.cvtColor(base, cv2.COLOR_RGB2BGR))
        for ii in range(2, 5):
            H = np.eye(3)
            H[0, 2] = rng.uniform(-4, 4)
            cv2.imwrite(
                os.path.join(seq, f"{ii}.ppm"),
                cv2.cvtColor(
                    cv2.warpPerspective(base, H, (w, h),
                                        borderMode=cv2.BORDER_REFLECT),
                    cv2.COLOR_RGB2BGR,
                ),
            )
            np.savetxt(os.path.join(seq, f"H_1_{ii}"), H)

    base_cfg = {
        "postfix": "p",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 128, "stable": True, "use_nms": True,
            "nms_radius": 1, "thr": False,
        },
    }
    import copy

    cfg1 = copy.deepcopy(base_cfg)
    cfg1["output_root"] = "hp/psingle"
    cfg1["data_config_extract"] = {
        "data_path": data_root, "batch_size": 1, "workers": 2,
    }
    cfg8 = copy.deepcopy(base_cfg)
    cfg8["output_root"] = "hp/pflush"
    cfg8["data_config_extract"] = {
        "data_path": data_root, "batch_size": 8, "workers": 2,
    }
    root = str(tmp_path / "ckpts")
    Extractor(cfg1, ckpt_root=root).extract()
    # no bucket ever reaches batch_size 8 (4 images per shape); the cap
    # forces mid-stream partial flushes instead of end-of-dataset
    monkeypatch.setenv("POSFEAT_EXTRACT_PENDING_CAP", "5")
    n, _ = Extractor(cfg8, ckpt_root=root).extract()
    assert n == 12

    import glob

    singles = sorted(glob.glob(os.path.join(root, "hp/psingle/desc/*/*.p")))
    assert len(singles) == 12
    for sp in singles:
        bp = sp.replace("/psingle/", "/pflush/")
        fs, fb = np.load(sp), np.load(bp)
        assert fs["keypoints"].shape == fb["keypoints"].shape
        np.testing.assert_allclose(fs["keypoints"], fb["keypoints"], atol=1e-4)
        np.testing.assert_allclose(fs["descriptors"], fb["descriptors"], atol=1e-4)


@pytest.mark.slow
def test_bf16_training_smoke(tmp_path):
    """compute_dtype bfloat16 (the configs' documented max-throughput
    option) must train: finite losses, checkpoints written."""
    from posfeat_tpu.train import Trainer

    cfg = _train_config(tmp_path, "desc")
    cfg["compute_dtype"] = "bfloat16"
    cfg["checkpoint_name"] = "smoke_bf16"
    Trainer(cfg, ckpt_root=str(tmp_path / "ckpts")).train()
    # stage 2 too: REINFORCE/gumbel under bf16 is the NaN-prone path
    cfg2 = _train_config(tmp_path, "kp")
    cfg2["compute_dtype"] = "bfloat16"
    cfg2["checkpoint_name"] = "smoke_bf16_kp"
    Trainer(cfg2, ckpt_root=str(tmp_path / "ckpts")).train()
    ck = tmp_path / "ckpts" / "smoke_bf16" / "001"
    assert (ck / "backbone.msgpack").exists()
    assert (ck / "opt_state.msgpack").exists()
    import json

    metrics = [
        json.loads(x)
        for x in open(tmp_path / "ckpts" / "smoke_bf16" / "metrics.jsonl")
    ]
    assert metrics and all(np.isfinite(m["total_loss"]) for m in metrics)


@pytest.mark.slow
def test_h5_hloc_writer_layout(tmp_path):
    """The save_h5 outputs must reproduce the reference's two h5
    contracts exactly (reference managers/extractor.py:273-314):

    - per-sequence keypoints.h5 / descriptors.h5 / scores.h5 / scales.h5,
      dataset key = image basename without extension;
    - a root feat.h5 (hloc input) with one group per full image name
      holding keypoints / scores / descriptors / image_size, where
      image_size is [w, h] (width FIRST) and scales are all-ones.

    The expected tree below is written out independently from the npz
    slates following those reference lines, then compared file-by-file."""
    import h5py

    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root, n_seq=1, n_img=2)

    config = {
        "output_root": "hpatches/h5smoke",
        "postfix": "h5s",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "save_h5": True,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "data_config_extract": {"data_path": data_root, "batch_size": 1, "workers": 2},
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 256,
            "stable": True,
            "use_nms": True,
            "nms_radius": 1,
            "thr": 0.9,
            "thr_mod": "abs",
        },
    }
    ex = Extractor(config, ckpt_root=str(tmp_path / "ckpts"))
    n_images, _ = ex.extract()
    assert n_images == 2

    desc_root = str(tmp_path / "ckpts/hpatches/h5smoke/desc")
    h5_root = desc_root + "h5"
    seq = "i_fake0"

    # ------- golden: reference layout re-derived from the npz slates
    golden = str(tmp_path / "golden")
    os.makedirs(os.path.join(golden, seq))
    for img in ("1.ppm", "2.ppm"):
        name = f"{seq}/{img}"
        z = np.load(os.path.join(desc_root, name + ".h5s"))
        kpt, desc, scores = z["keypoints"], z["descriptors"], z["scores"]
        h5_base = img.split(".")[0]
        # reference extractor.py:284-293
        with h5py.File(os.path.join(golden, seq, "keypoints.h5"), "a") as f:
            f[h5_base] = kpt
        with h5py.File(os.path.join(golden, seq, "descriptors.h5"), "a") as f:
            f[h5_base] = desc
        with h5py.File(os.path.join(golden, seq, "scores.h5"), "a") as f:
            f[h5_base] = scores
        with h5py.File(os.path.join(golden, seq, "scales.h5"), "a") as f:
            f[h5_base] = np.ones_like(scores)
        # reference extractor.py:301-307 (hloc input; image_size = [w,h])
        with h5py.File(os.path.join(golden, "feat.h5"), "a") as f:
            grp = f.create_group(name)
            grp.create_dataset("keypoints", data=kpt)
            grp.create_dataset("scores", data=scores)
            grp.create_dataset("descriptors", data=desc)
            grp.create_dataset("image_size", data=np.array([128, 96]))

    # ------- compare tree-by-tree
    def h5_tree(path):
        out = {}
        with h5py.File(path, "r") as f:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out[name] = np.asarray(obj)
            f.visititems(visit)
        return out

    for fname in ("keypoints.h5", "descriptors.h5", "scores.h5", "scales.h5"):
        got = h5_tree(os.path.join(h5_root, seq, fname))
        want = h5_tree(os.path.join(golden, seq, fname))
        assert sorted(got) == sorted(want), (fname, sorted(got), sorted(want))
        for k in want:
            assert got[k].dtype == want[k].dtype, (fname, k)
            np.testing.assert_array_equal(got[k], want[k], err_msg=f"{fname}/{k}")

    got = h5_tree(os.path.join(h5_root, "feat.h5"))
    want = h5_tree(os.path.join(golden, "feat.h5"))
    assert sorted(got) == sorted(want), (sorted(got), sorted(want))
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_output_img_dumps(tmp_path):
    """output_img: True writes the keypoint-overlay and score-map images
    (reference extractor.py:211-252 — broken there: undefined variables;
    working here) through the batched pipeline."""
    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    make_mini_hpatches(data_root, n_seq=1, n_img=2)

    config = {
        "output_root": "hp/vis_smoke",
        "postfix": "v",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": True,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "data_config_extract": {"data_path": data_root, "batch_size": 2, "workers": 2},
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 128,
            "stable": True,
            "use_nms": True,
            "nms_radius": 1,
            "thr": False,
        },
    }
    ex = Extractor(config, ckpt_root=str(tmp_path / "ckpts"))
    ex.extract()
    img_root = tmp_path / "ckpts/hp/vis_smoke/image/i_fake0"
    for base in ("1", "2"):
        assert (img_root / f"{base}_image_with_kp.jpg").exists()
        assert (img_root / f"{base}_score_map.jpg").exists()
    # the npz contract is unaffected by the extra vis fetch
    f = np.load(str(tmp_path / "ckpts/hp/vis_smoke/desc/i_fake0/1.ppm.v"))
    assert set(f.files) == {"keypoints", "scores", "descriptors"}


@pytest.mark.parametrize(
    "match_prob", ["ot_sinkhorn", "ot_sinkhorn_unmatch", "dual_softmax"]
)
def test_stage1_alternative_matchers(tmp_path, match_prob):
    """The reference defines OT-Sinkhorn and dual-softmax matchers
    (putils:117-194) but never wires them; here `match_prob` in the
    preprocess config routes the grid correlation through them. A short
    stage-1 run must train to a finite loss with each."""
    from posfeat_tpu.train import Trainer

    cfg = _train_config(tmp_path, "desc")
    cfg["checkpoint_name"] = f"smoke_{match_prob}"
    cfg["preprocess_train_config"]["match_prob"] = match_prob
    cfg["preprocess_train_config"]["sinkhorn_iters"] = 5
    t = Trainer(cfg, ckpt_root=str(tmp_path / "ckpts"))
    t.train()
    import json

    with open(str(tmp_path / f"ckpts/smoke_{match_prob}/metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs and np.isfinite(recs[-1]["total_loss"])

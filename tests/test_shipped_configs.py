"""Shipped-config smoke: every training YAML in configs/ must drive the
Trainer end-to-end after only data/size substitutions (the real
MegaDepth path does not exist in CI). Covers VERDICT r4 item 5: the
best-known recipe (train_kp_best.yaml) is a runnable artifact, not
comments."""

import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_CONFIG = {
    "backbone": "ResUNet",
    "backbone_config": {
        "encoder": "resnet18",
        "pretrained": False,
        "coarse_out_ch": 32,
        "fine_out_ch": 32,
    },
    "localheader": "KeypointDet",
    "localheader_config": {
        "in_channels": 96,
        "prior": "identity",
        "act": "Softplus",
    },
    "align_local_grad": False,
    "local_input_elements": ["local_map", "local_map_small"],
    "local_with_img": True,
}


def _tiny_overrides(cfg, tmp_path, name):
    cfg["checkpoint_name"] = name
    cfg["epoch"] = 2
    cfg["epoch_step"] = 2
    cfg["log_freq"] = 1
    cfg["model_config"] = MODEL_CONFIG
    cfg["load_path"] = None
    cfg["data"] = "SyntheticPairs"
    cfg["data_config_train"] = {
        "num_pairs": 8,
        "num_scenes": 4,
        "height": 64,
        "width": 64,
        "num_pts": 64,
        "batch_size": 2,
        "workers": 2,
    }
    cfg["val_config"] = None
    cfg.pop("data_config_val", None)
    return cfg


@pytest.mark.parametrize(
    "yaml_name", ["train_kp.yaml", "train_kp_best.yaml", "train_desc.yaml"]
)
def test_shipped_train_config_smoke(tmp_path, yaml_name):
    from posfeat_tpu.train import Trainer

    with open(os.path.join(REPO, "configs", yaml_name)) as f:
        cfg = yaml.safe_load(f)
    cfg = _tiny_overrides(cfg, tmp_path, f"smoke_{yaml_name.split('.')[0]}")
    tr = Trainer(cfg, ckpt_root=str(tmp_path / "ckpts"))
    tr.train()
    ck = tmp_path / "ckpts" / cfg["checkpoint_name"] / "002"
    assert (ck / "backbone.msgpack").exists()
    assert (ck / "localheader.msgpack").exists()


def test_best_recipe_is_champion_curriculum():
    """train_kp_best.yaml carries the replicated champion (ramp2to05):
    full-schedule 2 -> 0.5 px anneal, hot SGD, 10 epochs — pinned so the
    artifact cannot silently drift from the PROOFS.md evidence."""
    with open(os.path.join(REPO, "configs", "train_kp_best.yaml")) as f:
        cfg = yaml.safe_load(f)
    rc = cfg["DiskLoss_config"]["reward_config"]
    assert rc["reward_thr"] == 2
    assert rc["reward_thr_final"] == 0.5
    assert rc["reward_anneal_epochs"] == cfg["epoch"] - 1
    assert cfg["optimal_lrs"] == [5e-3]
    assert cfg["optimizer"] == "SGD"
    assert cfg["epoch"] == 10
    # reference-parity config must NOT carry the curriculum
    with open(os.path.join(REPO, "configs", "train_kp.yaml")) as f:
        ref = yaml.safe_load(f)
    assert "reward_thr_final" not in ref["DiskLoss_config"]["reward_config"]
    assert ref["DiskLoss_config"]["reward_config"]["reward_thr"] == 2


def test_best_recipe_anneal_schedule():
    """The per-epoch threshold the Trainer will bake into each epoch's
    step follows the linear ramp."""
    from posfeat_tpu.losses.disk_loss import DiskLoss

    with open(os.path.join(REPO, "configs", "train_kp_best.yaml")) as f:
        cfg = yaml.safe_load(f)
    loss = DiskLoss(cfg["DiskLoss_config"])
    thrs = [loss._reward_config(e)["reward_thr"] for e in range(1, 11)]
    assert thrs[0] == 2.0
    assert abs(thrs[-1] - 0.5) < 1e-9
    diffs = [thrs[i] - thrs[i + 1] for i in range(9)]
    assert all(abs(d - diffs[0]) < 1e-9 for d in diffs)

"""Calibration run for the training-convergence proof (VERDICT #3).

Trains stage 1 (Line2Window + EpipolarLoss) on SyntheticPairs, extracts
on a harder synthetic-HPatches fixture (rotation + scale + illumination
changes), and prints MMA@3px for random init vs trained weights, plus a
stage-2 DiskLoss run with reward trends.

POSFEAT_PLATFORM=cpu python tools/convergence_experiment.py [steps]
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


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
        "in_channels": 128,
        "prior": "identity",
        "act": "Softplus",
    },
    "align_local_grad": False,
    "local_input_elements": ["local_map", "local_map_small"],
    "local_with_img": True,
}

H, W = 96, 128


def make_eval_fixture(root, n_seq=4, n_img=6, seed=77):
    """HPatches-layout eval sequences with rotation/scale + strong
    photometric nuisance (per-channel gain, gamma, noise) — hard enough
    that a random-init CNN's descriptors degrade substantially."""
    import cv2

    from posfeat_tpu.data.synthetic import _texture

    rng = np.random.RandomState(seed)
    for si in range(n_seq):
        kind = "i" if si % 2 == 0 else "v"
        seq = os.path.join(root, f"{kind}_syn{si}")
        os.makedirs(seq, exist_ok=True)
        base = _texture(rng, H, W)
        cv2.imwrite(os.path.join(seq, "1.ppm"), cv2.cvtColor(base, cv2.COLOR_RGB2BGR))
        for ii in range(2, n_img + 1):
            center = (W / 2, H / 2)
            angle = rng.uniform(-20, 20)
            scale = rng.uniform(0.85, 1.15)
            M = cv2.getRotationMatrix2D(center, angle, scale)
            Hm = np.eye(3)
            Hm[:2, :] = M
            Hm[0, 2] += rng.uniform(-8, 8)
            Hm[1, 2] += rng.uniform(-8, 8)
            warped = cv2.warpPerspective(
                base, Hm, (W, H), borderMode=cv2.BORDER_REFLECT
            )
            wf = warped.astype(np.float32) / 255.0
            gain = rng.uniform(0.5, 1.6, size=3)
            gamma = rng.uniform(0.6, 1.6)
            wf = np.clip(wf * gain, 0, 1) ** gamma
            wf = np.clip(wf + rng.randn(H, W, 3) * 0.08, 0, 1)
            warped = (wf * 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(seq, f"{ii}.ppm"),
                cv2.cvtColor(warped, cv2.COLOR_RGB2BGR),
            )
            np.savetxt(os.path.join(seq, f"H_1_{ii}"), Hm)


def train_config(root, stage, steps, load_path=None):
    base = {
        "checkpoint_name": f"conv_{stage}",
        "epoch": 1,
        "epoch_step": steps,
        "lr_decay_step": 10,
        "lr_decay_factor": 0.5,
        "log_freq": max(steps // 4, 1),
        "grad_clip": False,
        "clip_norm": 10.0,
        "optimizer": "Adam",
        "seed": 0,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "SyntheticPairs",
        "data_config_train": {
            "num_pairs": 256,
            "num_scenes": 32,  # 8 geometries per scene: line constraints intersect
            "height": H,
            "width": W,
            "num_pts": 128,
            "batch_size": 4,
            "workers": 4,
            "photometric": True,
        },
        "val_config": None,
        "load_path": load_path,
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
                        "line_step": 50,
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


def extract_and_mma(tag, data_root, work, load_path):
    from posfeat_tpu.extract import Extractor
    from posfeat_tpu.evals import hpatches as hp

    cfg = {
        "output_root": f"hp/{tag}",
        "postfix": "c",
        "load_path": load_path,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "model": "PoSFeat",
        "model_config": MODEL_CONFIG,
        "data": "HPatch_SIFT",
        "data_config_extract": {
            "data_path": data_root,
            "batch_size": 4,
            "workers": 4,
        },
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 512,
            "stable": True,
            "use_nms": True,
            "nms_radius": 1,
            "thr": False,
        },
    }
    Extractor(cfg, ckpt_root=os.path.join(work, "ckpts")).extract()
    errors = hp.benchmark_features(
        hp.generate_read_function(
            os.path.join(work, "ckpts", f"hp/{tag}", "desc"), "c"
        ),
        data_root,
    )
    o, i, v = hp.mma_at(errors, 3, n_i=2, n_v=2)
    return float(o)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    work = tempfile.mkdtemp(prefix="convergence_")
    print("work dir:", work)
    data_root = os.path.join(work, "hp_eval")
    os.makedirs(data_root)
    make_eval_fixture(data_root)

    from posfeat_tpu.train import Trainer

    import time

    mma_rand = extract_and_mma("random", data_root, work, None)
    print(json.dumps({"mma3_random_init": mma_rand}))

    t0 = time.time()
    tr = Trainer(
        train_config(work, "desc", steps), ckpt_root=os.path.join(work, "ckpts")
    )
    tr.train()
    print(f"stage-1 {steps} steps in {time.time() - t0:.1f}s")
    ck1 = os.path.join(work, "ckpts", "conv_desc", "001")
    mma_tr = extract_and_mma("trained", data_root, work, ck1)
    print(json.dumps({"mma3_random_init": mma_rand, "mma3_stage1": mma_tr}))

    # stage 2: head-only DiskLoss; track reward trend
    t0 = time.time()
    st2_steps = max(steps // 2, 50)
    tr2 = Trainer(
        train_config(work, "kp", st2_steps, load_path=ck1),
        ckpt_root=os.path.join(work, "ckpts"),
    )
    tr2.train()
    print(f"stage-2 {st2_steps} steps in {time.time() - t0:.1f}s")
    recs = [
        json.loads(line)
        for line in open(
            os.path.join(work, "ckpts", "conv_kp", "metrics.jsonl")
        )
    ]
    keys = [k for k in recs[0] if "reinforce" in k or "n_" in k or "reward" in k]
    print("stage-2 metric keys:", list(recs[0]))
    first, last = recs[0], recs[-1]
    for k in keys:
        print(f"  {k}: {first.get(k):.4f} -> {last.get(k):.4f}")
    ck2 = os.path.join(work, "ckpts", "conv_kp", "001")
    mma_kp = extract_and_mma("stage2", data_root, work, ck2)
    print(
        json.dumps(
            {
                "mma3_random_init": mma_rand,
                "mma3_stage1": mma_tr,
                "mma3_stage2": mma_kp,
            }
        )
    )


if __name__ == "__main__":
    main()

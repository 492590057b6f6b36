"""Calibration run for the training-convergence proof (VERDICT #3).

Trains stage 1 (Line2Window + EpipolarLoss) on SyntheticPairs, extracts
on a harder synthetic-HPatches fixture (rotation + scale + illumination
changes), and prints MMA@3px for random init vs trained weights, plus a
stage-2 DiskLoss run with reward trends.

POSFEAT_PLATFORM=cpu python tools/convergence_experiment.py [steps] [w_g] [w_w]
(w_g/w_w: EpipolarLoss grid/window weights for the stage-1 run; the
reference recipe is 0/1, but from random init the dense grid term is the
stronger learning signal — the line-search window supervision depends on
already-useful descriptors.)
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

# CONV_MODEL=head192 keeps the CPU-trainable resnet18 encoder but sets
# fine_out_ch=128 so the KeypointDet head gets the FLAGSHIP channel
# shapes (in_channels = 128 fine + 64 stem = 192, Cy=64, Cout=128) —
# the shapes whose lane alignment the Pallas fast paths (im2col, ring)
# are sensitive to. A checkpoint trained with this config makes the
# trained-weights delta-MMA probe exercise the exact flagship head
# programs end to end.
if os.environ.get("CONV_MODEL") == "head192":
    MODEL_CONFIG["backbone_config"]["fine_out_ch"] = 128
    MODEL_CONFIG["localheader_config"]["in_channels"] = 192

H, W = 96, 128


LR1 = float(os.environ.get("CONV_LR1", 1e-4))
N_PAIRS = int(os.environ.get("CONV_PAIRS", 256))
ROT_MAX = float(os.environ.get("CONV_ROT", 30.0))
SCALE_RANGE = (
    1.0 - float(os.environ.get("CONV_SCALE", 0.3)),
    1.0 + float(os.environ.get("CONV_SCALE", 0.3)),
)
PHOTO_STRENGTH = float(os.environ.get("CONV_PHOTO", 1.3))


def make_eval_fixture(root, n_seq=4, n_img=6, seed=77, h=None, w=None):
    """HPatches-layout eval sequences drawn from the SAME nuisance
    distribution SyntheticPairs trains on (rotation, scale, translation,
    per-channel gain + gamma + noise) but with unseen textures — an
    in-distribution generalization probe. The magnitudes are cranked
    high enough (ROT_MAX/SCALE_RANGE/PHOTO_STRENGTH) that a random-init
    CNN's descriptors degrade substantially, leaving headroom for
    training to demonstrate improvement."""
    import cv2

    from posfeat_tpu.data.synthetic import _texture

    # h/w default to the training resolution; the device ΔMMA probe
    # overrides them to the HPatches operating point (480x640, 8192
    # pts) where tail-of-ranking churn is otherwise unmeasured
    fh, fw = h or H, w or W
    rng = np.random.RandomState(seed)
    for si in range(n_seq):
        kind = "i" if si % 2 == 0 else "v"
        seq = os.path.join(root, f"{kind}_syn{si}")
        os.makedirs(seq, exist_ok=True)
        base = _texture(rng, fh, fw)
        cv2.imwrite(os.path.join(seq, "1.ppm"), cv2.cvtColor(base, cv2.COLOR_RGB2BGR))
        for ii in range(2, n_img + 1):
            center = (fw / 2, fh / 2)
            angle = rng.uniform(-ROT_MAX, ROT_MAX)
            scale = rng.uniform(*SCALE_RANGE)
            M = cv2.getRotationMatrix2D(center, angle, scale)
            Hm = np.eye(3)
            Hm[:2, :] = M
            Hm[0, 2] += rng.uniform(-0.05, 0.05) * fw
            Hm[1, 2] += rng.uniform(-0.05, 0.05) * fh
            warped = cv2.warpPerspective(
                base, Hm, (fw, fh), borderMode=cv2.BORDER_REFLECT
            )
            s = PHOTO_STRENGTH
            wf = warped.astype(np.float32) / 255.0
            gain = 1.0 + (rng.uniform(0.5, 1.6, size=3) - 1.0) * s
            gamma = 1.0 + (rng.uniform(0.6, 1.6) - 1.0) * s
            wf = np.clip(wf * gain, 0, 1) ** max(gamma, 0.05)
            wf = np.clip(wf + rng.randn(fh, fw, 3) * 0.08 * s, 0, 1)
            warped = (wf * 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(seq, f"{ii}.ppm"),
                cv2.cvtColor(warped, cv2.COLOR_RGB2BGR),
            )
            np.savetxt(os.path.join(seq, f"H_1_{ii}"), Hm)


# The shipped reference recipe weights are w_g=0, w_w=1 — but it also
# starts from an ImageNet-pretrained encoder (train_desc.yaml pretrained:
# True), which this environment cannot download. From RANDOM init the
# window/line-search supervision is circular (the no-grad line search
# picks window centers using the very descriptors being trained), and
# measured across 7 calibration runs it never moved MMA by more than
# ±0.01. The dense grid term (the same EpipolarLoss_full, weight_grid
# knob) supervises the full correlation map and bootstraps from scratch:
# w_g=1 w_w=1 at 300 steps lifts MMA@3px by +0.029 where w_g=0 gives
# -0.002..+0.012. The convergence PROOF therefore enables both terms.
W_G = 1.0
W_W = 1.0


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
            "num_pairs": N_PAIRS,
            "num_scenes": 32,  # 8 geometries per scene: line constraints intersect
            "height": H,
            "width": W,
            "num_pts": 128,
            "batch_size": 4,
            "workers": 4,
            "photometric": True,
            "rot_max": ROT_MAX,
            "scale_range": SCALE_RANGE,
            "photo_strength": PHOTO_STRENGTH,
        },
        "val_config": None,
        "load_path": load_path,
    }
    if stage == "desc":
        base.update(
            {
                "optimal_modules": ["backbone"],
                "optimal_lrs": [LR1],
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
                    "weight_grid": W_G,
                    "weight_window": W_W,
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


def extract_and_mma(tag, data_root, work, load_path, use_sift=False,
                    num_pts=512, detector_extra=None):
    """use_sift=True is the reference's stage-1 val protocol
    (train_desc.yaml val detector 'sift'): fixed OpenCV-SIFT keypoints +
    our descriptors, isolating descriptor quality from the (untrained in
    stage 1) score head. detector_extra merges extra detector_config
    keys (e.g. {'refine': 'quad'} for the Taylor sub-pixel estimator)."""
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
        "use_sift": use_sift,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": num_pts,
            "stable": True,
            "use_nms": True,
            "nms_radius": 1,
            "thr": False,
            **(detector_extra or {}),
        },
    }
    Extractor(cfg, ckpt_root=os.path.join(work, "ckpts")).extract()
    errors = hp.benchmark_features(
        hp.generate_read_function(
            os.path.join(work, "ckpts", f"hp/{tag}", "desc"), "c"
        ),
        data_root,
    )
    o3, _, _ = hp.mma_at(errors, 3, n_i=2, n_v=2)
    o1, _, _ = hp.mma_at(errors, 1, n_i=2, n_v=2)
    return float(o3), float(o1)


def run(steps=200, work=None):
    """Full two-stage convergence probe; returns the metrics record."""
    from posfeat_tpu.train import Trainer

    import time

    work = work or tempfile.mkdtemp(prefix="convergence_")
    print("work dir:", work)
    data_root = os.path.join(work, "hp_eval")
    os.makedirs(data_root, exist_ok=True)
    make_eval_fixture(data_root)

    # stage-1 metric: SIFT keypoints + our descriptors (the reference's
    # stage-1 val protocol) — the score head is untrained in stage 1, so
    # learned-detector MMA would conflate descriptor progress with
    # random-head drift
    mma_rand, mma1_rand = extract_and_mma(
        "random", data_root, work, None, use_sift=True
    )
    print(json.dumps({"mma3_sift_random_init": mma_rand,
                      "mma1_sift_random_init": mma1_rand}))

    t0 = time.time()
    tr = Trainer(
        train_config(work, "desc", steps), ckpt_root=os.path.join(work, "ckpts")
    )
    tr.train()
    print(f"stage-1 {steps} steps in {time.time() - t0:.1f}s")
    ck1 = os.path.join(work, "ckpts", "conv_desc", "001")
    mma_tr, mma1_tr = extract_and_mma(
        "trained", data_root, work, ck1, use_sift=True
    )
    print(
        json.dumps(
            {"mma3_sift_random_init": mma_rand, "mma3_sift_stage1": mma_tr,
             "mma1_sift_stage1": mma1_tr}
        )
    )
    if os.environ.get("CONV_STAGE1_ONLY") == "1":  # fast calibration loop
        return {
            "mma3_sift_random_init": mma_rand,
            "mma1_sift_random_init": mma1_rand,
            "mma3_sift_stage1": mma_tr,
            "mma1_sift_stage1": mma1_tr,
        }

    # learned-detector baseline at stage 1 (random head) for the
    # stage-2 detector attribution below
    mma_lr1, _ = extract_and_mma("stage1_learned", data_root, work, ck1)
    print(json.dumps({"mma3_learned_stage1": mma_lr1}))

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
    k3 = max(len(recs) // 4, 1)  # average ends of the run (records are noisy)
    head = lambda k: float(np.mean([r[k] for r in recs[:k3]]))  # noqa: E731
    tail = lambda k: float(np.mean([r[k] for r in recs[-k3:]]))  # noqa: E731
    for k in keys:
        print(f"  {k}: {head(k):.4f} -> {tail(k):.4f}")
    ck2 = os.path.join(work, "ckpts", "conv_kp", "001")
    mma_kp, _ = extract_and_mma("stage2", data_root, work, ck2)
    rec = {
        "mma3_sift_random_init": mma_rand,
        "mma1_sift_random_init": mma1_rand,
        "mma3_sift_stage1": mma_tr,
        "mma1_sift_stage1": mma1_tr,
        "mma3_learned_stage1": mma_lr1,
        "mma3_learned_stage2": mma_kp,
        "n_pairs_first": head("n_pairs"),
        "n_pairs_last": tail("n_pairs"),
        "reinforce_first": head("reinforce"),
        "reinforce_last": tail("reinforce"),
    }
    print(json.dumps(rec))
    return rec


def main():
    global W_G, W_W
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    if len(sys.argv) > 2:
        W_G = float(sys.argv[2])
    if len(sys.argv) > 3:
        W_W = float(sys.argv[3])
    print(f"stage-1 loss weights: w_g={W_G} w_w={W_W}")
    run(steps)


if __name__ == "__main__":
    main()

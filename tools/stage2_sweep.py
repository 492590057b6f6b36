"""Stage-2 (detector/REINFORCE) recipe sweep on a fixed stage-1 checkpoint.

VERDICT r2 item #3: close the learned-detector vs SIFT gap on the
synthetic benchmark. Round-3's first sweep (PROOFS.md) found the gap is
a training-budget artifact: ref-faithful 5x200 reaches 0.740 and SGD
5e-3 ("hot5x200") 0.769 vs 0.833 for SIFT keypoints + the same
descriptors. This driver runs the promised second sweep — longer
schedule and reward-shaping variants — as a committed, repeatable tool
(the first sweep was ad-hoc and died with its session).

Usage:
  [CONV_* nuisance envs] python tools/stage2_sweep.py --ckpt1 <stage1-ckpt-dir> \
      [--work DIR] [--variants hot10x200,rt1,kp2]

Each variant trains the head (backbone frozen) from the SAME stage-1
checkpoint on SyntheticPairs, then reports learned-detector MMA@3 at
num_pts 128 and 256, plus the shared SIFT-arm baseline. One JSON line
per result so logs grep clean.
"""
import argparse
import copy
import json
import os
import sys
import tempfile

sys.path[:0] = [
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.path.dirname(os.path.abspath(__file__)),
]

from convergence_experiment import (  # noqa: E402
    extract_and_mma,
    make_eval_fixture,
    train_config,
)


def matched_budget_mma(work, run_name, refine=None):
    """Budget-matched MMA bands for a cell's already-extracted n256
    slates vs the shared sift_arm (tools/budget_matched_eval.py logic —
    the headline learned-vs-SIFT comparison since r4's band
    decomposition). `refine` optionally names a refined n256 extraction
    (e.g. 'quad5') instead of the avg3 one."""
    import glob
    import shutil
    import tempfile

    import numpy as np
    from budget_matched_eval import mma_bands, truncate_dir

    sift_dir = os.path.join(work, "ckpts", "hp", "sift_arm", "desc")
    tag = f"{run_name}_n256" + (f"_{refine}" if refine else "")
    learned_dir = os.path.join(work, "ckpts", "hp", tag, "desc")
    data_root = os.path.join(work, "hp_eval")
    counts = {}
    for f in sorted(glob.glob(os.path.join(sift_dir, "*", "*.c"))):
        rel = os.path.relpath(f, sift_dir)
        counts[rel] = int(np.load(f)["keypoints"].shape[0])
    tmp = tempfile.mkdtemp(prefix="bmatch_")
    try:
        d = os.path.join(tmp, "matched")
        truncate_dir(learned_dir, d, "c", lambda rel: counts[rel])
        return mma_bands(d, "c", data_root)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

# name -> (epochs, steps/epoch, lr, decay_at_epoch, reward_thr, kp_penalty
#          [, reward_thr_final, reward_anneal_epochs])
VARIANTS = {
    # double the hot5x200 budget; decay 0.1 at 80% like the reference's
    # 5-epoch/decay-at-4 shape
    "hot10x200": (10, 200, 5e-3, 8, 2, -0.001),
    # tighter reward: only <1px-consistent pairs count as good
    "rt1": (5, 200, 5e-3, 4, 1, -0.001),
    # stronger keypoint-count penalty
    "kp2": (5, 200, 5e-3, 4, 2, -0.002),
    # combined
    "hot10_rt1_kp2": (10, 200, 5e-3, 8, 1, -0.002),
    # sweep-2 readout: rt1 won (0.799) and the kp_penalty -0.002 in the
    # combined variant dragged it to 0.784 — the untested cell is the
    # longer schedule on PURE rt1
    "hot10_rt1": (10, 200, 5e-3, 8, 1, -0.001),
    # boundary probe of the localization-band hypothesis: does
    # tightening past 1 px keep sharpening the ranking, or starve the
    # reward (few <0.5px-consistent pairs early in training)?
    "rt05": (5, 200, 5e-3, 4, 0.5, -0.001),
    # curriculum probes (losses/disk_loss.py reward annealing): rt05
    # showed 0.5 px starves REINFORCE from scratch, but a detector that
    # ALREADY ranks well under a permissive reward may keep sharpening
    # when the threshold tightens late — start at the known-good band
    # and anneal into the starved one
    "a1to05": (10, 200, 5e-3, 8, 1, -0.001, 0.5, 8),
    "a2to05": (10, 200, 5e-3, 8, 2, -0.001, 0.5, 8),
    # sweep-3 readout: a2to05 (0.8095) beat every fixed threshold while
    # a1to05 (0.780) lost to fixed rt1 — the curriculum must START
    # permissive. The missing cell: end AT the measured 1 px optimum
    # instead of past it.
    "a2to1": (10, 200, 5e-3, 8, 2, -0.001, 1, 8),
    # sweep-4: 1.5x budget for the winning curriculum shape — a longer
    # permissive phase before the same 2->0.5 anneal (decay@12)
    "h15_a2to05": (15, 200, 5e-3, 12, 2, -0.001, 0.5, 12),
    # sweep-4: anneal continuously across the WHOLE schedule instead of
    # front-loading epochs at a fixed start threshold (final thr reached
    # at epoch 1+anneal_epochs = 10)
    "ramp2to05": (10, 200, 5e-3, 8, 2, -0.001, 0.5, 9),
}

# per-variant overrides beyond the positional tuple: (base_variant,
# DiskLoss_config overrides, top-level config overrides). Levers:
# proposal cell size (smaller cells = denser proposals, 4x REINFORCE
# pairs, finer selection granularity) and the PRNG seed (REINFORCE
# trajectories carry real seed-to-seed noise — the r4 trainer-harness
# change shifted single-seed cells by ~0.03 MMA, so replicates gate any
# small-delta conclusion).
EXTRAS = {
    "cell4_a2to05": ("a2to05", {"grid_size": 4}, None),
    "cell4_ramp2to05": ("ramp2to05", {"grid_size": 4}, None),
    "ramp2to05_s1": ("ramp2to05", None, {"seed": 1}),
    "a2to05_s1": ("a2to05", None, {"seed": 1}),
}

# sweep-5 localization cell: the budget-matched band decomposition puts
# the WHOLE SIFT gap below 3 px (learned wins at 5 px), so push the
# anneal endpoint further into the sub-noise band
VARIANTS["a2to025"] = (10, 200, 5e-3, 8, 2, -0.001, 0.25, 8)
VARIANTS["ramp2to025"] = (10, 200, 5e-3, 8, 2, -0.001, 0.25, 9)

# sweep-6 localization lever: the reference's UNUSED continuous reward
# (kploss.py:91-130, exp(-d/tau) shaping) gives REINFORCE a direct
# per-pixel localization gradient instead of the binary threshold the
# band decomposition indicts; tau rides the reward_thr slot (XLA loss
# path — the streaming Pallas kernel covers constant_reward only)
EXTRAS["dyn2"] = ("hot10x200", {"epipolar_reward": "dynamic_reward"}, None)
EXTRAS["dyn1"] = ("hot10_rt1", {"epipolar_reward": "dynamic_reward"}, None)
EXTRAS["dyn2to05"] = ("a2to05", {"epipolar_reward": "dynamic_reward"}, None)

# r5 sweep (VERDICT r4 item 1): TRAINING-side sub-pixel localization on
# the replicated champion recipe. qr = epipolar reward computed at the
# quad-refined sample coordinates (what refine='quad' extraction emits);
# locN = differentiable soft-argmax localization penalty with weight N
# (losses/disk_loss.py reward_at_refined / loc_weight).
EXTRAS["qr_ramp2to05"] = ("ramp2to05", {"reward_at_refined": True}, None)
EXTRAS["loc1_ramp2to05"] = ("ramp2to05", {"loc_weight": 1.0}, None)
EXTRAS["loc10_ramp2to05"] = ("ramp2to05", {"loc_weight": 10.0}, None)
EXTRAS["loc100_ramp2to05"] = ("ramp2to05", {"loc_weight": 100.0}, None)
EXTRAS["qrloc10_ramp2to05"] = (
    "ramp2to05",
    {"reward_at_refined": True, "loc_weight": 10.0},
    None,
)
EXTRAS["loc10t5_ramp2to05"] = (
    "ramp2to05",
    {"loc_weight": 10.0, "loc_temperature": 5.0},
    None,
)
# sweep-B refinements around the loc10 winner (budget-matched 0.8297 /
# 0.8370 with eval quad5 vs champion 0.7989 — the localization term is
# the first training-side lever that moved the matched-budget band)
EXTRAS["loc30_ramp2to05"] = ("ramp2to05", {"loc_weight": 30.0}, None)
EXTRAS["loc10w5_ramp2to05"] = (
    "ramp2to05",
    {"loc_weight": 10.0, "loc_window": 5},
    None,
)


def kp_config(work, name, ck1, epochs, steps, lr, decay_at, rthr, kpen,
              thr_final=None, anneal_epochs=0, disk_extras=None,
              cfg_extras=None):
    cfg = copy.deepcopy(train_config(work, "kp", steps, load_path=ck1))
    cfg["checkpoint_name"] = f"kp_{name}"
    cfg["epoch"] = epochs
    cfg["optimal_lrs"] = [lr]
    cfg["lr_decay_step"] = decay_at
    cfg["lr_decay_factor"] = 0.1
    cfg["DiskLoss_config"]["reward_config"]["reward_thr"] = rthr
    if thr_final is not None:
        cfg["DiskLoss_config"]["reward_config"]["reward_thr_final"] = thr_final
        cfg["DiskLoss_config"]["reward_config"]["reward_anneal_epochs"] = (
            anneal_epochs
        )
    cfg["DiskLoss_config"]["kp_penalty"] = kpen
    cfg["DiskLoss_config"].update(disk_extras or {})
    cfg.update(cfg_extras or {})
    return cfg


def main():
    from posfeat_tpu.train import Trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt1", required=True, help="stage-1 checkpoint dir")
    ap.add_argument("--work", default=None)
    ap.add_argument("--variants", default="hot10x200,rt1,kp2,hot10_rt1_kp2")
    ap.add_argument(
        "--seeds", type=int, default=1,
        help="replicates per variant (seed 0..N-1); REINFORCE cells carry "
        "~±0.03 MMA of single-seed noise (PROOFS.md r4), so any "
        "small-delta ranking needs N>=3",
    )
    args = ap.parse_args()

    work = args.work or tempfile.mkdtemp(prefix="s2sweep_")
    print("work dir:", work, flush=True)
    data_root = os.path.join(work, "hp_eval")
    os.makedirs(data_root, exist_ok=True)
    make_eval_fixture(data_root)

    # shared baseline: SIFT keypoints + the stage-1 descriptors
    sift3, _ = extract_and_mma("sift_arm", data_root, work, args.ckpt1,
                               use_sift=True)
    print(json.dumps({"variant": "sift_arm", "mma3": round(sift3, 4)}),
          flush=True)

    results = {"sift_arm": sift3}
    for name in args.variants.split(","):
        base, extras, cextras = EXTRAS.get(name, (name, None, None))
        epochs, steps, lr, decay_at, rthr, kpen, *anneal = VARIANTS[base]
        rec = {"variant": name, "epochs": epochs, "steps": steps, "lr": lr,
               "reward_thr": rthr, "kp_penalty": kpen, "seeds": args.seeds,
               "sift_arm_mma3": round(sift3, 4)}
        if extras:
            rec["disk_extras"] = extras
        if anneal:
            rec["reward_thr_final"], rec["reward_anneal_epochs"] = anneal
        per_seed = {"mma3_n128": [], "mma3_n256": [], "mma3_n128_quad": [],
                    "mma3_n128_quad5": [], "matched_mma3": [],
                    "matched_mma5": [], "matched_mma3_quad5": []}
        for seed in range(args.seeds):
            import time as _time

            t0 = _time.time()
            ce = dict(cextras or {})
            ce["seed"] = ce.get("seed", 0) + seed
            run_name = name if args.seeds == 1 else f"{name}_s{seed}"
            cfg = kp_config(work, run_name, args.ckpt1, epochs, steps, lr,
                            decay_at, rthr, kpen, *anneal,
                            disk_extras=extras, cfg_extras=ce)
            Trainer(cfg, ckpt_root=os.path.join(work, "ckpts")).train()
            ck2 = os.path.join(work, "ckpts", f"kp_{run_name}",
                               f"{epochs:03d}")
            for n_pts in (128, 256):
                m3, _ = extract_and_mma(
                    f"{run_name}_n{n_pts}", data_root, work, ck2,
                    num_pts=n_pts,
                )
                per_seed[f"mma3_n{n_pts}"].append(round(m3, 4))
            # Taylor sub-pixel refinement arms (ops/detect.py refine=):
            # same checkpoint/selection, sharper eval-time localization
            for rf in ("quad", "quad5"):
                m3q, _ = extract_and_mma(
                    f"{run_name}_n128_{rf}", data_root, work, ck2,
                    num_pts=128, detector_extra={"refine": rf},
                )
                per_seed[f"mma3_n128_{rf}"].append(round(m3q, 4))
            # budget-matched bands (the headline learned-vs-SIFT
            # comparison since the r4 band decomposition), avg3 and
            # quad5-refined n256 slates
            extract_and_mma(
                f"{run_name}_n256_quad5", data_root, work, ck2,
                num_pts=256, detector_extra={"refine": "quad5"},
            )
            mb = matched_budget_mma(work, run_name)
            mbq = matched_budget_mma(work, run_name, refine="quad5")
            per_seed["matched_mma3"].append(mb["mma3"])
            per_seed["matched_mma5"].append(mb["mma5"])
            per_seed["matched_mma3_quad5"].append(mbq["mma3"])
            print(json.dumps({"variant": name, "seed": seed,
                              "secs": round(_time.time() - t0, 1),
                              **{k: v[-1] for k, v in per_seed.items()}}),
                  flush=True)
        import numpy as _np

        for k, vals in per_seed.items():
            if args.seeds == 1:
                rec[k] = vals[0]
            else:
                rec[k] = vals
                rec[f"{k}_mean"] = round(float(_np.mean(vals)), 4)
                rec[f"{k}_std"] = round(float(_np.std(vals)), 4)
        print(json.dumps(rec), flush=True)
        results[name] = rec
    return results


if __name__ == "__main__":
    main()

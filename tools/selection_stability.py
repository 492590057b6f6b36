"""Quantify fast-path selection stability (VERDICT round-1 item #4).

The extraction default on TPU is the bf16 Pallas head; HPatches MMA
depends on *top-k ordering* (putils:249-261), so bf16 rounding could in
principle churn top-k membership vs the f32 XLA program.

Two probes live here:

1. ``trained_probe(ckpt)`` — THE MEANINGFUL MEASUREMENT. Runs the full
   f32-XLA and bf16-Pallas extraction programs through the shipped
   Extractor with TRAINED weights on a synthetic-HPatches fixture and
   reports MMA@3px for both programs (the quantity the 0.5% parity
   budget is written in), plus raw top-k membership overlap and
   mutual-NN match agreement.

2. ``main(n_images, num_pts)`` — the raw-churn diagnostic on RANDOM
   init weights. Measured on v5e (2026-08-17, 16 images, 8192 pts):
   f32-XLA vs bf16-XLA — NO custom kernels anywhere — already shows
   top-k overlap 0.137, because a random-init head produces smooth
   score maps whose top-8192 boundary sits inside a dense band of
   near-equal scores; ANY rounding permutes the boundary. Raw churn on
   random weights therefore measures probe conditioning, not kernel
   quality. Matched-dtype comparisons from the same run:
   bf16-XLA vs bf16-phase 0.740, bf16-XLA vs bf16-Pallas 0.649.
   Use probe 1 to judge the fast path; this one only for diagnostics.

Run on TPU:
  python tools/selection_stability.py --ckpt <dir>     # trained probe
  python tools/selection_stability.py [n_images] [num_pts]  # diagnostic
tests/test_selection_stability.py asserts the trained-probe thresholds.
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from posfeat_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

H, W = 480, 640


# ------------------------------------------------------------------ shared


def _pixel_set(kpts):
    return {tuple(p) for p in np.round(np.asarray(kpts)).astype(int)}


def _match_pairs(k1, d1, k2, d2):
    from posfeat_tpu.ops.matchers import mnn_matcher

    m = mnn_matcher(d1, d2)
    return {
        (tuple(np.round(k1[x]).astype(int)), tuple(np.round(k2[y]).astype(int)))
        for x, y in m
    }


# ------------------------------------------------ probe 1: trained weights


def train_probe_ckpt(work, steps1=200, steps2=100):
    """Train the small two-stage model on SyntheticPairs (CPU-friendly;
    the convergence-experiment recipe) and return the stage-2 checkpoint
    dir. Used by the stability test to self-provision trained weights."""
    from convergence_experiment import train_config

    from posfeat_tpu.train import Trainer

    ckpt_root = os.path.join(work, "ckpts")
    Trainer(train_config(work, "desc", steps1), ckpt_root=ckpt_root).train()
    ck1 = os.path.join(ckpt_root, "conv_desc", "001")
    Trainer(
        train_config(work, "kp", steps2, load_path=ck1), ckpt_root=ckpt_root
    ).train()
    return os.path.join(ckpt_root, "conv_kp", "001")


def trained_probe(ckpt, work=None, num_pts=512):
    """f32-XLA vs bf16-Pallas full-extraction comparison with trained
    weights; returns MMA@3px for both + churn stats (one JSON record)."""
    import shutil
    import tempfile

    from convergence_experiment import MODEL_CONFIG, make_eval_fixture

    from posfeat_tpu.evals import hpatches as hp
    from posfeat_tpu.extract import Extractor

    own_work = work is None
    work = work or tempfile.mkdtemp(prefix="selstab_")
    data_root = os.path.join(work, "hpatches")
    # POSFEAT_PROBE_NPTS raises the detector budget to the HPatches
    # operating point (8192) — only meaningful with a fixture large
    # enough to carry it (POSFEAT_PROBE_H/W=480/640 on device)
    num_pts = int(os.environ.get("POSFEAT_PROBE_NPTS", num_pts))
    if not os.path.isdir(data_root):
        os.makedirs(data_root)
        # POSFEAT_PROBE_SEQS widens the fixture (default 4 sequences x 6
        # images = 24): delta-MMA noise shrinks ~1/sqrt(n), and gate
        # flip decisions ride on ±0.003 at the default size
        make_eval_fixture(
            data_root,
            n_seq=int(os.environ.get("POSFEAT_PROBE_SEQS", "4")),
            h=int(os.environ.get("POSFEAT_PROBE_H", "0")) or None,
            w=int(os.environ.get("POSFEAT_PROBE_W", "0")) or None,
        )

    # Fast-path gates are read from the environment at trace time by
    # code BOTH arms share (detect.py top-k, grid_sample impl), so a
    # gate set for the probe run would otherwise contaminate the f32
    # baseline and the probe would compare variant-vs-variant, reading
    # delta ~0 even for a harmful approximation. Strip all gates for
    # the f32 arm; restore the caller's environment for the bf16 arm.
    GATES = (
        "POSFEAT_TOPK", "POSFEAT_SAMPLE_IMPL", "POSFEAT_HEAD_IM2COL",
        "POSFEAT_HEAD_RING",
    )
    caller_gates = {g: os.environ.get(g) for g in GATES}

    def _set_gates(values):
        for g in GATES:
            if values.get(g) is None:
                os.environ.pop(g, None)
            else:
                os.environ[g] = values[g]

    def run(tag, compute_dtype, head_dataflow):
        _set_gates({} if compute_dtype == "float32" else caller_gates)
        cfg = {
            "output_root": f"hp/{tag}",
            "postfix": "c",
            "load_path": ckpt,
            "loss_distance": "cos",
            "output_desc": True,
            "output_img": False,
            "model": "PoSFeat",
            "model_config": MODEL_CONFIG,
            "data": "HPatch_SIFT",
            "data_config_extract": {
                "data_path": data_root,
                "batch_size": 4,
                "workers": 2,
            },
            "local_thr": 0.99,
            "use_sift": False,
            "compute_dtype": compute_dtype,
            # the probe controls gates itself (_set_gates): fast_mode
            # must not layer the lite set under a single-gate A/B arm
            # (ADVICE r4)
            "fast_mode": False,
            "head_dataflow": head_dataflow,
            "detector": "generate_kpts_single",
            "detector_config": {
                "num_pts": num_pts,
                "stable": True,
                "use_nms": True,
                "nms_radius": 1,
                "thr": False,
            },
        }
        Extractor(cfg, ckpt_root=os.path.join(work, "ckpts")).extract()
        desc_dir = os.path.join(work, "ckpts", f"hp/{tag}", "desc")
        errors = hp.benchmark_features(
            hp.generate_read_function(desc_dir, "c"), data_root
        )
        # sequence-kind counts come from the fixture (make_eval_fixture
        # alternates i_/v_); hardcoding them breaks MMA normalization
        # for any non-default POSFEAT_PROBE_SEQS
        seqs = os.listdir(data_root)
        n_i = sum(1 for s in seqs if s.startswith("i_"))
        n_v = sum(1 for s in seqs if s.startswith("v_"))
        mma3, _, _ = hp.mma_at(errors, 3, n_i=n_i, n_v=n_v)
        return desc_dir, float(mma3)

    # POSFEAT_PROBE_HEAD overrides the bf16 arm's head dataflow:
    # "false" (plain XLA) makes the full-size 480x640 probe CPU-feasible
    # (interpret-Pallas is ~50x too slow there) and isolates the
    # BACKBONE/tail numerics — the descriptor question — from the
    # Pallas selection path, which stays a device-probe concern.
    head = os.environ.get("POSFEAT_PROBE_HEAD", "pallas")
    head = False if head in ("false", "0") else head
    d32, mma32 = run("f32", "float32", False)
    dbf, mmabf = run("bf16", "bfloat16", head)
    _set_gates(caller_gates)  # leave the caller's environment intact

    overlaps, agreements = [], []
    feats = {}
    for root, _, files in os.walk(d32):
        for f in sorted(files):
            if not f.endswith(".c"):
                continue
            rel = os.path.relpath(os.path.join(root, f), d32)
            a = np.load(os.path.join(d32, rel))
            b = np.load(os.path.join(dbf, rel))
            ka, kb = _pixel_set(a["keypoints"]), _pixel_set(b["keypoints"])
            overlaps.append(len(ka & kb) / max(len(ka), len(kb)))
            feats[rel] = (a, b)

    keys = sorted(feats)
    for i in range(len(keys) - 1):
        if os.path.dirname(keys[i]) != os.path.dirname(keys[i + 1]):
            continue
        a1, b1 = feats[keys[i]]
        a2, b2 = feats[keys[i + 1]]
        pa = _match_pairs(
            a1["keypoints"], a1["descriptors"], a2["keypoints"], a2["descriptors"]
        )
        pb = _match_pairs(
            b1["keypoints"], b1["descriptors"], b2["keypoints"], b2["descriptors"]
        )
        agreements.append(len(pa & pb) / max(len(pa), 1))

    rec = {
        "mma3_f32_xla": round(mma32, 5),
        "mma3_bf16_pallas": round(mmabf, 5),
        "delta_mma3": round(mmabf - mma32, 5),
        "topk_overlap_mean": round(float(np.mean(overlaps)), 5),
        "topk_overlap_min": round(float(np.min(overlaps)), 5),
        "match_agreement_mean": round(float(np.mean(agreements)), 5),
        "n_images": len(overlaps),
        "num_pts": num_pts,
        "tail_f32": os.environ.get("POSFEAT_DESC_TAIL_F32", ""),
        "bf16_head": str(head),
    }
    print(json.dumps(rec))
    if own_work:
        shutil.rmtree(work, ignore_errors=True)
    return rec


# --------------------------------------- probe 2: random-init diagnostic


def build_program(dtype, head_mode):
    import copy

    from __graft_entry__ import FLAGSHIP_MODEL_CONFIG
    from posfeat_tpu.models import PoSFeat
    from posfeat_tpu.ops.coords import denormalize_coords
    from posfeat_tpu.ops.detect import generate_kpts_single
    from posfeat_tpu.ops.grid_sample import sample_feat_by_coord

    cfg = copy.deepcopy(FLAGSHIP_MODEL_CONFIG)
    cfg["localheader_config"]["fused_upsample"] = head_mode
    model = PoSFeat(cfg, dtype=dtype)

    def run(variables, im, num_pts):
        outputs = model.extract(variables, im, train=False)
        coord_n, score, valid = generate_kpts_single(
            outputs["local_point"],
            num_pts=num_pts,
            nms_radius=1,
            use_nms=True,
            thr=0.9,
            thr_mod="abs",
        )
        feat = sample_feat_by_coord(outputs["local_map"], coord_n, norm=True)
        coords = denormalize_coords(coord_n, H, W)
        return coords, score, feat, valid

    return model, jax.jit(run, static_argnames=("num_pts",))


def textured_images(n):
    from posfeat_tpu.data.synthetic import _texture
    from posfeat_tpu.data.utils import normalize_image

    rng = np.random.RandomState(11)
    return np.stack(
        [normalize_image(_texture(rng, H, W)) for _ in range(n)]
    ).astype(np.float32)


def main(n_images=16, num_pts=8192):
    """Random-init raw-churn diagnostic — see module docstring for why
    this does NOT measure kernel quality (dtype alone churns it)."""
    model_f32, run_f32 = build_program(jnp.float32, False)
    model_bf16, run_bf16 = build_program(jnp.bfloat16, "pallas")
    variables = model_f32.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3))

    ims = textured_images(n_images)
    feats = {"f32": [], "bf16": []}
    overlaps = []
    for i in range(n_images):
        im = jnp.asarray(ims[i : i + 1])
        out = {}
        for tag, run in (("f32", run_f32), ("bf16", run_bf16)):
            im_c = im if tag == "f32" else im.astype(jnp.bfloat16)
            coords, score, feat, valid = run(variables, im_c, num_pts)
            n = int(max(min(num_pts, int(valid[0])), 128))
            kp = np.asarray(coords, np.float32)[0, :n]
            de = np.asarray(feat, np.float32)[0, :n]
            out[tag] = (kp, de)
            feats[tag].append((kp, de))
        a = _pixel_set(out["f32"][0])
        b = _pixel_set(out["bf16"][0])
        overlaps.append(len(a & b) / max(len(a), len(b)))

    agreements = []
    for i in range(n_images - 1):
        k1a, d1a = feats["f32"][i]
        k2a, d2a = feats["f32"][i + 1]
        k1b, d1b = feats["bf16"][i]
        k2b, d2b = feats["bf16"][i + 1]
        pa = _match_pairs(k1a, d1a, k2a, d2a)
        pb = _match_pairs(k1b, d1b, k2b, d2b)
        agreements.append(len(pa & pb) / max(len(pa), 1))

    rec = {
        "n_images": n_images,
        "num_pts": num_pts,
        "topk_overlap_mean": round(float(np.mean(overlaps)), 5),
        "topk_overlap_min": round(float(np.min(overlaps)), 5),
        "match_agreement_mean": round(float(np.mean(agreements)), 5),
        "match_agreement_min": round(float(np.min(agreements)), 5),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    if "--train-ckpt" in sys.argv:
        # helper for the stability test: provision trained weights on CPU
        work = sys.argv[sys.argv.index("--train-ckpt") + 1]
        print(train_probe_ckpt(work))
    elif "--ckpt" in sys.argv:
        trained_probe(sys.argv[sys.argv.index("--ckpt") + 1])
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
        p = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
        main(n, p)

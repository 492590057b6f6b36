"""Quantify fast-path selection stability (VERDICT round-1 item #4).

The extraction default on TPU is the bf16 Pallas head; HPatches MMA
depends on *top-k ordering* (putils:249-261), so bf16 rounding could
churn top-k membership vs the f32 XLA program even when score values
match to ~1e-2. This tool runs BOTH full extraction programs on the
same textured images and reports:
  - per-image top-k membership overlap (keypoints rounded to the pixel
    grid; overlap = |A∩B| / max(|A|, |B|))
  - match-level agreement: mutual-NN matches between consecutive image
    pairs computed from each program's (kpts, descs); agreement = the
    fraction of f32-program matches reproduced (same pixel pair) by the
    bf16 program.

Run on TPU: python tools/selection_stability.py [n_images] [num_pts]
Prints one JSON line; tests/test_selection_stability.py asserts the
thresholds.
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from posfeat_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

H, W = 480, 640


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


def mnn(d1, d2):
    from posfeat_tpu.ops.matchers import mnn_matcher

    return mnn_matcher(d1, d2)


def main(n_images=16, num_pts=8192):
    from posfeat_tpu.models import PoSFeat  # noqa: F401 (import order)

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
        a = {tuple(p) for p in np.round(out["f32"][0]).astype(int)}
        b = {tuple(p) for p in np.round(out["bf16"][0]).astype(int)}
        overlaps.append(len(a & b) / max(len(a), len(b)))

    agreements = []
    for i in range(n_images - 1):
        k1a, d1a = feats["f32"][i]
        k2a, d2a = feats["f32"][i + 1]
        k1b, d1b = feats["bf16"][i]
        k2b, d2b = feats["bf16"][i + 1]
        ma = mnn(d1a, d2a)
        mb = mnn(d1b, d2b)
        pa = {
            (tuple(np.round(k1a[x]).astype(int)), tuple(np.round(k2a[y]).astype(int)))
            for x, y in ma
        }
        pb = {
            (tuple(np.round(k1b[x]).astype(int)), tuple(np.round(k2b[y]).astype(int)))
            for x, y in mb
        }
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    main(n, p)

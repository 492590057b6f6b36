"""Budget-matched learned-vs-SIFT detector comparison on extracted slates.

VERDICT r2 item #3 follow-up. The stage-2 sweep (tools/stage2_sweep.py,
PROOFS.md) compares the learned detector at the extractor's contractual
128-point floor (reference putils:249-261) against OpenCV-SIFT's
*natural* keypoint count (~70-80/img on the synthetic fixture), so the
reported gap mixes detector quality with keypoint DENSITY: on small
fixtures MMA falls as the budget grows (each extra keypoint dilutes the
top of the ranking). This tool removes the density term post-hoc:

  1. per-image matched budget — truncate the learned slates (which are
     score-descending by the extractor's top-k contract) to exactly the
     SIFT arm's natural count for the SAME image, then re-run the MMA
     harness; this is the like-for-like detector comparison;
  2. a fixed-budget ladder (n in --ladder) that measures the density
     slope directly instead of inferring it from two points.

Works on any pair of desc dirs produced by `Extractor` (npz triples
`keypoints/scores/descriptors`, reference extractor.py:254-271 format).
Usage:
  python tools/budget_matched_eval.py --learned <desc-dir> \
      --sift <desc-dir> --data <fixture-root> [--postfix c] \
      [--ladder 64,96,128]

Prints one JSON line per eval so logs grep clean.
"""
import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def truncate_dir(src, dst, postfix, n_for):
    """Copy src desc dir to dst, truncating each slate to n_for(relpath).

    Slates are score-descending (extractor top-k contract), so row
    truncation == keeping the top-n keypoints.
    """
    for f in sorted(glob.glob(os.path.join(src, "*", f"*.{postfix}"))):
        rel = os.path.relpath(f, src)
        z = np.load(f)
        n = min(n_for(rel), z["keypoints"].shape[0])
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez(
            open(out, "wb"),
            keypoints=z["keypoints"][:n],
            scores=z["scores"][:n],
            descriptors=z["descriptors"][:n],
        )


def mma_bands(desc_dir, postfix, data_root, thrs=(1, 2, 3, 5)):
    """MMA at several px thresholds — the localization-band
    decomposition: gap concentrated at tight thresholds = sub-pixel
    localization; gap surviving at loose ones = match coverage/ranking."""
    from posfeat_tpu.evals import hpatches as hp

    seqs = sorted(os.listdir(data_root))
    n_i = sum(s.startswith("i_") for s in seqs)
    n_v = sum(s.startswith("v_") for s in seqs)
    errors = hp.benchmark_features(
        hp.generate_read_function(desc_dir, postfix), data_root
    )
    return {
        f"mma{t}": round(float(hp.mma_at(errors, t, n_i=n_i, n_v=n_v)[0]), 4)
        for t in thrs
    }


def mma3(desc_dir, postfix, data_root):
    return mma_bands(desc_dir, postfix, data_root, thrs=(3,))["mma3"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--learned", required=True, help="learned desc dir")
    ap.add_argument("--sift", required=True, help="SIFT-arm desc dir")
    ap.add_argument("--data", required=True, help="fixture root")
    ap.add_argument("--postfix", default="c")
    ap.add_argument("--ladder", default="64,96,128")
    args = ap.parse_args()

    sift_counts = {}
    for f in sorted(glob.glob(os.path.join(args.sift, "*", f"*.{args.postfix}"))):
        rel = os.path.relpath(f, args.sift)
        sift_counts[rel] = int(np.load(f)["keypoints"].shape[0])
    mean_n = float(np.mean(list(sift_counts.values())))

    print(json.dumps({"eval": "sift_arm", "mean_kpts": round(mean_n, 1),
                      **mma_bands(args.sift, args.postfix, args.data)}),
          flush=True)

    work = tempfile.mkdtemp(prefix="bmatch_")
    try:
        # per-image matched budget (the headline comparison)
        d = os.path.join(work, "matched")
        truncate_dir(args.learned, d, args.postfix,
                     lambda rel: sift_counts[rel])
        print(json.dumps({"eval": "learned_matched_budget",
                          "mean_kpts": round(mean_n, 1),
                          **mma_bands(d, args.postfix, args.data)}),
              flush=True)
        # fixed-budget ladder (density slope)
        for n in (int(x) for x in args.ladder.split(",") if x):
            d = os.path.join(work, f"n{n}")
            truncate_dir(args.learned, d, args.postfix, lambda rel: n)
            print(json.dumps({"eval": f"learned_n{n}",
                              "mma3": round(mma3(d, args.postfix, args.data), 4)}),
                  flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

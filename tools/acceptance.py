"""One-command HPatches parity acceptance (VERDICT r3 item 8).

Given real assets — an HPatches sequences directory and a reference
PoSFeat torch run dir (backbone.pth + localheader.pth) or an
already-converted msgpack checkpoint dir — this runs the full
environment-blocked parity chain in one shot:

  1. torch-weight import (posfeat_tpu.core.torch_import), skipped when
     the checkpoint dir already holds backbone.msgpack;
  2. HPatches feature extraction with the shipped
     configs/extract_hpatches.yaml operating point (8192 pts, SIFT off);
  3. MMA evaluation vs the published PoSFeat_CVPR cache
     (reference evaluations/hpatches/cache/PoSFeat_CVPR.npy,
     evaluation.py:140-179), printing PASS/FAIL against the BASELINE.md
     bar: MMA@3 within --bar (default 0.005) of the reference cache.

Usage:
  python tools/acceptance.py \
      --hpatches /data/hpatches/hpatches-sequences-release \
      --weights /path/to/PoSFeat_run_dir_or_msgpack_dir \
      [--ref_cache /root/reference/evaluations/hpatches/cache/PoSFeat_CVPR.npy] \
      [--work ./acceptance_run] [--bar 0.005] [--fast]

--fast applies the device-certified bf16 recipe (compute_dtype bfloat16
+ POSFEAT_FAST lite gate set, PROOFS.md "Device-certified") so the
acceptance run also certifies the shipping fast path.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--hpatches", required=True,
                   help="hpatches-sequences-release directory")
    p.add_argument("--weights", required=True,
                   help="torch run dir (*.pth) or msgpack checkpoint dir")
    p.add_argument(
        "--ref_cache",
        default="/root/reference/evaluations/hpatches/cache/PoSFeat_CVPR.npy",
        help="published reference error cache to compare against",
    )
    p.add_argument("--work", default="./acceptance_run")
    p.add_argument("--bar", type=float, default=0.005,
                   help="allowed MMA@3 deficit vs the reference cache")
    p.add_argument("--fast", action="store_true",
                   help="use the certified bf16 fast recipe")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args()

    if args.fast:
        # the certified lite gate set must be in the environment before
        # jax-side modules trace anything
        os.environ.setdefault("POSFEAT_FAST", "1")

    from posfeat_tpu.core.config import load_config
    from posfeat_tpu.evals import hpatches as hp

    work = os.path.abspath(args.work)
    os.makedirs(work, exist_ok=True)

    # ---- 1. weights -----------------------------------------------------
    ckpt_dir = os.path.abspath(args.weights)
    if not glob.glob(os.path.join(ckpt_dir, "backbone.msgpack")):
        if not glob.glob(os.path.join(ckpt_dir, "*.pth")):
            sys.exit(f"{ckpt_dir}: neither backbone.msgpack nor *.pth found")
        from posfeat_tpu.core.torch_import import import_posfeat_checkpoint

        out = os.path.join(work, "ckpt")
        print(f"[acceptance] importing torch checkpoint {ckpt_dir} -> {out}")
        import_posfeat_checkpoint(ckpt_dir, out)
        ckpt_dir = out
    else:
        print(f"[acceptance] using msgpack checkpoint {ckpt_dir}")

    # ---- 2. extraction --------------------------------------------------
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "extract_hpatches.yaml"
    )
    cfg = load_config(cfg_path)
    method = cfg["postfix"]
    cfg["load_path"] = ckpt_dir
    cfg["output_root"] = "hpatches_acceptance"
    cfg["resume"] = True
    cfg["data_config_extract"]["data_path"] = args.hpatches
    cfg["data_config_extract"]["batch_size"] = args.batch_size
    if args.fast:
        cfg["compute_dtype"] = "bfloat16"

    from posfeat_tpu.extract import Extractor

    extractor = Extractor(cfg, ckpt_root=work)
    features_path = extractor.desc_root
    n_seqs = len([
        d for d in os.listdir(args.hpatches)
        if os.path.isdir(os.path.join(args.hpatches, d))
    ])
    done = os.path.isdir(features_path) and len(
        glob.glob(os.path.join(features_path, "*", f"*.{method}"))
    ) >= 6 * n_seqs
    if done:
        print(f"[acceptance] features already extracted in {features_path}")
    else:
        extractor.extract()

    # ---- 3. evaluation vs reference cache -------------------------------
    cache_dir = os.path.join(work, "eval_cache")
    errors = hp.evaluate_method(
        args.hpatches, features_path, method, cache_dir=cache_dir
    )
    ours3 = hp.mma_at(errors, 3)[0]
    ours_score = hp.mma_score(errors)[0]
    print(hp.summary_line("PoSFeat_tpu", errors))

    result = {
        "mma3": round(float(ours3), 4),
        "mma_score": round(float(ours_score), 4),
        "bar": args.bar,
        "fast": bool(args.fast),
    }
    if os.path.exists(args.ref_cache):
        ref = hp.load_reference_cache(args.ref_cache)
        ref3 = hp.mma_at(ref, 3)[0]
        print(hp.summary_line("PoSFeat_CVPR (cache)", ref))
        delta = float(ours3 - ref3)
        ok = delta >= -args.bar
        result.update(
            ref_mma3=round(float(ref3), 4), delta_mma3=round(delta, 4),
            passed=ok,
        )
        print(json.dumps(result))
        print(f"[acceptance] MMA@3 {ours3:.4f} vs reference {ref3:.4f} "
              f"(delta {delta:+.4f}, bar -{args.bar}) -> "
              f"{'PASS' if ok else 'FAIL'}")
        sys.exit(0 if ok else 2)
    else:
        result.update(ref_mma3=None, passed=None)
        print(json.dumps(result))
        print(f"[acceptance] reference cache {args.ref_cache} not found — "
              "reporting absolute numbers only")


if __name__ == "__main__":
    main()

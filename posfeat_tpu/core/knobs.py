"""Trace-time environment knobs.

Several fast-path/numerics toggles (top-k impl, refinement mode,
sampling impl/precision, fused-head variants, descriptor dtype) are
read from the environment at Python TRACE time inside functions that
are later cached by ``jax.jit`` and by ``Extractor._jit_cache``.
Changing such a knob after a program has been traced would silently
keep the old behavior for already-compiled shapes.

``trace_knob_key()`` snapshots every knob that can alter a traced
program; cache keys that include it retrace automatically when a knob
changes mid-process.
"""

import os
from typing import Tuple

# every env var whose value is baked into a traced program somewhere in
# posfeat_tpu (ops/detect.py, ops/grid_sample.py, ops/pallas/fused_head.py,
# models/resunet.py). Keep in sync when adding knobs.
TRACE_KNOBS = (
    "POSFEAT_TOPK",
    "POSFEAT_SAMPLE_IMPL",
    "POSFEAT_SAMPLE_F32",
    "POSFEAT_DESC_F32",
    "POSFEAT_DESC_TAIL_F32",
    "POSFEAT_SCORE_F32",
    "POSFEAT_DECODER_ACCUM",
    "POSFEAT_HEAD_MODE",
    "POSFEAT_HEAD_IM2COL",
    "POSFEAT_HEAD_RING",
)
# r5 perf experiments, dispositioned by device A/B (PROOFS.md "Round-5
# perf campaign"): concat-free skip iconvs (POSFEAT_SPLITCAT) measured
# +0.6 im/s twice with equal-or-better numerics and became the bf16
# DEFAULT (no knob); layer-1 1x1-as-matmul (POSFEAT_MM1X1) measured
# 247.4 vs 278.6 and was retired to git history.
# Retired in r5 (VERDICT item 6 — promote decided knobs out of the env):
#   POSFEAT_TOPK_RECALL  -> detector_config `topk_recall` kwarg
#   POSFEAT_HEAD_STATS   -> fused_head_tail(img_stats=) kwarg, default
#                           'gram' (the certified r4 winner)
#   POSFEAT_HEAD_TRIPLE  -> fused_head_tail(triple=) kwarg (uncertified
#                           study path, parity-tested)
#   POSFEAT_HEAD_T1/T2   -> constants (8,32)/(8,32) — the microbench
#                           winner, unmoved across three rounds


def trace_knob_key() -> Tuple[Tuple[str, str], ...]:
    """Hashable snapshot of all trace-time knobs (unset ones excluded)."""
    return tuple(
        (k, os.environ[k]) for k in TRACE_KNOBS if k in os.environ
    )

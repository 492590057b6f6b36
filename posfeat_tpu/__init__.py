"""posfeat_tpu — TPU-native weakly-supervised local-feature framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PoSFeat
("Decoupling Makes Weakly Supervised Local Feature Better", CVPR 2022,
reference: /root/reference). Provides:

  * dense-descriptor U-Net backbone + keypoint score head (flax, NHWC, bf16)
  * stage-1 epipolar descriptor training (line-search + windowed soft-argmax)
  * stage-2 DISK-style REINFORCE detector training
  * feature extraction (NMS + top-k + descriptor sampling) with npz/h5 export
  * HPatches / Aachen / ETH evaluation harnesses
  * data-parallel training/extraction over a jax.sharding.Mesh
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("POSFEAT_FAST") == "1":
    # One-switch certified fast mode: the "lite" gate set, device-
    # certified 2026-08-19 on v5e at 255-259 im/s with ΔMMA@3 −0.0005
    # at the HPatches operating point (PROOFS.md, RUNBOOK_EVIDENCE.md).
    # Individual knobs still win if set explicitly; trace_knob_key()
    # sees the resolved values, so jit caches stay consistent.
    for _k, _v in (
        ("POSFEAT_SAMPLE_IMPL", "quad"),
        ("POSFEAT_TOPK", "approx"),
        ("POSFEAT_HEAD_RING", "0"),
        ("POSFEAT_HEAD_IM2COL", "1"),
    ):
        _os.environ.setdefault(_k, _v)

if _os.environ.get("POSFEAT_PLATFORM"):
    # Explicit platform override (e.g. POSFEAT_PLATFORM=cpu for host-side
    # runs of the CLIs). Needed because site hooks may select the TPU
    # platform programmatically, which overrides JAX_PLATFORMS.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["POSFEAT_PLATFORM"])

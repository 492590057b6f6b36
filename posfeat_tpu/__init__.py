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

if _os.environ.get("POSFEAT_PLATFORM"):
    # Explicit platform override (e.g. POSFEAT_PLATFORM=cpu for host-side
    # runs of the CLIs). Needed because site hooks may select the TPU
    # platform programmatically, which overrides JAX_PLATFORMS.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["POSFEAT_PLATFORM"])

"""Single-image extraction datasets: HPatches, Aachen Day-Night, ETH-LFB.

Reference: datasets/hpatches.py, aachen.py, ETH_local_feature.py. Each
yields {'im1': normalized f32 HWC, 'im1_ori': uint8 HWC, 'coord1': SIFT
[N, 2], 'name1': str, 'pad1': (0,0,0,0)} after the %16 crop.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np

from .utils import crop_mod16, normalize_image, sift_keypoints


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if im is None:
        raise FileNotFoundError(path)
    if im.ndim == 2:
        return cv2.cvtColor(im, cv2.COLOR_GRAY2RGB)
    if im.shape[2] == 4:
        return cv2.cvtColor(im, cv2.COLOR_BGRA2RGB)
    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


class _SingleImageDataset:
    """Common loader: crop %16, ImageNet-normalize, SIFT keypoints."""

    def __init__(self, configs: Dict):
        self.configs = configs
        # host-side SIFT is only needed by the use_sift passthrough path;
        # the learned-detector path sets compute_sift False to keep it off
        # the extraction hot loop (reference runs it unconditionally,
        # hpatches.py:39-42 — pure host waste there)
        self.compute_sift = bool(configs.get("compute_sift", True))
        # the batched extractor normalizes on device (uint8 ships over
        # the host->device link at 1/4 the bytes of normalized f32);
        # compute_normalize=False skips the redundant host normalize
        self.compute_normalize = bool(configs.get("compute_normalize", True))
        self.imfs = self._glob_images(configs)
        # multi-host extraction: shard the image list (the reference's
        # DistributedSampler analog, extractor.py:95-98 / SURVEY §5) —
        # host i of n processes images i, i+n, i+2n, ...
        n_shards = int(configs.get("num_shards", 1))
        shard = int(configs.get("shard_index", 0))
        if n_shards > 1:
            self.imfs = self.imfs[shard::n_shards]

    def _glob_images(self, configs):  # pragma: no cover - overridden
        raise NotImplementedError

    def _name(self, imf: str) -> str:  # pragma: no cover - overridden
        raise NotImplementedError

    def __len__(self):
        return len(self.imfs)

    def __getitem__(self, item: int) -> Dict:
        from .native import normalize_crop16

        imf = self.imfs[item]
        im = _imread_rgb(imf)
        im = crop_mod16(im)
        coord = (
            sift_keypoints(im)
            if self.compute_sift
            else np.zeros((0, 2), np.float32)
        )
        return {
            # fused native crop+normalize (numpy fallback built in)
            "im1": normalize_crop16(im) if self.compute_normalize else None,
            "im1_ori": im,
            "coord1": coord,
            "name1": self._name(imf),
            "pad1": (0, 0, 0, 0),
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class HPatch_SIFT(_SingleImageDataset):
    """hpatches-sequences-release: */*.ppm (reference hpatches.py:10-47)."""

    def _glob_images(self, configs):
        return sorted(glob.glob(os.path.join(configs["data_path"], "*", "*.ppm")))

    def _name(self, imf):
        return "/".join(imf.split("/")[-2:])


class Aachen_Day_Night(_SingleImageDataset):
    """Aachen images_upright db/query/sequences (reference aachen.py:10-65)."""

    def _glob_images(self, configs):
        root = configs["data_path"]
        imfs = glob.glob(os.path.join(root, "db", "*.jpg"))
        imfs += glob.glob(os.path.join(root, "query", "*", "*", "*.jpg"))
        imfs += glob.glob(os.path.join(root, "sequences", "gopro3_undistorted", "*.png"))
        imfs += glob.glob(
            os.path.join(root, "sequences", "nexus4_sequences", "*", "*.png")
        )
        return sorted(imfs)

    def _name(self, imf):
        parts = imf.split("/")
        if "db" in parts:
            return "/".join(parts[-2:])
        if "query" in parts:
            return "/".join(parts[-4:])
        if "gopro3_undistorted" in parts:
            return "/".join(parts[-3:])
        if "nexus4_sequences" in parts:
            return "/".join(parts[-4:])
        return "/".join(parts[-2:])


class ETH_LFB(_SingleImageDataset):
    """ETH local-feature-benchmark scene (reference ETH_local_feature.py)."""

    def _glob_images(self, configs):
        return sorted(
            glob.glob(
                os.path.join(configs["data_path"], configs["subfolder"], "images", "*")
            )
        )

    def _name(self, imf):
        return "{}/{}".format(self.configs["subfolder"], os.path.basename(imf))

"""Synthetic geometric image pairs for tests and benchmarking.

Generates textured images related by a random homography H and emits
geometrically *valid* fundamental matrices: for a planar scene any
F = [e']x H satisfies x2^T F x1 = 0 for all correspondences, so the
epipolar losses have real signal without MegaDepth on disk.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from . import utils as dutils


def _texture(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Smooth random RGB texture with local contrast (SIFT-detectable)."""
    import cv2

    base = rng.rand(h // 8, w // 8, 3).astype(np.float32)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    noise = rng.rand(h, w, 3).astype(np.float32) * 0.15
    img = np.clip(img + noise, 0, 1)
    return (img * 255).astype(np.uint8)


class SyntheticPairs:
    """Drop-in replacement for MegaDepth_SIFT on synthetic data.

    configs: {num_pairs, height, width, num_pts, random_percent?,
    photometric?, num_scenes?}. `photometric: True` applies per-channel
    gain + gamma + noise to im2 (the ColorJitter analog,
    megadepth.py:259-265) so descriptor training must learn appearance
    invariance — without it a random-init CNN already matches identical
    textures. `num_scenes: K` reuses K base textures across the pairs so
    each scene is observed under num_pairs/K different epipolar
    geometries — epipolar supervision only pins the true correspondence
    at the intersection of several line constraints (MegaDepth gives
    this for free; one-geometry-per-texture data lets the loss be gamed
    by aligning similarity ridges along each pair's single line).
    """

    def __init__(self, configs: Dict, is_train: bool = True):
        self.configs = configs
        self.is_train = is_train
        self.n = int(configs.get("num_pairs", 64))
        self.h = int(configs.get("height", 240))
        self.w = int(configs.get("width", 320))
        self.photometric = bool(configs.get("photometric", False))
        self.num_scenes = int(configs.get("num_scenes", 0))  # 0: 1 per pair
        # nuisance magnitudes (defaults match the original mild recipe)
        self.rot_max = float(configs.get("rot_max", 15.0))
        self.scale_lo, self.scale_hi = configs.get("scale_range", (0.9, 1.1))
        self.photo_strength = float(configs.get("photo_strength", 1.0))

    def __len__(self):
        return self.n

    def __getitem__(self, item: int) -> Dict:
        import cv2

        rng = np.random.RandomState(1000 + item)
        h, w = self.h, self.w
        if self.num_scenes:
            tex_rng = np.random.RandomState(2000 + item % self.num_scenes)
            im1 = _texture(tex_rng, h, w)
        else:
            im1 = _texture(rng, h, w)

        # random homography: mild perspective + rotation + translation
        center = np.array([w / 2, h / 2])
        angle = rng.uniform(-self.rot_max, self.rot_max)
        scale = rng.uniform(self.scale_lo, self.scale_hi)
        M = cv2.getRotationMatrix2D(tuple(center), angle, scale)
        H = np.eye(3)
        H[:2, :] = M
        H[0, 2] += rng.uniform(-0.05, 0.05) * w
        H[1, 2] += rng.uniform(-0.05, 0.05) * h
        H[2, 0] = rng.uniform(-1e-4, 1e-4)
        H[2, 1] = rng.uniform(-1e-4, 1e-4)
        im2 = cv2.warpPerspective(im1, H, (w, h), borderMode=cv2.BORDER_REFLECT)
        if self.photometric:
            s = self.photo_strength
            wf = im2.astype(np.float32) / 255.0
            gain = 1.0 + (rng.uniform(0.5, 1.6, size=3) - 1.0) * s
            gamma = 1.0 + (rng.uniform(0.6, 1.6) - 1.0) * s
            wf = np.clip(wf * gain, 0, 1) ** max(gamma, 0.05)
            wf = np.clip(wf + rng.randn(h, w, 3) * 0.08 * s, 0, 1)
            im2 = (wf * 255).astype(np.uint8)

        # valid F for the planar scene: F = [e2]x H  (and F2 = [e1]x H^-1)
        e2 = rng.randn(3)
        e2[2] = abs(e2[2]) + 0.5
        F1 = dutils.skew(e2) @ H
        e1 = rng.randn(3)
        e1[2] = abs(e1[2]) + 0.5
        F2 = dutils.skew(e1) @ np.linalg.inv(H)
        F1 = (F1 / (F1[-1, -1] + 1e-10)).astype(np.float32)
        F2 = (F2 / (F2[-1, -1] + 1e-10)).astype(np.float32)

        num_pts = int(self.configs.get("num_pts", 256))
        kx = rng.rand(num_pts) * (w - 1)
        ky = rng.rand(num_pts) * (h - 1)
        coord1 = np.stack((kx, ky, np.zeros_like(kx)), axis=-1).astype(np.float32)
        kx2 = rng.rand(num_pts) * (w - 1)
        ky2 = rng.rand(num_pts) * (h - 1)
        coord2 = np.stack((kx2, ky2, np.zeros_like(kx2)), axis=-1).astype(np.float32)

        K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
        return {
            "im1": dutils.normalize_image(im1),
            "im2": dutils.normalize_image(im2),
            "im1_ori": im1,
            "im2_ori": im2,
            "pose1": np.eye(3, 4, dtype=np.float32),
            "pose2": np.eye(3, 4, dtype=np.float32),
            "F1": F1,
            "F2": F2,
            "intrinsic1": K,
            "intrinsic2": K,
            "coord1": coord1,
            "coord2": coord2,
            "name1": f"synthetic/{item}_1",
            "name2": f"synthetic/{item}_2",
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

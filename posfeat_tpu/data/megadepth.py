"""MegaDepth (CAPS subset) training pairs with pose-derived fundamental
matrices — reference datasets/megadepth.py:255-513 (MegaDepth_SIFT, the
only functional variant and the one used by both shipped train configs).

All geometry is host-side numpy; images are ImageNet-normalized f32 HWC.
Samples that fail the rotation/keypoint filters return None (the loader
skips them, like the reference my_collate, trainer.py:147-150).
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Dict, List, Optional

import numpy as np

from . import utils as dutils

Image = collections.namedtuple(
    "Image", ["name", "w", "h", "fx", "fy", "cx", "cy", "rvec", "tvec"]
)


class MegaDepth_SIFT:
    def __init__(self, configs: Dict, is_train: bool = True):
        self.configs = configs
        self.is_train = is_train
        self.root = configs["data_path"]
        self.images = self._read_img_cam()
        self.imf1s, self.imf2s = self._read_pairs()
        print(f"total number of image pairs loaded: {len(self.imf1s)}")
        rand = np.random.RandomState(234)
        index = np.arange(len(self.imf1s))
        rand.shuffle(index)
        self.imf1s = [self.imf1s[i] for i in index]
        self.imf2s = [self.imf2s[i] for i in index]

    # --------------------------------------------------------- scanning

    def _scene_folders(self) -> List[str]:
        folders = []
        for scene_id in sorted(glob.glob(os.path.join(self.root, "*"))):
            if not os.path.isdir(scene_id):
                continue
            for densef in sorted(os.listdir(scene_id)):
                if "dense" in densef and os.path.isdir(os.path.join(scene_id, densef)):
                    folders.append(os.path.join(scene_id, densef, "aligned"))
        return folders

    def _read_img_cam(self) -> Dict[str, Image]:
        images = {}
        for folder in self._scene_folders():
            txt = os.path.join(folder, "img_cam.txt")
            if not os.path.exists(txt):
                continue
            with open(txt) as fid:
                for line in fid:
                    line = line.strip()
                    if not line or line[0] == "#":
                        continue
                    elems = line.split()
                    img_path = os.path.join(folder, "images", elems[0])
                    images[img_path] = Image(
                        name=elems[0],
                        w=int(elems[1]),
                        h=int(elems[2]),
                        fx=float(elems[3]),
                        fy=float(elems[4]),
                        cx=float(elems[5]),
                        cy=float(elems[6]),
                        rvec=np.array(elems[7:16], np.float64),
                        tvec=np.array(elems[16:19], np.float64),
                    )
        return images

    def _read_pairs(self):
        imf1s, imf2s = [], []
        rand = np.random.RandomState(234)
        for folder in self._scene_folders():
            pairf = os.path.join(folder, "pairs.txt")
            if not os.path.exists(pairf):
                continue
            p1, p2 = [], []
            with open(pairf) as f:
                for line in f:
                    a, b = line.strip().split(" ")
                    p1.append(os.path.join(folder, "images", a))
                    p2.append(os.path.join(folder, "images", b))
            if len(p1) > 5000:  # balance pairs per scene (megadepth.py:340-344)
                index = np.arange(len(p1))
                rand.shuffle(index)
                p1 = [p1[i] for i in index[:5000]]
                p2 = [p2[i] for i in index[:5000]]
            imf1s.extend(p1)
            imf2s.extend(p2)
        return imf1s, imf2s

    # --------------------------------------------------------- geometry

    @staticmethod
    def _intrinsics(meta: Image) -> np.ndarray:
        return np.array(
            [[meta.fx, 0, meta.cx], [0, meta.fy, meta.cy], [0, 0, 1]], np.float64
        )

    @staticmethod
    def _extrinsics(meta: Image) -> np.ndarray:
        e = np.eye(4)
        e[:3, :3] = meta.rvec.reshape(3, 3)
        e[:3, 3] = meta.tvec
        return e

    def _query_kpts(self, img, num_pts, h, w, rng) -> np.ndarray:
        """Mixed random + SIFT query candidates (megadepth.py:358-391)."""
        frac = self.configs["random_percent"]
        kx = rng.rand(int(frac * num_pts)) * (w - 1)
        ky = rng.rand(int(frac * num_pts)) * (h - 1)
        kp_rand = np.stack((kx, ky, np.zeros_like(kx))).T
        kp_sift = dutils.sift_keypoints(img, nfeatures=int((1 - frac) * num_pts))
        if len(kp_sift) == 0:
            return kp_rand
        kp_sift = np.concatenate([kp_sift, np.ones_like(kp_sift[:, :1])], axis=1)
        return np.concatenate((kp_rand, kp_sift), 0)

    # ------------------------------------------------------------ access

    def __len__(self):
        return len(self.imf1s)

    def __getitem__(self, item: int) -> Optional[Dict]:
        from .extraction import _imread_rgb

        imf1, imf2 = self.imf1s[item], self.imf2s[item]
        m1, m2 = self.images[imf1], self.images[imf2]
        im1 = _imread_rgb(imf1)
        im2 = _imread_rgb(imf2)
        h1, w1 = im1.shape[:2]
        h2, w2 = im2.shape[:2]

        K1, K2 = self._intrinsics(m1), self._intrinsics(m2)
        E1, E2 = self._extrinsics(m1), self._extrinsics(m2)

        F1, rel1 = dutils.relative_pose_to_fundamental(K1, K2, E1, E2)
        if (
            self.is_train
            and dutils.rotation_angle_deg(rel1[:3, :3]) > self.configs["rot_thr"]
        ):
            return None
        F2, rel2 = dutils.relative_pose_to_fundamental(K2, K1, E2, E1)
        if (
            self.is_train
            and dutils.rotation_angle_deg(rel2[:3, :3]) > self.configs["rot_thr"]
        ):
            return None

        rng = np.random.RandomState()  # per-worker entropy, like torch loaders
        num_pts = self.configs["num_pts"]
        coord1 = self._query_kpts(im1, 10 * num_pts, h1, w1, rng)
        coord2 = self._query_kpts(im2, 10 * num_pts, h2, w2, rng)
        if len(coord1) == 0 or len(coord2) == 0:
            return None

        if self.configs.get("prune_kp"):
            ind1 = dutils.prune_kpts(
                coord1[:, :2], F1, im2.shape[:2], K1, K2, rel1, d_min=4, d_max=400
            )
            if ind1.sum() == 0:
                return None
            coord1 = coord1[ind1]
            ind2 = dutils.prune_kpts(
                coord2[:, :2], F2, im1.shape[:2], K2, K1, rel2, d_min=4, d_max=400
            )
            if ind2.sum() == 0:
                return None
            coord2 = coord2[ind2]

        if len(coord1) < num_pts or len(coord2) < num_pts:
            return None
        coord1 = dutils.random_choice(coord1, num_pts).astype(np.float32)
        coord2 = dutils.random_choice(coord2, num_pts).astype(np.float32)

        F1 = (F1 / (F1[-1, -1] + 1e-10)).astype(np.float32)
        F2 = (F2 / (F2[-1, -1] + 1e-10)).astype(np.float32)

        if self.is_train:
            im1_aug = dutils.color_jitter(im1, rng)
            im2_aug = dutils.color_jitter(im2, rng)
        else:
            im1_aug, im2_aug = im1, im2

        return {
            "im1": dutils.normalize_image(im1_aug),
            "im2": dutils.normalize_image(im2_aug),
            "im1_ori": im1,
            "im2_ori": im2,
            "pose1": rel1[:3, :].astype(np.float32),
            "pose2": rel2[:3, :].astype(np.float32),
            "F1": F1,
            "F2": F2,
            "intrinsic1": K1.astype(np.float32),
            "intrinsic2": K2.astype(np.float32),
            "coord1": coord1,
            "coord2": coord2,
            "name1": m1.name,
            "name2": m2.name,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

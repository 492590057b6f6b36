"""Host-side geometry and image helpers (reference datasets/data_utils.py)."""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(im: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> float32 HWC ImageNet-normalized."""
    x = im.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def crop_mod16(im: np.ndarray) -> np.ndarray:
    """Crop H and W down to multiples of 16 (hpatches.py:36-38)."""
    h, w = im.shape[:2]
    return im[: h - h % 16, : w - w % 16]


def skew(x: np.ndarray) -> np.ndarray:
    """Skew-symmetric cross-product matrix (data_utils.py:8-11)."""
    return np.array(
        [[0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]], dtype=np.float64
    )


def relative_pose_to_fundamental(K1, K2, extrinsic1, extrinsic2):
    """Camera intrinsics + world-to-cam extrinsics -> (F 1→2, relative pose).

    Same math as megadepth.py:426-448: relative = E2 @ inv(E1),
    E = [t]x R, F = inv(K2)^T E inv(K1).
    """
    relative = extrinsic2 @ np.linalg.inv(extrinsic1)
    R = relative[:3, :3]
    T = relative[:3, 3]
    E = skew(T) @ R
    F = np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)
    return F, relative


def rotation_angle_deg(R: np.ndarray) -> float:
    return float(
        np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)) * 180 / np.pi
    )


def prune_kpts(coord1, F_gt, im2_size, intrinsic1, intrinsic2, pose, d_min, d_max):
    """Epipolar + depth-range visibility pruning (data_utils.py:81-116)."""
    coord1_h = np.concatenate([coord1, np.ones_like(coord1[:, [0]])], axis=1).T
    line = F_gt.dot(coord1_h)
    line = line / np.clip(np.linalg.norm(line[:2], axis=0), 1e-10, None)

    h2, w2 = im2_size
    corners = np.array(
        [[0, 0, 1], [0, h2 - 1, 1], [w2 - 1, 0, 1], [w2 - 1, h2 - 1, 1]]
    )
    dists = np.abs(corners.dot(line))
    non_intersect = (dists > np.sqrt(w2**2 + h2**2)).any(axis=0)

    K1_4 = np.eye(4)
    K1_4[:3, :3] = intrinsic1
    K2_4 = np.eye(4)
    K2_4[:3, :3] = intrinsic2
    pose4 = np.eye(4)
    pose4[:3, :] = pose[:3, :]

    def proj(depth):
        ch = np.concatenate(
            [
                depth * coord1,
                depth * np.ones_like(coord1[:, [0]]),
                np.ones_like(coord1[:, [0]]),
            ],
            axis=1,
        ).T
        c2 = K2_4.dot(pose4).dot(np.linalg.inv(K1_4)).dot(ch)
        return c2[:2] / (ch[2] + 1e-10)

    c_min, c_max = proj(d_min), proj(d_max)
    out_range = (
        ((c_min[0] < 0) & (c_max[0] < 0))
        | ((c_min[1] < 0) & (c_max[1] < 0))
        | ((c_min[0] > w2 - 1) & (c_max[0] > w2 - 1))
        | ((c_min[1] > h2 - 1) & (c_max[1] > h2 - 1))
    )
    return ~(non_intersect | out_range)


def random_choice(array: np.ndarray, size: int, seed: int = 1234) -> np.ndarray:
    """Fixed-seed subsample (data_utils.py:118-125)."""
    rand = np.random.RandomState(seed)
    n = len(array)
    idx = rand.choice(n, size, replace=n <= size)
    return array[idx]


def sift_keypoints(im_rgb: np.ndarray, nfeatures: int = 0) -> np.ndarray:
    """OpenCV SIFT detector on an RGB uint8 image -> [N, 2] (x, y)."""
    import cv2

    gray = cv2.cvtColor(im_rgb, cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create(nfeatures=nfeatures) if nfeatures else cv2.SIFT_create()
    kpts = sift.detect(gray)
    if not kpts:
        return np.zeros((0, 2), np.float32)
    return np.array([[kp.pt[0], kp.pt[1]] for kp in kpts], np.float32)


def color_jitter(im: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """ColorJitter(brightness=1, contrast=1, saturation=1, hue=0.4)
    equivalent of the MegaDepth train transform (megadepth.py:259-265):
    random order, factors ~ U[0,2] (brightness/contrast/saturation) and
    hue shift ~ U[-0.4, 0.4] turns.
    """
    import cv2

    im = im.astype(np.float32) / 255.0
    ops = rng.permutation(4)
    for op in ops:
        if op == 0:  # brightness
            im = np.clip(im * rng.uniform(0, 2), 0, 1)
        elif op == 1:  # contrast
            mean = cv2.cvtColor(im, cv2.COLOR_RGB2GRAY).mean()
            im = np.clip(mean + rng.uniform(0, 2) * (im - mean), 0, 1)
        elif op == 2:  # saturation
            gray = cv2.cvtColor(im, cv2.COLOR_RGB2GRAY)[..., None]
            im = np.clip(gray + rng.uniform(0, 2) * (im - gray), 0, 1)
        else:  # hue
            hsv = cv2.cvtColor(im, cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-0.4, 0.4) * 360.0) % 360.0
            im = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
    return (im * 255).astype(np.uint8)


def rotate_image(image: np.ndarray, angle: float):
    """Rotate + rescale so the rotated content fills the frame
    (data_utils.py:14-29). Returns (rotated image, 4x4 rotation matrix
    whose upper-left 2x2 is the applied affine rotation block)."""
    import cv2

    h, w = image.shape[:2]
    if abs(angle) % 360.0 < 1e-9:  # identity rotation: reference formula
        return image.copy(), np.eye(4)  # divides by tan(0) (bug fixed here)
    if abs(abs(angle) % 360.0 - 180.0) < 1e-9:
        # 180°: content fills the frame at scale 1; the scale formula
        # below degenerates (tan(pi)=0)
        center = tuple(np.array(image.shape[1::-1]) / 2.0)
        rot_mat = cv2.getRotationMatrix2D(center, 180.0, 1.0)
        result = cv2.warpAffine(
            image, rot_mat, image.shape[1::-1], flags=cv2.INTER_LINEAR
        )
        rotation = np.eye(4)
        rotation[:2, :2] = rot_mat[:2, :2]
        return result, rotation
    rad = np.abs(angle / 180.0 * np.pi)
    cos, sin, tan = np.cos(rad), np.sin(rad), np.tan(rad)
    scale_h = (h / cos + (w - h * tan) * sin) / h
    scale_w = (h / sin + (w - h / tan) * cos) / w
    scale = max(scale_h, scale_w)
    center = tuple(np.array(image.shape[1::-1]) / 2.0)
    rot_mat = cv2.getRotationMatrix2D(center, angle, scale)
    result = cv2.warpAffine(
        image, rot_mat, image.shape[1::-1], flags=cv2.INTER_LINEAR
    )
    rotation = np.eye(4)
    rotation[:2, :2] = rot_mat[:2, :2]
    return result, rotation


def perspective_transform(
    img: np.ndarray, param: float = 0.001, rng: np.random.RandomState = None
):
    """Random small perspective warp (data_utils.py:31-45); explicit rng
    instead of the reference's fresh RandomState(None)."""
    import cv2

    rng = rng or np.random.RandomState()
    h, w = img.shape[:2]
    M = np.eye(3) + param * (2.0 * rng.rand(3, 3) - 1.0)
    return cv2.warpPerspective(img, M, (w, h)), M


def generate_query_kpts(
    img: np.ndarray, mode: str, num_pts: int, h: int, w: int,
    rng: np.random.RandomState = None,
) -> np.ndarray:
    """Query-keypoint candidates: 'random' | 'sift' | 'mixed'
    (data_utils.py:48-78). 'mixed' = 10% uniform-random + 90% SIFT."""
    rng = rng or np.random.RandomState()
    if mode == "random":
        return np.stack(
            [rng.rand(num_pts) * (w - 1), rng.rand(num_pts) * (h - 1)]
        ).T
    if mode == "sift":
        return sift_keypoints(img, nfeatures=num_pts)
    if mode == "mixed":
        kp_rand = np.stack(
            [
                rng.rand(int(0.1 * num_pts)) * (w - 1),
                rng.rand(int(0.1 * num_pts)) * (h - 1),
            ]
        ).T
        kp_sift = sift_keypoints(img, nfeatures=int(0.9 * num_pts))
        if len(kp_sift) == 0:
            return kp_rand
        return np.concatenate([kp_rand, kp_sift], 0)
    raise ValueError(f"unknown type of keypoints {mode!r}")


def tensor2array(arr: np.ndarray, max_value=None, colormap: str = "coolwarm"):
    """Render a 2-D array (or CHW/HWC image) to a float CHW RGB array via
    a matplotlib colormap (data_utils.py:127-148) — used by score-map and
    error visualizations."""
    if max_value is None:
        max_value = float(arr.max()) if arr.size else 1.0
    if arr.ndim == 2:
        import matplotlib

        norm = np.clip(arr / max(max_value, 1e-12), 0, 1)
        cmap = matplotlib.colormaps[colormap]
        return cmap(norm).transpose(2, 0, 1)[:3].astype(np.float32)
    if arr.ndim == 3 and arr.shape[0] == 3:  # CHW image
        return ((arr + 1.0) / 2.0).astype(np.float32)
    if arr.ndim == 3 and arr.shape[2] == 3:  # HWC image
        return ((arr.transpose(2, 0, 1) + 1.0) / 2.0).astype(np.float32)
    raise ValueError(f"unsupported shape {arr.shape}")

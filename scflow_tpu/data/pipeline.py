"""Host-side per-object transform pipeline (numpy): jitter → bbox → crop →
resize → pad → intrinsic adaptation → normalize.

Re-design of the reference's transform stack
(datasets/pipelines/geometry_transform.py, jitter.py, formatting.py) around
one idea: every 2D geometry op appends a 3×3 affine ``transform_matrix``;
at the end, the camera intrinsics absorb the accumulated transform
(K' = T @ K — the shipped configs' ``adapt_intrinsic`` RemapPose mode,
geometry_transform.py:122-124), so poses never change and no PnP is needed
on the hot path. Output crops are fixed-size and stack into static-shape
batches.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..training.config import JitterConfig


def _euler_zyx_matrix(angles_deg):
    """Rotation from euler 'zyx' angles in degrees (scipy convention used by
    the reference jitter, datasets/pipelines/jitter.py:55)."""
    from scipy.spatial.transform import Rotation

    return Rotation.from_euler("zyx", angles_deg, degrees=True).as_matrix()


def jitter_pose_np(rng: np.random.Generator, rotation: np.ndarray,
                   translation: np.ndarray, cfg: JitterConfig,
                   mesh_points: np.ndarray | None = None,
                   mesh_diameter: float | None = None,
                   max_tries: int = 50):
    """Rejection-sample SE(3) noise like the reference PoseJitter
    (jitter.py:51-79): per-axis Gaussian euler angles + Gaussian xyz offset,
    rejected until angle/translation/ADD limits hold.

    Returns (ref_rotation, ref_translation, add_err, trans_err, rot_err).
    """
    for _ in range(max_tries):
        angles = rng.normal(0.0, cfg.angle_std_deg, size=3)
        delta_r = _euler_zyx_matrix(angles).astype(np.float32)
        ref_r = delta_r @ rotation
        cos = np.clip(0.5 * (np.trace(delta_r) - 1.0), -1.0, 1.0)
        rot_err = np.degrees(np.arccos(cos))
        if rot_err > cfg.angle_limit_deg:
            continue
        noise = rng.normal(0.0, [cfg.xy_std_mm, cfg.xy_std_mm, cfg.z_std_mm])
        trans_err = float(np.linalg.norm(noise))
        if trans_err > cfg.translation_limit_mm:
            continue
        ref_t = (translation + noise).astype(np.float32)
        add_err = np.nan
        if mesh_points is not None and mesh_diameter:
            gt_p = mesh_points @ rotation.T + translation
            ref_p = mesh_points @ ref_r.T + ref_t
            add_err = float(np.linalg.norm(gt_p - ref_p, axis=-1).mean()
                            / mesh_diameter)
            if cfg.add_limit is not None and add_err > cfg.add_limit:
                continue
        return ref_r, ref_t, add_err, trans_err, float(rot_err)
    return rotation.copy(), translation.copy(), 0.0, 0.0, 0.0


def project_bbox(points_3d: np.ndarray, k: np.ndarray, rotation: np.ndarray,
                 translation: np.ndarray, clip_shape=None) -> np.ndarray:
    """Project mesh points under a pose → xyxy bbox (reference ComputeBbox,
    datasets/pipelines/formatting.py:41-91)."""
    p = points_3d @ rotation.T + translation
    uvw = p @ k.T
    xy = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-8)
    bbox = np.array([xy[:, 0].min(), xy[:, 1].min(),
                     xy[:, 0].max(), xy[:, 1].max()], np.float32)
    if clip_shape is not None:
        h, w = clip_shape
        bbox = np.clip(bbox, [0, 0, 0, 0], [w, h, w, h])
    return bbox


@dataclasses.dataclass
class CropResult:
    patch: np.ndarray            # (S, S, 3) float32 or uint8
    transform: np.ndarray        # (3, 3) accumulated 2D affine
    k_new: np.ndarray            # (3, 3) adapted intrinsics
    scale_factor: float
    mask_patch: np.ndarray | None = None


def crop_resize_pad(image: np.ndarray, bbox: np.ndarray, k: np.ndarray,
                    out_size: int, size_ratio: float = 1.0,
                    aspect_ratio: float = 1.0, pad_val: int = 128,
                    mask: np.ndarray | None = None) -> CropResult:
    """Object-centric crop → keep-ratio resize → center pad, with the
    accumulated transform folded into the intrinsics.

    Semantics follow the reference Crop/Resize/Pad stack
    (geometry_transform.py:154-501): square-ified bbox expanded by
    ``size_ratio``, bilinear keep-ratio resize to ``out_size``, center pad
    with ``pad_val``.
    """
    h, w = image.shape[:2]
    x1, y1, x2, y2 = bbox
    bw, bh = x2 - x1, y2 - y1
    xc, yc = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    bw = max(bw, bh * aspect_ratio)
    bh = max(bw / aspect_ratio, bh)
    bw, bh = bw * size_ratio, bh * size_ratio
    cx1, cy1 = int(xc - bw / 2), int(yc - bh / 2)
    cx2, cy2 = int(xc + bw / 2), int(yc + bh / 2)

    t_crop = np.array([[1, 0, -cx1], [0, 1, -cy1], [0, 0, 1]], np.float32)

    # crop with out-of-frame padding
    ch, cw = cy2 - cy1, cx2 - cx1
    patch = np.full((ch, cw, 3), pad_val, image.dtype)
    sy1, sy2 = max(cy1, 0), min(cy2, h)
    sx1, sx2 = max(cx1, 0), min(cx2, w)
    if sy2 > sy1 and sx2 > sx1:
        patch[sy1 - cy1:sy2 - cy1, sx1 - cx1:sx2 - cx1] = image[sy1:sy2, sx1:sx2]
    mask_patch = None
    if mask is not None:
        mask_patch = np.zeros((ch, cw), mask.dtype)
        if sy2 > sy1 and sx2 > sx1:
            mask_patch[sy1 - cy1:sy2 - cy1, sx1 - cx1:sx2 - cx1] = mask[sy1:sy2, sx1:sx2]

    # keep-ratio resize: scale so max side == out_size
    scale = out_size / max(ch, cw)
    rh, rw = int(round(ch * scale)), int(round(cw * scale))
    patch = _resize_image(patch, (rh, rw))
    if mask_patch is not None:
        mask_patch = _resize_image(mask_patch.astype(np.uint8) * 255,
                                   (rh, rw)) > 127
    t_resize = np.array([[scale, 0, 0], [0, scale, 0], [0, 0, 1]], np.float32)

    # center pad to (out_size, out_size)
    top = int(out_size / 2 - rh / 2)
    left = int(out_size / 2 - rw / 2)
    out = np.full((out_size, out_size, 3), pad_val, patch.dtype)
    out[top:top + rh, left:left + rw] = patch
    if mask_patch is not None:
        mpad = np.zeros((out_size, out_size), bool)
        mpad[top:top + rh, left:left + rw] = mask_patch
        mask_patch = mpad
    t_pad = np.array([[1, 0, left], [0, 1, top], [0, 0, 1]], np.float32)

    transform = t_pad @ t_resize @ t_crop
    k_new = transform @ k  # adapt_intrinsic mode
    return CropResult(patch=out, transform=transform, k_new=k_new,
                      scale_factor=scale, mask_patch=mask_patch)


def _resize_image(img: np.ndarray, out_hw) -> np.ndarray:
    rh, rw = out_hw
    try:
        import cv2

        return cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        # nearest fallback (tests only)
        h, w = img.shape[:2]
        yi = np.clip((np.arange(rh) * h / rh).astype(int), 0, h - 1)
        xi = np.clip((np.arange(rw) * w / rw).astype(int), 0, w - 1)
        return img[yi][:, xi]


def normalize_image(img: np.ndarray, mean=(0., 0., 0.),
                    std=(255., 255., 255.)) -> np.ndarray:
    """uint8 RGB → float32 normalized (reference Normalize with the shipped
    mean/std giving [0, 1] images, configs/..._pbr.py:41-42,75)."""
    return ((img.astype(np.float32) - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32))

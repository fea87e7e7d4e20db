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


def expand_bbox(bbox: np.ndarray, size_ratio: float = 1.0,
                aspect_ratio: float = 1.0) -> tuple[int, int, int, int]:
    """Square-ify + expand an xyxy bbox into integer crop corners — the
    box-shaping step of the reference Crop transform
    (geometry_transform.py:154-276), shared by the Python and native C++
    crop paths so their transforms agree exactly."""
    x1, y1, x2, y2 = bbox
    bw, bh = x2 - x1, y2 - y1
    xc, yc = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    bw = max(bw, bh * aspect_ratio)
    bh = max(bw / aspect_ratio, bh)
    bw, bh = bw * size_ratio, bh * size_ratio
    return (int(xc - bw / 2), int(yc - bh / 2),
            int(xc + bw / 2), int(yc + bh / 2))


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
    cx1, cy1, cx2, cy2 = expand_bbox(bbox, size_ratio, aspect_ratio)

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


# ---------------------------------------------------------------------------
# Pose remapping under a 2D transform (reference RemapPose,
# datasets/pipelines/geometry_transform.py:22-150, and its test-time inverse
# models/utils/pose.py:264-309).
#
# Three geometry_transform modes:
# - 'adapt_intrinsic' (default path above): fold the 2D crop transform into
#   the intrinsics (K' = T @ K); the pose is untouched, so mapping results
#   back to the original resolution is the identity on (R, t).
# - 'keep_intrinsic': keep K; re-solve (R, t) so projection under K matches
#   the transformed 2D keypoints (EPnP + Gauss-Newton).
# - 'target_intrinsic': re-solve (R, t) against a caller-supplied target K.
# ---------------------------------------------------------------------------

def _refine_pose_gn_np(r: np.ndarray, t: np.ndarray, pts: np.ndarray,
                       pix: np.ndarray, k: np.ndarray, iters: int = 20):
    """Float64 Gauss-Newton on reprojection error (host-side PnP refine).

    Left-multiplied axis-angle delta on R, additive t — same
    parameterization as scflow_tpu.geometry.pnp.refine_pose_gn, but in f64
    for cv2-class accuracy.
    """
    fu, fv = k[0, 0], k[1, 1]

    def residual(r, t):
        cam = pts @ r.T + t
        zi = 1.0 / np.maximum(cam[:, 2], 1e-9)
        return np.concatenate([
            fu * cam[:, 0] * zi + k[0, 2] - pix[:, 0],
            fv * cam[:, 1] * zi + k[1, 2] - pix[:, 1]])

    lam = 1e-6
    cost = float(np.sum(residual(r, t) ** 2))
    for _ in range(iters):
        cam = pts @ r.T + t
        x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
        zi = 1.0 / np.maximum(z, 1e-9)
        res = residual(r, t)
        du = np.stack([fu * zi, np.zeros_like(zi), -fu * x * zi * zi], -1)
        dv = np.stack([np.zeros_like(zi), fv * zi, -fv * y * zi * zi], -1)
        px = np.zeros((len(pts), 3, 3))
        px[:, 0, 1], px[:, 0, 2] = -z, y
        px[:, 1, 0], px[:, 1, 2] = z, -x
        px[:, 2, 0], px[:, 2, 1] = -y, x
        j_u = np.concatenate([-np.einsum("ni,nij->nj", du, px), du], -1)
        j_v = np.concatenate([-np.einsum("ni,nij->nj", dv, px), dv], -1)
        jac = np.concatenate([j_u, j_v], axis=0)
        jtj = jac.T @ jac
        jtr = jac.T @ res
        # Levenberg-Marquardt with step acceptance (a far init otherwise
        # diverges; the reference relies on cv2's LM doing the same)
        for _try in range(8):
            delta = -np.linalg.solve(jtj + lam * np.diag(np.diag(jtj))
                                     + 1e-12 * np.eye(6), jtr)
            w = delta[:3]
            angle = np.linalg.norm(w)
            if angle > 1e-14:
                ax = w / angle
                kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                               [-ax[1], ax[0], 0]])
                dr = (np.eye(3) + np.sin(angle) * kx
                      + (1 - np.cos(angle)) * kx @ kx)
            else:
                dr = np.eye(3)
            r_new, t_new = dr @ r, t + delta[3:]
            cost_new = float(np.sum(residual(r_new, t_new) ** 2))
            if cost_new <= cost:
                r, t, cost = r_new, t_new, cost_new
                lam = max(lam * 0.3, 1e-12)
                break
            lam *= 10.0
        if np.abs(delta).max() < 1e-12:
            break
    return r, t


def _solve_pnp_np(pts: np.ndarray, pix: np.ndarray, k: np.ndarray,
                  init_r: np.ndarray | None = None,
                  init_t: np.ndarray | None = None):
    """Host-side float64 PnP: cv2 if available, else JAX EPnP init + f64 LM."""
    try:
        import cv2

        ok, rvec, tvec = cv2.solvePnP(
            pts.reshape(-1, 1, 3).astype(np.float64),
            np.ascontiguousarray(pix).reshape(-1, 1, 2).astype(np.float64),
            np.asarray(k, np.float64), np.zeros(5),
            flags=cv2.SOLVEPNP_ITERATIVE)
        if ok:
            rm, _ = cv2.Rodrigues(rvec)
            return rm, tvec.ravel()
    except ImportError:
        pass
    if init_r is None:
        import jax.numpy as jnp

        from scflow_tpu.geometry.pnp import epnp

        init_r, init_t = epnp(jnp.asarray(pts, jnp.float32),
                              jnp.asarray(pix, jnp.float32),
                              jnp.asarray(k, jnp.float32))
        init_r = np.asarray(init_r, np.float64)
        init_t = np.asarray(init_t, np.float64)
    return _refine_pose_gn_np(init_r, init_t, pts, pix,
                              np.asarray(k, np.float64))


def remap_pose(rotation: np.ndarray, translation: np.ndarray,
               keypoints_3d: np.ndarray, k_src: np.ndarray,
               transform: np.ndarray, k_dst: np.ndarray):
    """Re-solve a pose after a 2D affine ``transform`` of the image.

    Projects ``keypoints_3d`` under (``k_src``, pose), applies ``transform``
    to the 2D points, and solves PnP under ``k_dst``. Returns
    (rotation, translation, rmsd) where rmsd is the reprojection RMS error
    of the re-solved pose (the reference returns the analogous
    retval/diff from cv2.solvePnP, datasets/pose.py:80-104).
    """
    pts = np.asarray(keypoints_3d, np.float64)
    cam = pts @ np.asarray(rotation, np.float64).T + np.asarray(
        translation, np.float64)
    uv = cam[:, :2] / np.maximum(cam[:, 2:3], 1e-9)
    pix = uv * np.array([k_src[0, 0], k_src[1, 1]]) + np.array(
        [k_src[0, 2], k_src[1, 2]])
    ones = np.ones((len(pix), 1))
    pix_t = (np.concatenate([pix, ones], axis=1) @ np.asarray(
        transform, np.float64).T)[:, :2]

    r_new, t_new = _solve_pnp_np(pts, pix_t, k_dst)
    r_new = r_new.astype(np.float32)
    t_new = t_new.astype(np.float32)

    cam2 = pts @ r_new.astype(np.float64).T + t_new.astype(np.float64)
    uv2 = cam2[:, :2] / np.maximum(cam2[:, 2:3], 1e-9)
    pix2 = uv2 * np.array([k_dst[0, 0], k_dst[1, 1]]) + np.array(
        [k_dst[0, 2], k_dst[1, 2]])
    rmsd = float(np.sqrt(np.mean(np.sum((pix2 - pix_t) ** 2, axis=1))))
    return r_new, t_new, rmsd


def remap_pose_to_origin_resolution(rotation: np.ndarray,
                                    translation: np.ndarray,
                                    keypoints_3d: np.ndarray,
                                    k_crop: np.ndarray,
                                    transform: np.ndarray,
                                    k_origin: np.ndarray,
                                    mode: str = "adapt_intrinsic"):
    """Map a pose predicted on the crop back to the original image.

    ``transform`` is the accumulated crop 3x3; ``mode`` must match how the
    crop was produced (reference remap_pose_to_origin_resoluaion,
    models/utils/pose.py:264-309).
    """
    if mode == "adapt_intrinsic":
        # K was adapted; the pose already lives in the original camera.
        return (np.asarray(rotation, np.float32),
                np.asarray(translation, np.float32), 0.0)
    if mode in ("keep_intrinsic", "target_intrinsic"):
        inv = np.linalg.inv(np.asarray(transform, np.float64))
        return remap_pose(rotation, translation, keypoints_3d, k_crop, inv,
                          k_origin)
    raise ValueError(f"unknown geometry transform mode {mode!r}")


def apply_geometry_transform_mode(crop: CropResult, rotation: np.ndarray,
                                  translation: np.ndarray,
                                  keypoints_3d: np.ndarray,
                                  k_src: np.ndarray, mode: str,
                                  target_k: np.ndarray | None = None):
    """Resolve (pose, intrinsics) for a crop under one of the three
    RemapPose modes (geometry_transform.py:22-150).

    Returns (rotation, translation, k) to use for the crop patch.
    """
    if mode == "adapt_intrinsic":
        return (np.asarray(rotation, np.float32),
                np.asarray(translation, np.float32),
                crop.k_new.astype(np.float32))
    if mode == "keep_intrinsic":
        r, t, _ = remap_pose(rotation, translation, keypoints_3d, k_src,
                             crop.transform, k_src)
        return r, t, np.asarray(k_src, np.float32)
    if mode == "target_intrinsic":
        assert target_k is not None, "target_intrinsic needs target_k"
        r, t, _ = remap_pose(rotation, translation, keypoints_3d, k_src,
                             crop.transform, target_k)
        return r, t, np.asarray(target_k, np.float32)
    raise ValueError(f"unknown geometry transform mode {mode!r}")

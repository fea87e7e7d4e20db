"""Host-side color augmentations (numpy/cv2).

Re-implementation of the reference's color transform stage
(datasets/pipelines/color_transform.py): HSV jitter, additive noise,
Gaussian smoothing, sharpness, grayscale, background replacement, and
random occlusion pasting. Applied per image patch on the host data path
(these are cheap uint8 ops; the device path stays pure).
"""
from __future__ import annotations

import numpy as np


def _cv2():
    import cv2

    return cv2


def random_hsv(rng: np.random.Generator, img: np.ndarray, h_ratio=0.2,
               s_ratio=0.5, v_ratio=0.5) -> np.ndarray:
    """HSV jitter (reference RandomHSV, color_transform.py:77-101)."""
    cv2 = _cv2()
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    h = rng.uniform(-h_ratio, h_ratio) * 180
    s = 1.0 + rng.uniform(-s_ratio, s_ratio)
    v = 1.0 + rng.uniform(-v_ratio, v_ratio)
    hsv[..., 0] = (hsv[..., 0] + h) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] * s, 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] * v, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def random_noise(rng: np.random.Generator, img: np.ndarray,
                 noise_ratio=0.1) -> np.ndarray:
    """Additive uniform noise (reference RandomNoise)."""
    noise = rng.uniform(-noise_ratio, noise_ratio, img.shape) * 255
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def random_smooth(rng: np.random.Generator, img: np.ndarray,
                  max_kernel_size=5) -> np.ndarray:
    """Gaussian blur with a random odd kernel (reference RandomSmooth)."""
    cv2 = _cv2()
    k = int(rng.integers(0, (max_kernel_size + 1) // 2)) * 2 + 1
    if k <= 1:
        return img
    return cv2.GaussianBlur(img, (k, k), 0)


def random_sharpness(rng: np.random.Generator, img: np.ndarray,
                     factor=0.5) -> np.ndarray:
    """Unsharp-mask style sharpening (reference RandomSharpness)."""
    cv2 = _cv2()
    blur = cv2.GaussianBlur(img, (3, 3), 0).astype(np.float32)
    alpha = rng.uniform(0, factor)
    out = img.astype(np.float32) * (1 + alpha) - blur * alpha
    return np.clip(out, 0, 255).astype(np.uint8)


def random_gray(rng: np.random.Generator, img: np.ndarray,
                p=0.1) -> np.ndarray:
    """Random grayscale conversion (reference RandomGray)."""
    if rng.uniform() > p:
        return img
    cv2 = _cv2()
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return np.stack([gray] * 3, axis=-1)


def random_background(rng: np.random.Generator, img: np.ndarray,
                      mask: np.ndarray, backgrounds: list[np.ndarray],
                      p=0.3) -> np.ndarray:
    """Replace the non-object region with a random background crop
    (reference RandomBackground, color_transform.py:176-244)."""
    if rng.uniform() > p or not backgrounds:
        return img
    cv2 = _cv2()
    bg = backgrounds[int(rng.integers(len(backgrounds)))]
    bg = cv2.resize(bg, (img.shape[1], img.shape[0]))
    out = img.copy()
    out[~mask] = bg[~mask]
    return out


def random_occlusion(rng: np.random.Generator, img: np.ndarray,
                     mask: np.ndarray, p=0.3, max_area=0.3) -> tuple:
    """Paste a random rectangle occluder over the object
    (simplified reference RandomOcclusion, color_transform.py:273-403).
    Returns (image, updated visibility mask)."""
    if rng.uniform() > p:
        return img, mask
    h, w = img.shape[:2]
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return img, mask
    oh = int(rng.uniform(0.1, max_area) * (ys.max() - ys.min() + 1))
    ow = int(rng.uniform(0.1, max_area) * (xs.max() - xs.min() + 1))
    if oh < 1 or ow < 1:
        return img, mask
    cy = int(rng.integers(ys.min(), ys.max() + 1))
    cx = int(rng.integers(xs.min(), xs.max() + 1))
    y1, y2 = max(0, cy - oh // 2), min(h, cy + oh // 2 + 1)
    x1, x2 = max(0, cx - ow // 2), min(w, cx + ow // 2 + 1)
    out = img.copy()
    out[y1:y2, x1:x2] = rng.integers(0, 256, (y2 - y1, x2 - x1, 3),
                                     dtype=np.uint8)
    new_mask = mask.copy()
    new_mask[y1:y2, x1:x2] = False
    return out, new_mask


def default_train_augs(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """The shipped SCFlow train recipe: HSV → noise → smooth
    (configs/refine_models/scflow_ycbv_pbr.py:69-71)."""
    img = random_hsv(rng, img)
    img = random_noise(rng, img)
    img = random_smooth(rng, img)
    return img

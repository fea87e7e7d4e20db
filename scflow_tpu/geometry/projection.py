"""Pinhole projection / unprojection on dense grids (pure JAX, batched).

TPU-first re-design of the reference's correspondence utilities: instead of
variable-length 2D/3D point lists built with ``torch.nonzero``
(reference models/utils/pose.py:44-64), we keep everything as dense
fixed-shape (H, W) grids with validity masks — XLA-friendly and vmappable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls


@f32_matmuls
def project_points(points_3d: jax.Array, k: jax.Array, rotation: jax.Array,
                   translation: jax.Array, eps: float = 1e-8):
    """Project object-frame 3D points to pixels.

    Args:
      points_3d: (..., P, 3) object-frame points.
      k: (..., 3, 3) intrinsics.
      rotation: (..., 3, 3); translation: (..., 3).

    Returns:
      (pts_2d (..., P, 2) xy pixels, z (..., P) camera-frame depth)

    Reference semantics: datasets/pose.py:18-74 (project_3d_point).
    """
    p_cam = jnp.einsum("...ij,...pj->...pi", rotation, points_3d) + translation[..., None, :]
    uvw = jnp.einsum("...ij,...pj->...pi", k, p_cam)
    z = uvw[..., 2]
    xy = uvw[..., :2] / (z[..., None] + eps)
    return xy, z


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) grid of pixel-center coordinates in xy order."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


@f32_matmuls
def unproject_depth(depth: jax.Array, k: jax.Array, rotation: jax.Array | None = None,
                    translation: jax.Array | None = None, eps: float = 1e-8):
    """Lift a dense depth map to 3D points.

    Args:
      depth: (..., H, W) z-depth (0 = background).
      k: (..., 3, 3) intrinsics.
      rotation/translation: optional (..., 3, 3)/(..., 3) object pose; when
        given, also return object-frame points.

    Returns:
      points_cam (..., H, W, 3) and, if pose given, points_obj (..., H, W, 3).
      Background pixels (depth <= 0) produce zero points.

    Reference semantics: models/utils/pose.py:26-41 (lift_2d_to_3d), made
    dense over the full grid instead of nonzero-gathered lists.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    grid = pixel_grid(h, w, depth.dtype)  # (H, W, 2)
    homo = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)  # (H, W, 3)
    k_inv = jnp.linalg.inv(k)
    rays = jnp.einsum("...ij,hwj->...hwi", k_inv, homo)
    pts_cam = rays * depth[..., None]
    valid = depth > 0
    pts_cam = jnp.where(valid[..., None], pts_cam, 0.0)
    if rotation is None:
        return pts_cam
    r_inv = jnp.swapaxes(rotation, -1, -2)
    pts_obj = jnp.einsum("...ij,...hwj->...hwi",
                         r_inv, pts_cam - translation[..., None, None, :])
    pts_obj = jnp.where(valid[..., None], pts_obj, 0.0)
    return pts_cam, pts_obj


@f32_matmuls
def depth_to_correspondences(depth: jax.Array, k: jax.Array, rotation: jax.Array,
                             translation: jax.Array):
    """Dense (2D, 3D, valid) correspondence grids from a rendered depth map.

    The fixed-shape replacement for reference ``cal_3d_2d_corr``
    (models/utils/pose.py:44-64): every foreground pixel (depth > 0) maps to
    the object-frame 3D point that rendered there.

    Returns:
      points_2d (..., H, W, 2) pixel xy grid,
      points_3d (..., H, W, 3) object-frame points (0 where invalid),
      valid     (..., H, W)   bool foreground mask.
    """
    _, pts_obj = unproject_depth(depth, k, rotation, translation)
    h, w = depth.shape[-2], depth.shape[-1]
    pts_2d = jnp.broadcast_to(pixel_grid(h, w, depth.dtype),
                              depth.shape[:-2] + (h, w, 2))
    return pts_2d, pts_obj, depth > 0


def bilinear_sample(img: jax.Array, coords: jax.Array, *, padding_zero: bool = True):
    """Bilinearly sample `img` (..., H, W, C) at pixel coords (..., P, 2) (xy).

    align_corners=True convention (pixel centers at integer coordinates),
    matching the reference's grid_sample usage
    (models/utils/corr_lookup.py:31-67 with align_corners=True).
    Out-of-bounds samples return 0 when padding_zero, else edge-clamped.
    """
    h, w = img.shape[-3], img.shape[-2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        val = img[..., yc, xc, :] if img.ndim == 3 else jnp.take_along_axis(
            img.reshape(img.shape[:-3] + (h * w, img.shape[-1])),
            (yc * w + xc)[..., None], axis=-2)
        if padding_zero:
            inb = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
            val = jnp.where(inb[..., None], val, 0.0)
        return val

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))

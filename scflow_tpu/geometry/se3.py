"""SE(3) pose composition and error metrics (pure JAX, batched).

The core op is :func:`compose_delta_pose` — the TPU-native equivalent of the
reference's ``get_pose_from_delta_pose`` (models/utils/pose.py:124-149),
which composes a predicted delta pose (ortho6d/quaternion rotation + a
screen-space-coupled translation update) onto the running pose estimate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotation import ortho6d_to_matrix, quaternion_to_matrix, rotation_angle_deg

from ..utils.precision import f32_matmuls


@f32_matmuls
def compose_delta_pose(
    rotation_delta: jax.Array,
    translation_delta: jax.Array,
    rotation_src: jax.Array,
    translation_src: jax.Array,
    weight: float = 10.0,
    depth_transform: str = "exp",
    detach_depth_for_xy: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Compose a delta pose onto a source pose.

    Semantics of reference models/utils/pose.py:124-149:
      - rotation_delta: (N, 4) quaternion (xyzw) or (N, 6) ortho6d.
        R_dst = R_delta @ R_src.
      - translation update is parameterized in screen space:
          vz = tz_src / exp(dz)                (depth_transform == 'exp')
          vz = tz_src * (dz + 1)               (otherwise)
          vx = vz * (dx / weight + tx_src / tz_src)
          vy = vz * (dy / weight + ty_src / tz_src)
        With detach_depth_for_xy, vz is gradient-stopped inside vx/vy
        (the shipped SCFlow config sets this True,
        configs/refine_models/scflow_ycbv_pbr.py:213).

    Returns (R_dst (N,3,3), t_dst (N,3)).
    """
    if rotation_delta.shape[-1] == 4:
        r_delta = quaternion_to_matrix(rotation_delta)
    elif rotation_delta.shape[-1] == 6:
        r_delta = ortho6d_to_matrix(rotation_delta)
    else:
        raise ValueError(
            f"rotation_delta must be (...,4) or (...,6), got {rotation_delta.shape}")

    rotation_dst = jnp.matmul(r_delta, rotation_src)

    tx, ty, tz = translation_src[..., 0], translation_src[..., 1], translation_src[..., 2]
    dx, dy, dz = translation_delta[..., 0], translation_delta[..., 1], translation_delta[..., 2]

    if depth_transform == "exp":
        vz = tz / jnp.exp(dz)
    else:
        vz = tz * (dz + 1.0)

    vz_for_xy = jax.lax.stop_gradient(vz) if detach_depth_for_xy else vz
    vx = vz_for_xy * (dx / weight + tx / tz)
    vy = vz_for_xy * (dy / weight + ty / tz)
    translation_dst = jnp.stack([vx, vy, vz], axis=-1)
    return rotation_dst, translation_dst


@f32_matmuls
def transform_points(rotation: jax.Array, translation: jax.Array,
                     points: jax.Array) -> jax.Array:
    """Apply (..., 3, 3) @ (..., N, 3) + (..., 3) → (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", rotation, points) + translation[..., None, :]


@f32_matmuls
def invert_pose(rotation: jax.Array, translation: jax.Array):
    """Inverse of p → R p + t: (Rᵀ, -Rᵀ t)."""
    r_inv = jnp.swapaxes(rotation, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, translation)
    return r_inv, t_inv


@f32_matmuls
def relative_pose(r_a, t_a, r_b, t_b):
    """Pose taking frame-b coordinates to frame-a: (R_a R_bᵀ, t_a - R_a R_bᵀ t_b)."""
    r_rel = jnp.matmul(r_a, jnp.swapaxes(r_b, -1, -2))
    t_rel = t_a - jnp.einsum("...ij,...j->...i", r_rel, t_b)
    return r_rel, t_rel


def translation_error(t1: jax.Array, t2: jax.Array) -> jax.Array:
    """Euclidean translation error (reference datasets/pose.py:114-119)."""
    return jnp.linalg.norm(t1 - t2, axis=-1)


@f32_matmuls
def pose_error(r_pred, t_pred, r_gt, t_gt):
    """(rotation angle deg, translation distance)."""
    return rotation_angle_deg(r_pred, r_gt), translation_error(t_pred, t_gt)


@f32_matmuls
def add_error(r_pred, t_pred, r_gt, t_gt, points):
    """ADD error: mean distance between mesh points under pred vs gt pose.

    points: (N, P, 3) or (P, 3) broadcast over batch.
    Reference semantics: metrics/add.py eval_pose_error (non-symmetric branch).
    """
    p_pred = transform_points(r_pred, t_pred, points)
    p_gt = transform_points(r_gt, t_gt, points)
    return jnp.mean(jnp.linalg.norm(p_pred - p_gt, axis=-1), axis=-1)


@f32_matmuls
def adds_error(r_pred, t_pred, r_gt, t_gt, points):
    """ADD-S error: symmetric closest-point mean distance.

    For each gt-transformed point, distance to the nearest pred-transformed
    point (reference metrics/add.py:386-394 via pytorch3d knn_points; here a
    dense (P, P) distance computed on the MXU).
    points: (..., P, 3); P is expected ≲ a few thousand (reference samples 1000).
    """
    p_pred = transform_points(r_pred, t_pred, points)   # (..., P, 3)
    p_gt = transform_points(r_gt, t_gt, points)
    # |a - b|^2 = |a|^2 + |b|^2 - 2 a·b — one batched matmul on the MXU.
    sq_pred = jnp.sum(p_pred * p_pred, axis=-1)
    sq_gt = jnp.sum(p_gt * p_gt, axis=-1)
    cross = jnp.einsum("...id,...jd->...ij", p_gt, p_pred)
    d2 = sq_gt[..., :, None] + sq_pred[..., None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=-1)), axis=-1)

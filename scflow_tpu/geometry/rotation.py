"""Rotation parameterizations and conversions (pure JAX, batched).

Replaces the reference's kornia quaternion conversion and the ortho-6D
Gram-Schmidt construction (reference: models/utils/pose.py:153-169).
All functions are batched over a leading axis and jit/vmap friendly.

Conventions:
- Quaternions are (x, y, z, w) to match the kornia/`[0,0,0,1]`-identity
  convention the reference pose head initializes with
  (reference: models/head/pose_head.py:94).
- Rotation matrices act on column vectors: ``p_cam = R @ p_obj + t``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_EPS = 1e-8


def normalize(v: jax.Array, axis: int = -1, eps: float = _EPS) -> jax.Array:
    """L2-normalize along `axis` with a numerical floor."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


@f32_matmuls
def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """Convert (..., 4) quaternions in (x, y, z, w) order to (..., 3, 3) matrices.

    Matches kornia.geometry.conversions.quaternion_to_rotation_matrix
    semantics used at reference models/utils/pose.py:133 (with kornia's
    legacy xyzw order that the head's [0,0,0,1] identity bias implies).
    """
    quat = normalize(quat)
    x, y, z, w = jnp.moveaxis(quat, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Convert (..., 3, 3) rotation matrices to (..., 4) quaternions (x, y, z, w).

    Branch-free Shepperd's method: compute all four candidate constructions
    and select the best-conditioned one (largest pivot), so it is safe under
    vmap/jit for any input rotation.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, one per pivot (w, x, y, z).
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    q_w = jnp.stack(
        [m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1
    ) / (2.0 * safe_sqrt(1.0 + tr))[..., None]
    q_x = jnp.stack(
        [1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1
    ) / (2.0 * safe_sqrt(1.0 + m00 - m11 - m22))[..., None]
    q_y = jnp.stack(
        [m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1
    ) / (2.0 * safe_sqrt(1.0 - m00 + m11 - m22))[..., None]
    q_z = jnp.stack(
        [m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1
    ) / (2.0 * safe_sqrt(1.0 - m00 - m11 + m22))[..., None]

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, choice[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    return normalize(q)


@f32_matmuls
def ortho6d_to_matrix(ortho6d: jax.Array) -> jax.Array:
    """Gram-Schmidt a (..., 6) continuous rotation rep into (..., 3, 3).

    Semantics of reference models/utils/pose.py:153-169 (Zhou et al. 2019):
    x = normalize(a1); z = normalize(x × a2); y = z × x; columns are x,y,z.
    """
    a1 = ortho6d[..., 0:3]
    a2 = ortho6d[..., 3:6]
    x = normalize(a1)
    z = normalize(jnp.cross(x, a2))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_ortho6d(m: jax.Array) -> jax.Array:
    """Inverse-ish of ortho6d_to_matrix: first two columns, flattened (..., 6)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


@f32_matmuls
def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Rodrigues formula for (..., 3) axis-angle vectors → (..., 3, 3)."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    axis = axis_angle / jnp.maximum(angle, _EPS)
    x, y, z = jnp.moveaxis(axis, -1, 0)
    c = jnp.cos(angle)[..., 0]
    s = jnp.sin(angle)[..., 0]
    C = 1.0 - c
    m = jnp.stack(
        [
            x * x * C + c, x * y * C - z * s, x * z * C + y * s,
            y * x * C + z * s, y * y * C + c, y * z * C - x * s,
            z * x * C - y * s, z * y * C + x * s, z * z * C + c,
        ],
        axis=-1,
    ).reshape(axis_angle.shape[:-1] + (3, 3))
    # angle == 0 → identity
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    return jnp.where(angle[..., None] < _EPS, eye, m)


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) → axis-angle (..., 3) (Rodrigues inverse)."""
    q = matrix_to_quaternion(m)
    xyz, w = q[..., :3], q[..., 3]
    n = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(n, jnp.abs(w))
    sign = jnp.where(w < 0, -1.0, 1.0)
    axis = xyz * (sign / jnp.maximum(n, _EPS))[..., None]
    return axis * angle[..., None]


@f32_matmuls
def rotation_angle_deg(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Geodesic angle in degrees between two batches of rotation matrices.

    Reference semantics: datasets/pose.py:106-112 (eval_rot_error).
    """
    rel = jnp.matmul(r1, jnp.swapaxes(r2, -1, -2))
    cos = 0.5 * (jnp.trace(rel, axis1=-2, axis2=-1) - 1.0)
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


@f32_matmuls
def random_rotation(key: jax.Array, batch_shape: tuple = ()) -> jax.Array:
    """Uniformly random rotation matrices for tests (via random quaternions)."""
    q = jax.random.normal(key, batch_shape + (4,))
    return quaternion_to_matrix(normalize(q))

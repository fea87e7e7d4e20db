"""Phong shading with point lights (pure JAX).

Replaces pytorch3d's HardPhongShader + PointLights path used by the
reference renderer (models/utils/rendering.py:158-168,210-229). Matches the
pytorch3d formula: pixel = texel * (ambient + diffuse * max(N·L, 0))
+ specular_color * max(R·V, 0)^shininess, hard blending (top face only),
configurable background color.

Frames: mesh vertices stay in the object frame; the camera pose (R, t) maps
object → camera. Lights are specified in the object frame, like pytorch3d's
"world" frame in the reference's usage.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PhongParams:
    """pytorch3d PointLights + Materials defaults."""
    ambient_color: tuple = (0.5, 0.5, 0.5)
    diffuse_color: tuple = (0.3, 0.3, 0.3)
    specular_color: tuple = (0.2, 0.2, 0.2)
    shininess: float = 64.0


def phong_shade(points_obj: jax.Array, normals_obj: jax.Array,
                albedo: jax.Array, mask: jax.Array,
                light_location_obj: jax.Array, camera_location_obj: jax.Array,
                params: PhongParams = PhongParams(),
                background_color=(0.5, 0.5, 0.5)) -> jax.Array:
    """Shade rasterized pixels.

    Args:
      points_obj:  (..., H, W, 3) object-frame surface point per pixel.
      normals_obj: (..., H, W, 3) interpolated (approx unit) normals.
      albedo:      (..., H, W, 3) interpolated vertex colors.
      mask:        (..., H, W) bool foreground.
      light_location_obj: (..., 3) point-light position (object frame).
      camera_location_obj: (..., 3) camera center (object frame).

    Returns (..., H, W, 3) RGB in [0, 1]-ish (pytorch3d does not clamp
    before blending; we clamp to [0, 1] at the end like image consumers do).
    """
    amb = jnp.asarray(params.ambient_color, albedo.dtype)
    dif = jnp.asarray(params.diffuse_color, albedo.dtype)
    spec = jnp.asarray(params.specular_color, albedo.dtype)

    n = normals_obj / jnp.maximum(
        jnp.linalg.norm(normals_obj, axis=-1, keepdims=True), 1e-12)
    l_vec = light_location_obj[..., None, None, :] - points_obj
    l_dir = l_vec / jnp.maximum(jnp.linalg.norm(l_vec, axis=-1, keepdims=True), 1e-12)
    v_vec = camera_location_obj[..., None, None, :] - points_obj
    v_dir = v_vec / jnp.maximum(jnp.linalg.norm(v_vec, axis=-1, keepdims=True), 1e-12)

    # two-sided shading: the rasterizer accepts both windings, so flip
    # normals facing away from the viewer before lighting.
    facing = jnp.sum(n * v_dir, axis=-1, keepdims=True)
    n = jnp.where(facing < 0, -n, n)
    ndotl = jnp.maximum(jnp.sum(n * l_dir, axis=-1, keepdims=True), 0.0)

    diffuse = dif * ndotl
    # specular: reflect L about N
    r_dir = 2.0 * jnp.sum(n * l_dir, axis=-1, keepdims=True) * n - l_dir
    rdotv = jnp.maximum(jnp.sum(r_dir * v_dir, axis=-1), 0.0)
    specular = spec * (rdotv ** params.shininess)[..., None]

    color = albedo * (amb + diffuse) + specular
    bg = jnp.asarray(background_color, color.dtype)
    color = jnp.where(mask[..., None], color, bg)
    return jnp.clip(color, 0.0, 1.0)

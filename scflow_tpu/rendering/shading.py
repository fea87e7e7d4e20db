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


def phong_color(points_obj: jax.Array, normals_obj: jax.Array,
                albedo: jax.Array, light_location_obj: jax.Array,
                camera_location_obj: jax.Array,
                params: PhongParams = PhongParams()) -> jax.Array:
    """Unclipped Phong color at arbitrary shade points.

    Shape-generic: ``points_obj``/``normals_obj``/``albedo`` are (..., 3)
    with any leading shape; ``light_location_obj``/``camera_location_obj``
    are (3,) (or broadcastable against the leading shape). Used per-pixel
    (Phong shading), per-face-vertex (Gouraud) and per-face (Flat).
    """
    amb = jnp.asarray(params.ambient_color, albedo.dtype)
    dif = jnp.asarray(params.diffuse_color, albedo.dtype)
    spec = jnp.asarray(params.specular_color, albedo.dtype)

    n = normals_obj / jnp.maximum(
        jnp.linalg.norm(normals_obj, axis=-1, keepdims=True), 1e-12)
    l_vec = light_location_obj - points_obj
    l_dir = l_vec / jnp.maximum(jnp.linalg.norm(l_vec, axis=-1, keepdims=True), 1e-12)
    v_vec = camera_location_obj - points_obj
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
    return albedo * (amb + diffuse) + specular


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
    color = phong_color(points_obj, normals_obj, albedo,
                        light_location_obj[..., None, None, :],
                        camera_location_obj[..., None, None, :], params)
    bg = jnp.asarray(background_color, color.dtype)
    color = jnp.where(mask[..., None], color, bg)
    return jnp.clip(color, 0.0, 1.0)


def silhouette_alpha(face_id: jax.Array, tri_xy: jax.Array,
                     image_size: tuple, sigma: float = 1e-4,
                     soft: bool = True) -> jax.Array:
    """Silhouette coverage from rasterizer fragments (the reference's
    ``render_mask=True`` SoftSilhouetteShader output,
    models/utils/rendering.py:171-183,232-248).

    pytorch3d computes ``alpha = 1 - prod_k(1 - sigmoid(-d_k / sigma))``
    over the ``faces_per_pixel`` nearest faces, where ``d_k`` is the signed
    squared NDC distance of the pixel to face k (negative inside). With the
    shipped settings (``blur_radius=0`` → only covering faces rasterize;
    one winning face per pixel) this reduces to
    ``sigmoid(d_inside² / sigma)`` on covered pixels and 0 elsewhere —
    which is what this computes, from the z-test winner's edges.

    Args:
      face_id: (H, W) winning face index, -1 for background.
      tri_xy:  (F, 3, 2) per-face projected vertex pixel coordinates.
      image_size: (H, W), for the pixel→NDC scale (2 / min(H, W) — the
        pytorch3d convention where the short side spans [-1, 1]).
      sigma: BlendParams.sigma (NDC² units; pytorch3d default 1e-4).
      soft: if False, return the hard coverage mask as float.

    Returns (H, W) float32 alpha in [0, 1].
    """
    covered = face_id >= 0
    if not soft:
        return covered.astype(jnp.float32)
    h, w = image_size
    ys, xs = jnp.mgrid[0:h, 0:w]
    p = jnp.stack([xs + 0.5, ys + 0.5], axis=-1).astype(jnp.float32)
    tri = tri_xy[jnp.maximum(face_id, 0)]                    # (H, W, 3, 2)

    d2_min = jnp.full((h, w), jnp.inf, jnp.float32)
    for e in range(3):
        a, b = tri[..., e, :], tri[..., (e + 1) % 3, :]
        ab = b - a
        t = jnp.clip(jnp.sum((p - a) * ab, axis=-1)
                     / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12), 0., 1.)
        proj = a + t[..., None] * ab
        d2_min = jnp.minimum(d2_min, jnp.sum((p - proj) ** 2, axis=-1))

    ndc_per_pix = 2.0 / min(h, w)
    d2_ndc = d2_min * (ndc_per_pix * ndc_per_pix)
    alpha = jax.nn.sigmoid(d2_ndc / sigma)
    return jnp.where(covered, alpha, 0.0)

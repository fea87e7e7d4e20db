"""Batched mesh renderer: the TPU-native pytorch3d replacement.

Renders a batch of (pose, intrinsics, class-label) tuples into RGB, depth
and mask with static shapes throughout — one gather from the MeshBank, a
vmapped rasterize, and Phong shading. Capability parity with the reference
``Renderer`` (models/utils/rendering.py:77-248): per-class meshes keyed by
label, OpenCV-convention cameras, Phong point lights with the fork's
"separate lights along the viewing axis" mode, background color, and
image/depth/mask outputs (mask = depth > 0, like base_refiner.py:111).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .mesh import MeshBank
from .rasterizer import (interpolate_face_attributes, project_vertices,
                         rasterize, rasterize_binned)
from .shading import PhongParams, phong_shade


@dataclasses.dataclass
class Renderer:
    """Stateless batched renderer over a static MeshBank.

    Args mirroring the reference renderer config
    (configs/refine_models/scflow_ycbv_pbr.py:258-271):
      mesh_bank: padded per-class meshes.
      image_size: (H, W).
      background_color: RGB in [0,1] (reference: (.5,.5,.5)).
      separate_lights: per-object point light placed up the viewing axis
        (reference rendering.py:222-227); else a default pytorch3d-style
        light at the object-frame position (0, 1, 0).
      light_offset: distance subtracted from the object's min camera z for
        the light location (reference uses znear - 400, floored at 0).
    """
    mesh_bank: MeshBank
    image_size: tuple[int, int]
    background_color: tuple = (0.5, 0.5, 0.5)
    shading: PhongParams = dataclasses.field(default_factory=PhongParams)
    separate_lights: bool = True
    light_offset: float = 400.0
    face_chunk: int = 256
    # 'auto' (Pallas tile kernel on TPU, XLA tile-binned on CPU),
    # 'pallas', 'binned' (XLA tile-binned top-K), 'scan' (dense XLA scan).
    rasterizer: str = "auto"
    # 3D backface culling (normal · view direction). Exact-output 2× saving
    # for closed consistently-wound meshes; disable for open/flipped meshes.
    cull_backfaces: bool = True

    def __call__(self, rotations: jax.Array, translations: jax.Array,
                 k: jax.Array, labels: jax.Array) -> dict:
        """Render a batch.

        Args:
          rotations: (N, 3, 3) object→camera rotations (OpenCV convention).
          translations: (N, 3).
          k: (N, 3, 3) intrinsics.
          labels: (N,) int class ids.

        Returns dict(images (N,H,W,3), depth (N,H,W), mask (N,H,W) bool).
        """
        return _render(self, rotations, translations, k, labels)


@partial(jax.jit, static_argnames=("self",))
def _render(self: Renderer, rotations, translations, k, labels):
    h, w = self.image_size
    verts, faces, face_valid, vert_normals, vert_colors = \
        self.mesh_bank.gather(labels)
    tri_pos, tri_attr_all = self.mesh_bank.gather_tris(labels)

    rasterizer_kind = self.rasterizer
    interpret = jax.default_backend() == "cpu"
    if rasterizer_kind == "auto":
        # the Pallas kernel is ~2x the XLA binned path on TPU; under
        # interpret mode (CPU) the XLA path is much faster. Mosaic needs
        # full 128-lane output blocks: the kernel packs 4 tiles per program
        # (tpb=4 → 32×128 blocks), so width must be a multiple of 4·TILE
        # and height of TILE — smaller frames go to the XLA twin.
        from ..ops.rasterize_fast import TILE
        fits = h % TILE == 0 and w % (4 * TILE) == 0
        rasterizer_kind = "pallas" if (fits and not interpret) else "binned"

    def one(verts_i, faces_i, fvalid_i, tri_pos_i, tri_attr, r_i, t_i, k_i):
        # project the per-face vertex table directly (3 entries per shared
        # vertex, but no verts[faces] gathers — scattered row gathers were
        # ~25% of render time on TPU; projection is trivial matmul work)
        tri_cam = tri_pos_i @ r_i.T + t_i              # (F, 3, 3)
        uvw = tri_cam @ k_i.T
        tri_z = uvw[..., 2]
        tri_xy = uvw[..., :2] / (tri_z[..., None] + 1e-8)
        if self.cull_backfaces:
            # camera-frame face normal vs centroid direction: back faces of
            # closed outward-normal meshes never win the z-test, so culling
            # them is output-identical and halves rasterization work.
            fn = jnp.cross(tri_cam[:, 1] - tri_cam[:, 0],
                           tri_cam[:, 2] - tri_cam[:, 0])
            centroid = tri_cam.mean(axis=1)
            fvalid_i = fvalid_i & (jnp.sum(fn * centroid, axis=-1) < 0.0)
        if rasterizer_kind == "pallas":
            from ..ops.rasterize_fast import rasterize_fast

            frag = rasterize_fast(None, None, faces_i, fvalid_i, h, w,
                                  tri_attrs=tri_attr, interpret=interpret,
                                  return_bary=False,
                                  tri_xy=tri_xy, tri_z=tri_z)
        elif rasterizer_kind == "binned":
            # attributes interpolate inside the tile pass (no gathers)
            xy, z = project_vertices(verts_i, r_i, t_i, k_i)
            frag = rasterize_binned(xy, z, faces_i, fvalid_i, h, w,
                                    tri_attrs=tri_attr, return_bary=False)
        else:
            xy, z = project_vertices(verts_i, r_i, t_i, k_i)
            frag = rasterize(xy, z, faces_i, fvalid_i, h, w,
                             chunk=self.face_chunk)
        mask = frag["face_id"] >= 0
        if "attrs" in frag:
            interp = frag["attrs"]
        else:
            # one packed row-gather for all per-vertex attributes
            safe = jnp.maximum(frag["face_id"], 0)
            rows = tri_attr[safe]                       # (H, W, 3, 9)
            interp = jnp.einsum("hwk,hwkd->hwd", frag["bary"], rows)
            interp = jnp.where(mask[..., None], interp, 0.0)
        pts, nrm, alb = interp[..., 0:3], interp[..., 3:6], interp[..., 6:9]

        # camera center in the object frame: -Rᵀ t
        cam_obj = -r_i.T @ t_i
        if self.separate_lights:
            # Reference (rendering.py:222-227): light at R @ [0, 0, zmin-400]
            # expressed in the mesh frame.
            zmin = jnp.min(verts_i @ r_i.T[:, 2] + t_i[2])
            loc = jnp.maximum(zmin - self.light_offset, 0.0)
            light_obj = r_i @ jnp.array([0.0, 0.0, 1.0], verts_i.dtype) * loc
        else:
            light_obj = jnp.asarray([0.0, 1.0, 0.0], verts_i.dtype)

        rgb = phong_shade(pts, nrm, alb, mask, light_obj, cam_obj,
                          params=self.shading,
                          background_color=self.background_color)
        return rgb, frag["zbuf"], mask

    images, depth, mask = jax.vmap(one)(verts, faces, face_valid, tri_pos,
                                        tri_attr_all, rotations, translations,
                                        k)
    return {"images": images, "depth": depth, "mask": mask}


# Renderer must hash as a static argument for jit.
def _renderer_hash(self):
    return id(self)


def _renderer_eq(self, other):
    return self is other


Renderer.__hash__ = _renderer_hash
Renderer.__eq__ = _renderer_eq

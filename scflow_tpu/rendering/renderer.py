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
from .shading import PhongParams, phong_color, phong_shade, silhouette_alpha


@dataclasses.dataclass
class Renderer:
    """Stateless batched renderer over a static MeshBank.

    Args mirroring the reference renderer config
    (configs/refine_models/scflow_ycbv_pbr.py:258-271 +
    models/utils/rendering.py:77-120):
      mesh_bank: padded per-class meshes.
      image_size: (H, W).
      background_color: RGB in [0,1] (reference: (.5,.5,.5)).
      separate_lights: per-object point light placed up the viewing axis
        (reference rendering.py:222-227); else a default pytorch3d-style
        light at the object-frame position (0, 1, 0).
      light_offset: distance subtracted from the object's min camera z for
        the light location (reference uses znear - 400, floored at 0).
      shader_type: 'phong' (per-pixel, reference HardPhongShader — the
        shipped default), 'gouraud' (shade at face vertices, interpolate
        colors) or 'flat' (one color per face from its geometric normal),
        the reference's shader_mapping surface (rendering.py:71-75).
      render_image / render_mask: which outputs to produce (reference
        rendering.py:232-248). ``render_mask`` adds a float ``masks``
        output — hard coverage, or the SoftSilhouetteShader alpha when
        ``soft_blending`` (sigmoid of signed squared NDC edge distance;
        the shipped ``blur_radius=0``/``faces_per_pixel=1`` regime).
      sigma: BlendParams.sigma for the soft silhouette (pytorch3d 1e-4).
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
    shader_type: str = "phong"
    render_image: bool = True
    render_mask: bool = False
    soft_blending: bool = False
    sigma: float = 1e-4

    def __call__(self, rotations: jax.Array, translations: jax.Array,
                 k: jax.Array, labels: jax.Array,
                 mesh_bank: MeshBank | None = None) -> dict:
        """Render a batch.

        Args:
          rotations: (N, 3, 3) object→camera rotations (OpenCV convention).
          translations: (N, 3).
          k: (N, 3, 3) intrinsics.
          labels: (N,) int class ids.
          mesh_bank: optional bank overriding ``self.mesh_bank`` — pass the
            (pytree) bank as a traced ARGUMENT from enclosing jitted
            programs so mesh data does not bake into each program as
            multi-MB constants (2-8 min/compile on the remote-compile TPU
            path). Callers at a jit boundary should thread
            ``renderer.mesh_bank.with_tri_tables()`` through their own
            argument list and pass it here.

        Returns dict(images (N,H,W,3), depth (N,H,W), mask (N,H,W) bool
        [, masks (N,H,W) float silhouette when ``render_mask``]); images
        present unless ``render_image=False``.
        """
        if mesh_bank is not None:
            # direct (unjitted) impl: inside an enclosing jit this inlines
            # with the bank as traced inputs; eagerly it dispatches op-by-op
            # (use the default path for eager rendering instead)
            rself = dataclasses.replace(self, mesh_bank=mesh_bank)
            return _render_impl(rself, rotations, translations, k, labels)
        # eager path: jit with the bank as an ARGUMENT too — the program
        # is identical for every Renderer over same-shaped banks and
        # carries no mesh constants
        return _render(self, rotations, translations, k, labels,
                       self.mesh_bank.with_tri_tables())


@partial(jax.jit, static_argnames=("self",))
def _render(self: Renderer, rotations, translations, k, labels, mesh_bank):
    rself = dataclasses.replace(self, mesh_bank=mesh_bank)
    return _render_impl(rself, rotations, translations, k, labels)


def _render_impl(self: Renderer, rotations, translations, k, labels):
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

        # shader dispatch: what the rasterizer interpolates.
        # phong   → geometry (pts+nrm+alb, 9 dims), shade per pixel
        # gouraud → phong color at each face vertex (3 dims)
        # flat    → one phong color per face from the geometric normal
        if self.shader_type == "phong":
            attr_table = tri_attr
        elif self.shader_type == "gouraud":
            attr_table = phong_color(
                tri_attr[..., 0:3], tri_attr[..., 3:6], tri_attr[..., 6:9],
                light_obj, cam_obj, params=self.shading)
        elif self.shader_type == "flat":
            fn_obj = jnp.cross(tri_pos_i[:, 1] - tri_pos_i[:, 0],
                               tri_pos_i[:, 2] - tri_pos_i[:, 0])
            face_color = phong_color(
                tri_pos_i.mean(axis=1), fn_obj, tri_attr[..., 6:9].mean(axis=1),
                light_obj, cam_obj, params=self.shading)
            attr_table = jnp.tile(face_color[:, None, :], (1, 3, 1))
        else:
            raise ValueError(f"unknown shader_type {self.shader_type!r}")

        need_attrs = self.render_image
        if rasterizer_kind == "pallas":
            from ..ops.rasterize_fast import rasterize_fast

            frag = rasterize_fast(None, None, faces_i, fvalid_i, h, w,
                                  tri_attrs=attr_table if need_attrs else None,
                                  interpret=interpret, return_bary=False,
                                  tri_xy=tri_xy, tri_z=tri_z)
        elif rasterizer_kind == "binned":
            # attributes interpolate inside the tile pass (no gathers)
            xy, z = project_vertices(verts_i, r_i, t_i, k_i)
            frag = rasterize_binned(xy, z, faces_i, fvalid_i, h, w,
                                    tri_attrs=attr_table if need_attrs else None,
                                    return_bary=False)
        else:
            xy, z = project_vertices(verts_i, r_i, t_i, k_i)
            frag = rasterize(xy, z, faces_i, fvalid_i, h, w,
                             chunk=self.face_chunk)
        mask = frag["face_id"] >= 0

        rgb = None
        if self.render_image:
            if "attrs" in frag:
                interp = frag["attrs"]
            else:
                # one packed row-gather for all per-vertex attributes
                safe = jnp.maximum(frag["face_id"], 0)
                rows = attr_table[safe]                 # (H, W, 3, D)
                interp = jnp.einsum("hwk,hwkd->hwd", frag["bary"], rows)
                interp = jnp.where(mask[..., None], interp, 0.0)
            if self.shader_type == "phong":
                pts, nrm, alb = (interp[..., 0:3], interp[..., 3:6],
                                 interp[..., 6:9])
                rgb = phong_shade(pts, nrm, alb, mask, light_obj, cam_obj,
                                  params=self.shading,
                                  background_color=self.background_color)
            else:
                bg = jnp.asarray(self.background_color, interp.dtype)
                rgb = jnp.clip(jnp.where(mask[..., None], interp, bg),
                               0.0, 1.0)

        sil = None
        if self.render_mask:
            sil = silhouette_alpha(frag["face_id"], tri_xy, (h, w),
                                   sigma=self.sigma,
                                   soft=self.soft_blending)
        return rgb, frag["zbuf"], mask, sil

    images, depth, mask, sil = jax.vmap(one)(
        verts, faces, face_valid, tri_pos, tri_attr_all, rotations,
        translations, k)
    out = {"depth": depth, "mask": mask}
    if images is not None:
        out["images"] = images
    if sil is not None:
        out["masks"] = sil
    return out


# Renderer must hash as a static argument for jit.
def _renderer_hash(self):
    return id(self)


def _renderer_eq(self, other):
    return self is other


Renderer.__hash__ = _renderer_hash
Renderer.__eq__ = _renderer_eq

"""Renderer shader/mask surface: Gouraud, Flat, render_mask, silhouette.

Parity targets: the reference renderer's shader_mapping
(models/utils/rendering.py:71-75 — Phong/Gouraud/Flat), the
``render_mask=True`` SoftSilhouetteShader branch (rendering.py:171-183,
232-248), and the ``render_image=False`` mask-only mode. Golden rule from
VERDICT r3: hard silhouette ≡ ``depth > 0``.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.rendering.mesh import build_mesh_bank
from scflow_tpu.rendering.shading import PhongParams, phong_color


@pytest.fixture(scope="module")
def scene():
    bank = make_test_meshes(num_classes=2, subdivisions=2, radius=50.0)
    n = 2
    r = jnp.tile(jnp.eye(3), (n, 1, 1))
    t = jnp.tile(jnp.asarray([0.0, 0.0, 400.0]), (n, 1))
    k = jnp.tile(jnp.asarray([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]]),
                 (n, 1, 1))
    labels = jnp.arange(n, dtype=jnp.int32)
    return bank, (r, t, k, labels)


def _render(bank, args, **kw):
    renderer = Renderer(bank, image_size=(128, 128), **kw)
    return {k: np.asarray(v) for k, v in renderer(*args).items()}


class TestRenderMask:
    def test_hard_mask_equals_depth_positive(self, scene):
        bank, args = scene
        out = _render(bank, args, render_mask=True, soft_blending=False)
        np.testing.assert_array_equal(out["masks"],
                                      (out["depth"] > 0).astype(np.float32))

    def test_soft_silhouette_bounds(self, scene):
        bank, args = scene
        out = _render(bank, args, render_mask=True, soft_blending=True)
        hard = out["depth"] > 0
        sil = out["masks"]
        # zero outside coverage; in (0.5, 1] inside (sigmoid of the
        # positive squared distance to the WINNING face's boundary — the
        # faces_per_pixel=1 pytorch3d formula, so alpha stays near 0.5
        # wherever the covering triangle is small)
        assert np.all(sil[~hard] == 0.0)
        assert np.all(sil[hard] > 0.5) and np.all(sil[hard] <= 1.0)

    def test_soft_silhouette_saturates_on_large_face(self):
        """Far from the winning face's edges alpha → 1; near them → 0.5."""
        verts = np.array([[-60, -60, 0], [60, -60, 0], [0, 80, 0]],
                         np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        bank = build_mesh_bank([dict(verts=verts, faces=faces)])
        renderer = Renderer(bank, image_size=(128, 128), render_mask=True,
                            soft_blending=True, cull_backfaces=False)
        out = renderer(jnp.eye(3)[None],
                       jnp.asarray([[0.0, 0.0, 200.0]]),
                       jnp.asarray([[[150.0, 0, 64], [0, 150.0, 64],
                                     [0, 0, 1]]]),
                       jnp.zeros((1,), jnp.int32))
        sil = np.asarray(out["masks"])[0]
        hard = np.asarray(out["depth"])[0] > 0
        assert sil[hard].max() > 0.999
        assert sil[hard].min() < 0.7  # near-edge pixels stay soft

    def test_mask_only_mode(self, scene):
        bank, args = scene
        out = _render(bank, args, render_image=False, render_mask=True)
        assert "images" not in out
        assert set(out) == {"depth", "mask", "masks"}


class TestShaders:
    def test_gouraud_close_to_phong_on_smooth_mesh(self, scene):
        """On a finely tessellated sphere, vertex shading + interpolation
        converges to per-pixel shading (same geometry, mask, depth)."""
        bank, args = scene
        ph = _render(bank, args, shader_type="phong")
        gr = _render(bank, args, shader_type="gouraud")
        np.testing.assert_array_equal(ph["mask"], gr["mask"])
        np.testing.assert_allclose(ph["depth"], gr["depth"])
        diff = np.abs(ph["images"] - gr["images"])[ph["mask"]]
        assert diff.mean() < 0.03, diff.mean()
        # background identical
        np.testing.assert_array_equal(ph["images"][~ph["mask"]],
                                      gr["images"][~gr["mask"]])

    def test_flat_analytic_single_triangle(self):
        """One triangle: the flat color everywhere inside must equal the
        Phong formula at the centroid with the geometric normal."""
        verts = np.array([[-30, -30, 0], [30, -30, 0], [0, 40, 0]],
                         np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        colors = np.array([[0.9, 0.2, 0.1]] * 3, np.float32)
        bank = build_mesh_bank(
            [dict(verts=verts, faces=faces, vert_colors=colors)])
        r = jnp.eye(3)[None]
        t = jnp.asarray([[0.0, 0.0, 300.0]])
        k = jnp.asarray([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]])
        labels = jnp.zeros((1,), jnp.int32)
        renderer = Renderer(bank, image_size=(64, 64), shader_type="flat",
                            cull_backfaces=False)
        out = {kk: np.asarray(v) for kk, v in
               renderer(r, t, k, labels).items()}
        mask = out["mask"][0]
        assert mask.sum() > 50

        fn = np.cross(verts[1] - verts[0], verts[2] - verts[0])
        centroid = verts.mean(axis=0)
        cam_obj = -np.asarray(r[0]).T @ np.asarray(t[0])
        # separate_lights light location for this pose
        zmin = float((verts @ np.asarray(r[0]).T[:, 2] + float(t[0, 2])).min())
        light_obj = np.asarray(r[0]) @ np.array([0.0, 0.0, 1.0]) \
            * max(zmin - 400.0, 0.0)
        want = np.clip(np.asarray(phong_color(
            jnp.asarray(centroid), jnp.asarray(fn), jnp.asarray([0.9, 0.2, 0.1]),
            jnp.asarray(light_obj), jnp.asarray(cam_obj),
            params=PhongParams())), 0.0, 1.0)
        got = out["images"][0][mask]
        np.testing.assert_allclose(got, np.tile(want, (got.shape[0], 1)),
                                   atol=1e-5)

    def test_unknown_shader_raises(self, scene):
        bank, args = scene
        with pytest.raises(ValueError, match="shader_type"):
            _render(bank, args, shader_type="toon")

    def test_all_rasterizers_agree_on_gouraud(self, scene):
        """The shader dispatch must work across the rasterizer backends
        (attrs in-pass vs bary tail)."""
        bank, args = scene
        binned = _render(bank, args, shader_type="gouraud",
                         rasterizer="binned")
        scan = _render(bank, args, shader_type="gouraud", rasterizer="scan")
        # backends may tie-break a handful of exact-edge pixels differently
        assert (binned["mask"] != scan["mask"]).mean() < 1e-3
        both = binned["mask"] & scan["mask"]
        diff = np.abs(binned["images"] - scan["images"])[both]
        assert diff.max() < 1e-4

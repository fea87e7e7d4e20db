"""Rasterizer convention fixtures (SURVEY hard-part #1, VERDICT r2 #8).

The reference renders through pytorch3d with a modified
``cameras_from_opencv_projection`` (models/utils/rendering.py:17-60):
OpenCV (R, t, K) → axis-flipped pytorch3d camera → NDC (scale
(min(W,H)-1)/2, principal offset (WH-1)/2) → screen. These fixtures prove,
analytically and against the JAX rasterizer:

1. the full OpenCV→NDC→screen chain re-derived in numpy collapses to plain
   OpenCV pixel projection u = K p_cam / z at integer pixel centers
   (square and non-square images) — so rasterizing directly in OpenCV
   pixel space, as scflow_tpu does, is the *same camera model*;
2. zbuf equals screen-space (perspective_correct=False, pytorch3d's
   default as used by SCFlow) barycentric interpolation of camera z,
   computed independently in numpy for non-trivial K (fx≠fy, off-center
   principal point) and a rotated+translated triangle;
3. z-ordering: the nearer of two overlapping faces wins everywhere.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from scflow_tpu.rendering.rasterizer import (project_vertices, rasterize,
                                             rasterize_binned)


def _opencv_to_p3d_to_screen(points_cam: np.ndarray, k: np.ndarray,
                             image_hw: tuple) -> np.ndarray:
    """Re-derivation of the reference camera chain, in numpy.

    Follows models/utils/rendering.py:17-60 (cameras_from_opencv_projection)
    composed with pytorch3d's PerspectiveCameras NDC projection and the
    legacy (size-1)/2 NDC→screen transform its scale/c0 choice implies:
        x_ndc = f_ndc · x_p3d / z + p0,  x_screen = c0 - s · x_ndc.
    points_cam are OpenCV camera-frame points (+z forward, +x right,
    +y down); returns pixel coordinates.
    """
    h, w = image_hw
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    s = (min(w, h) - 1) / 2.0                     # NDC scale, both axes
    c0x, c0y = (w - 1) / 2.0, (h - 1) / 2.0

    # axis flip: pytorch3d camera frame has +x left, +y up
    x_p3d = -points_cam[:, 0]
    y_p3d = -points_cam[:, 1]
    z = points_cam[:, 2]

    f_ndc_x, f_ndc_y = fx / s, fy / s
    p0x, p0y = -(cx - c0x) / s, -(cy - c0y) / s

    x_ndc = f_ndc_x * x_p3d / z + p0x
    y_ndc = f_ndc_y * y_p3d / z + p0y

    # legacy NDC→screen (pixel centers at integer coords): u = c0 - s·ndc
    u = c0x - s * x_ndc
    v = c0y - s * y_ndc
    return np.stack([u, v], axis=-1)


class TestCameraChainCollapsesToOpenCV:
    @pytest.mark.parametrize("image_hw", [(64, 64), (48, 80)])
    def test_chain_equals_opencv_projection(self, image_hw, rng):
        """The whole pytorch3d conversion chain is EXACTLY u = K p / z."""
        k = np.asarray([[123.0, 0, 31.0], [0, 141.0, 29.5], [0, 0, 1]])
        pts = rng.normal(size=(200, 3)) * [40, 40, 30] + [0, 0, 500]
        via_p3d = _opencv_to_p3d_to_screen(pts, k, image_hw)
        uvw = pts @ k.T
        direct = uvw[:, :2] / uvw[:, 2:3]
        np.testing.assert_allclose(via_p3d, direct, rtol=1e-9, atol=1e-9)


def _expected_raster(verts: np.ndarray, k: np.ndarray, r: np.ndarray,
                     t: np.ndarray, faces: np.ndarray, hw: tuple):
    """Independent numpy rasterization: OpenCV projection + screen-space
    barycentric z at integer pixel centers (pytorch3d zbuf with
    perspective_correct=False)."""
    h, w = hw
    cam = verts @ r.T + t
    pix = _opencv_to_p3d_to_screen(cam, k, hw)   # the verified chain
    z = cam[:, 2]
    zbuf = np.zeros((h, w))
    best = np.full((h, w), np.inf)
    for f in faces:
        a, b, c = pix[f[0]], pix[f[1]], pix[f[2]]
        za, zb, zc = z[f[0]], z[f[1]], z[f[2]]
        area = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(area) < 1e-12:
            continue
        for py in range(h):
            for px_ in range(w):
                w0 = ((c[0] - b[0]) * (py - b[1])
                      - (c[1] - b[1]) * (px_ - b[0])) / area
                w1 = ((a[0] - c[0]) * (py - c[1])
                      - (a[1] - c[1]) * (px_ - c[0])) / area
                w2 = 1.0 - w0 - w1
                if w0 >= 0 and w1 >= 0 and w2 >= 0:
                    zi = w0 * za + w1 * zb + w2 * zc
                    if zi < best[py, px_]:
                        best[py, px_] = zi
                        zbuf[py, px_] = zi
    return zbuf


class TestZbufAgainstAnalyticChain:
    def _scene(self):
        # non-trivial everything: fx≠fy, off-center principal point,
        # rotated + off-axis translated triangles
        from scipy.spatial.transform import Rotation

        k = np.asarray([[150.0, 0, 36.0], [0, 132.0, 27.0], [0, 0, 1]])
        r = Rotation.from_euler("zyx", [25, -18, 40], degrees=True).as_matrix()
        t = np.asarray([8.0, -6.0, 420.0])
        verts = np.asarray([
            [-40.0, -35.0, 5.0], [45.0, -30.0, -10.0], [0.0, 50.0, 8.0],
            [-30.0, -25.0, -28.0], [38.0, -20.0, -30.0], [2.0, 42.0, -26.0],
        ])
        faces = np.asarray([[0, 1, 2], [3, 4, 5]])
        return verts, k, r, t, faces

    def test_zbuf_matches_numpy_chain(self):
        verts, k, r, t, faces = self._scene()
        h = w = 64
        expected = _expected_raster(verts, k, r, t, faces, (h, w))

        xy, z = project_vertices(jnp.asarray(verts, jnp.float32),
                                 jnp.asarray(r, jnp.float32),
                                 jnp.asarray(t, jnp.float32),
                                 jnp.asarray(k, jnp.float32))
        got = np.asarray(rasterize(xy, z, jnp.asarray(faces),
                                   jnp.ones(2, bool), h, w)["zbuf"])

        cover_exp = expected > 0
        cover_got = got > 0
        # coverage may differ on exact edge-on pixels only
        disagree = cover_exp ^ cover_got
        assert disagree.mean() < 0.005, "coverage mismatch beyond edge pixels"
        both = cover_exp & cover_got
        assert both.sum() > 300
        np.testing.assert_allclose(got[both], expected[both], rtol=1e-4,
                                   atol=5e-3)

    def test_binned_matches_dense(self):
        verts, k, r, t, faces = self._scene()
        h = w = 64
        xy, z = project_vertices(jnp.asarray(verts, jnp.float32),
                                 jnp.asarray(r, jnp.float32),
                                 jnp.asarray(t, jnp.float32),
                                 jnp.asarray(k, jnp.float32))
        dense = rasterize(xy, z, jnp.asarray(faces), jnp.ones(2, bool), h, w)
        binned = rasterize_binned(xy, z, jnp.asarray(faces),
                                  jnp.ones(2, bool), h, w, tile=32,
                                  k_faces=2)
        np.testing.assert_allclose(np.asarray(binned["zbuf"]),
                                   np.asarray(dense["zbuf"]), rtol=1e-5,
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(binned["face_id"]),
                                      np.asarray(dense["face_id"]))

    def test_nearer_face_wins(self):
        """Two parallel triangles; the nearer one owns the overlap and the
        zbuf reports ITS depth (z-test direction + tie handling)."""
        k = np.asarray([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]],
                       np.float32)
        verts = np.asarray([
            [-60, -60, 0], [60, -60, 0], [0, 75, 0],         # at z=500
            [-120, -120, 60], [120, -120, 60], [0, 150, 60],  # larger, z=560
        ], np.float32)
        faces = np.asarray([[3, 4, 5], [0, 1, 2]])       # far face FIRST
        xy, z = project_vertices(jnp.asarray(verts), jnp.eye(3),
                                 jnp.asarray([0, 0, 500], jnp.float32), k)
        out = rasterize(xy, z, jnp.asarray(faces), jnp.ones(2, bool), 64, 64)
        zbuf = np.asarray(out["zbuf"])
        fid = np.asarray(out["face_id"])
        # near face (id 1) covers a smaller screen area inside the far one;
        # wherever it covers, zbuf must be 500 and face_id 1
        near = fid == 1
        assert near.sum() > 100
        np.testing.assert_allclose(zbuf[near], 500.0, atol=1e-2)
        far_only = fid == 0
        assert far_only.sum() > 50
        np.testing.assert_allclose(zbuf[far_only], 560.0, atol=1e-2)

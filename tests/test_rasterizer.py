"""Golden-value rasterizer tests against analytically computed triangles."""
import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.geometry import random_rotation, unproject_depth
from scflow_tpu.rendering import (
    Renderer,
    interpolate_face_attributes,
    make_test_meshes,
    project_vertices,
    rasterize,
)

K = jnp.asarray([[300., 0., 32.], [0., 300., 32.], [0., 0., 1.]])


class TestRasterizeTriangles:
    def test_single_triangle_coverage(self):
        # right triangle covering pixels x>=10, y>=10, x+y <= 40 (at z=100)
        verts_xy = jnp.asarray([[10., 10.], [30., 10.], [10., 30.]])
        verts_z = jnp.asarray([100., 100., 100.])
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        out = rasterize(verts_xy, verts_z, faces, jnp.asarray([True]), 64, 64)
        zb = np.asarray(out["zbuf"])
        assert zb[15, 15] == 100.0           # inside
        assert zb[15, 11] == 100.0
        assert zb[5, 5] == 0.0               # outside
        assert zb[15, 35] == 0.0
        # closed-edge coverage of the lattice triangle = 21·22/2 = 231
        assert (zb > 0).sum() == 231

    def test_winding_invariance(self):
        verts_xy = jnp.asarray([[10., 10.], [30., 10.], [10., 30.]])
        verts_z = jnp.asarray([100., 100., 100.])
        f1 = jnp.asarray([[0, 1, 2]], jnp.int32)
        f2 = jnp.asarray([[0, 2, 1]], jnp.int32)
        o1 = rasterize(verts_xy, verts_z, f1, jnp.asarray([True]), 64, 64)
        o2 = rasterize(verts_xy, verts_z, f2, jnp.asarray([True]), 64, 64)
        np.testing.assert_allclose(np.asarray(o1["zbuf"]),
                                   np.asarray(o2["zbuf"]), atol=1e-3)

    def test_ztest_two_triangles(self):
        # two overlapping triangles, nearer one wins
        verts_xy = jnp.asarray([[10., 10.], [40., 10.], [10., 40.],
                                [15., 15.], [45., 15.], [15., 45.]])
        verts_z = jnp.asarray([100.] * 3 + [50.] * 3)
        faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        out = rasterize(verts_xy, verts_z, faces, jnp.asarray([True, True]), 64, 64)
        zb = np.asarray(out["zbuf"])
        fid = np.asarray(out["face_id"])
        assert abs(zb[20, 20] - 50.0) < 1e-3 and fid[20, 20] == 1  # overlap → nearer
        assert abs(zb[11, 11] - 100.0) < 1e-3 and fid[11, 11] == 0  # only far tri

    def test_depth_interpolation(self):
        # vertical gradient: z varies linearly with y (screen-space interp)
        verts_xy = jnp.asarray([[0., 0.], [63., 0.], [0., 63.]])
        verts_z = jnp.asarray([100., 100., 200.])
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        out = rasterize(verts_xy, verts_z, faces, jnp.asarray([True]), 64, 64)
        zb = np.asarray(out["zbuf"])
        np.testing.assert_allclose(zb[0, 0], 100.0, atol=1e-3)
        np.testing.assert_allclose(zb[31, 0], 100.0 + 100.0 * 31 / 63, rtol=1e-4)

    def test_invalid_faces_skipped(self):
        verts_xy = jnp.asarray([[10., 10.], [30., 10.], [10., 30.]])
        verts_z = jnp.asarray([100., 100., 100.])
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        out = rasterize(verts_xy, verts_z, faces, jnp.asarray([False]), 64, 64)
        assert np.all(np.asarray(out["zbuf"]) == 0.0)

    def test_attribute_interpolation(self):
        verts_xy = jnp.asarray([[0., 0.], [63., 0.], [0., 63.]])
        verts_z = jnp.asarray([100., 100., 100.])
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        out = rasterize(verts_xy, verts_z, faces, jnp.asarray([True]), 64, 64)
        attrs = jnp.asarray([[1., 0.], [0., 1.], [0., 0.]])
        interp = np.asarray(interpolate_face_attributes(
            out["face_id"], out["bary"], faces, attrs))
        np.testing.assert_allclose(interp[0, 0], [1., 0.], atol=1e-4)
        np.testing.assert_allclose(interp[0, 63], [0., 1.], atol=1e-3)
        np.testing.assert_allclose(interp[0, 31], [1 - 31 / 63, 31 / 63], atol=1e-3)


class TestRendererEndToEnd:
    def setup_method(self):
        self.bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.)
        self.renderer = Renderer(self.bank, image_size=(64, 64))

    def _pose(self, n):
        r = random_rotation(jax.random.PRNGKey(0), (n,))
        t = jnp.tile(jnp.asarray([0., 0., 600.]), (n, 1))
        k = jnp.tile(K, (n, 1, 1))
        return r, t, k

    def test_sphere_silhouette_and_depth(self):
        r, t, k = self._pose(1)
        out = self.renderer(r, t, k, jnp.asarray([0]))
        depth = np.asarray(out["depth"][0])
        mask = np.asarray(out["mask"][0])
        # sphere radius 60 at z=600 with f=300 → screen radius ~30px at center
        assert mask[32, 32]
        assert not mask[1, 1]
        area = mask.sum()
        expect = np.pi * 30 ** 2
        assert abs(area - expect) / expect < 0.12  # coarse icosphere
        # front of sphere at ~540mm
        assert abs(depth[32, 32] - 540.0) < 15.0
        # depth increases toward the limb
        assert depth[32, 32] < depth[32, 45] or not mask[32, 45]

    def test_mask_equals_depth_positive(self):
        r, t, k = self._pose(2)
        out = self.renderer(r, t, k, jnp.asarray([0, 1]))
        np.testing.assert_array_equal(np.asarray(out["mask"]),
                                      np.asarray(out["depth"]) > 0)

    def test_batched_labels(self):
        r, t, k = self._pose(2)
        out = self.renderer(r, t, k, jnp.asarray([0, 1]))
        assert out["images"].shape == (2, 64, 64, 3)
        # box (label 1) and sphere (label 0) have different silhouettes
        m0 = np.asarray(out["mask"][0]).sum()
        m1 = np.asarray(out["mask"][1]).sum()
        assert m0 != m1

    def test_background_color(self):
        r, t, k = self._pose(1)
        out = self.renderer(r, t, k, jnp.asarray([0]))
        img = np.asarray(out["images"][0])
        mask = np.asarray(out["mask"][0])
        np.testing.assert_allclose(img[~mask], 0.5, atol=1e-6)
        # foreground is lit and not uniform background
        assert img[mask].std() > 0.01

    def test_depth_consistent_with_unprojection(self):
        # unprojecting the rendered depth and reprojecting under the same
        # pose must be self-consistent (drives the shape-constraint path)
        r, t, k = self._pose(1)
        out = self.renderer(r, t, k, jnp.asarray([0]))
        depth = out["depth"][0]
        pts_cam = unproject_depth(depth, K)
        # all camera-frame points within the mesh's distance bounds
        d = np.asarray(jnp.linalg.norm(pts_cam, axis=-1))[np.asarray(out["mask"][0])]
        assert d.min() > 500 and d.max() < 700


class TestBinnedRasterizer:
    """XLA tile-binned rasterizer must match the dense scan rasterizer."""

    def _scene(self, seed=0, label=0):
        from scflow_tpu.rendering import make_test_meshes
        from scflow_tpu.rendering.rasterizer import project_vertices
        bank = make_test_meshes(num_classes=2, subdivisions=2, radius=60.)
        verts, faces = bank.verts[label], bank.faces[label]
        fvalid = bank.face_valid[label]
        r = random_rotation(jax.random.PRNGKey(seed), ())
        t = jnp.asarray([0., 0., 600.])
        k = jnp.asarray([[300., 0., 64.], [0., 300., 64.], [0., 0., 1.]])
        xy, z = project_vertices(verts, r, t, k)
        return xy, z, faces, fvalid

    def test_matches_scan(self):
        from scflow_tpu.rendering.rasterizer import rasterize, rasterize_binned
        for seed in (0, 1):
            xy, z, faces, fvalid = self._scene(seed)
            ref = rasterize(xy, z, faces, fvalid, 128, 128)
            out = rasterize_binned(xy, z, faces, fvalid, 128, 128)
            m_ref = np.asarray(ref["face_id"]) >= 0
            m_out = np.asarray(out["face_id"]) >= 0
            assert (m_ref != m_out).mean() < 0.002
            both = m_ref & m_out
            dz = np.abs(np.asarray(ref["zbuf"]) - np.asarray(out["zbuf"]))[both]
            assert np.median(dz) < 0.1 and np.quantile(dz, 0.99) < 2.0

    def test_small_face_budget_still_covers(self):
        from scflow_tpu.rendering.rasterizer import rasterize_binned
        xy, z, faces, fvalid = self._scene()
        out = rasterize_binned(xy, z, faces, fvalid, 128, 128, k_faces=512)
        assert (np.asarray(out["face_id"]) >= 0).sum() > 500


class TestMeshIO:
    def test_ascii_ply_roundtrip(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.make_synthetic_bop import write_ply

        from scflow_tpu.rendering.meshio import load_ply

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                         np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]],
                          np.float32)
        p = str(tmp_path / "mesh.ply")
        write_ply(p, verts, faces, colors)
        m = load_ply(p)
        np.testing.assert_allclose(m["verts"], verts, atol=1e-4)
        np.testing.assert_array_equal(m["faces"], faces)
        np.testing.assert_allclose(m["vert_colors"], colors, atol=1 / 255.0)

    def test_binary_ply(self, tmp_path):
        from scflow_tpu.rendering.meshio import load_ply

        verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        p = str(tmp_path / "bin.ply")
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n"
                    b"element vertex 3\n"
                    b"property float x\nproperty float y\nproperty float z\n"
                    b"element face 1\n"
                    b"property list uchar int vertex_indices\nend_header\n")
            f.write(verts.astype("<f4").tobytes())
            f.write(np.uint8(3).tobytes() + faces.astype("<i4").tobytes())
        m = load_ply(p)
        np.testing.assert_allclose(m["verts"], verts)
        np.testing.assert_array_equal(m["faces"], faces)

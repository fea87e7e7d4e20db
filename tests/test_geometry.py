"""Unit tests for the geometry core against closed-form cases and scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from scflow_tpu.geometry import (
    add_error,
    adds_error,
    axis_angle_to_matrix,
    compose_delta_pose,
    depth_to_correspondences,
    filter_flow_by_mask,
    flow_from_pose_and_depth,
    flow_from_pose_and_points,
    matrix_to_axis_angle,
    matrix_to_ortho6d,
    matrix_to_quaternion,
    ortho6d_to_matrix,
    project_points,
    quaternion_to_matrix,
    random_rotation,
    rotation_angle_deg,
    transform_points,
    unproject_depth,
)


class TestRotations:
    def test_quaternion_matches_scipy(self, rng):
        q = rng.normal(size=(32, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        ours = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        theirs = R.from_quat(q).as_matrix()  # scipy is also xyzw
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_quaternion_roundtrip(self):
        key = jax.random.PRNGKey(1)
        m = random_rotation(key, (64,))
        q = matrix_to_quaternion(m)
        m2 = quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_quaternion_edge_cases(self):
        # 180-degree rotations around each axis hit the non-w pivots.
        for axis in np.eye(3):
            m = R.from_rotvec(np.pi * axis).as_matrix()[None]
            q = matrix_to_quaternion(jnp.asarray(m))
            m2 = quaternion_to_matrix(q)
            np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)

    def test_ortho6d_identity_bias(self):
        # The pose head's identity init [1,0,0,0,1,0] must map to eye(3)
        # (reference models/head/pose_head.py:96).
        m = ortho6d_to_matrix(jnp.asarray([[1., 0., 0., 0., 1., 0.]]))
        np.testing.assert_allclose(np.asarray(m[0]), np.eye(3), atol=1e-6)

    def test_ortho6d_roundtrip(self):
        m = random_rotation(jax.random.PRNGKey(2), (16,))
        six = matrix_to_ortho6d(m)
        m2 = ortho6d_to_matrix(six)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_ortho6d_is_rotation(self, rng):
        six = jnp.asarray(rng.normal(size=(32, 6)))
        m = np.asarray(ortho6d_to_matrix(six))
        np.testing.assert_allclose(m @ m.transpose(0, 2, 1),
                                   np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), np.ones(32), atol=1e-5)

    def test_axis_angle(self, rng):
        v = rng.normal(size=(16, 3))
        ours = np.asarray(axis_angle_to_matrix(jnp.asarray(v)))
        theirs = R.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)
        back = np.asarray(matrix_to_axis_angle(jnp.asarray(ours)))
        np.testing.assert_allclose(back, v, atol=1e-4)

    def test_rotation_angle(self):
        a = R.from_rotvec([0.3, 0, 0]).as_matrix()[None]
        b = R.from_rotvec([-0.2, 0, 0]).as_matrix()[None]
        ang = rotation_angle_deg(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(ang), [np.degrees(0.5)], atol=1e-4)


class TestComposeDeltaPose:
    def test_identity_delta_keeps_pose(self):
        key = jax.random.PRNGKey(3)
        r_src = random_rotation(key, (8,))
        t_src = jnp.asarray(np.random.default_rng(0).uniform(
            [-50, -50, 500], [50, 50, 1500], size=(8, 3)), jnp.float32)
        rot_delta = jnp.tile(jnp.asarray([1., 0., 0., 0., 1., 0.]), (8, 1))
        t_delta = jnp.zeros((8, 3))
        r_dst, t_dst = compose_delta_pose(rot_delta, t_delta, r_src, t_src)
        np.testing.assert_allclose(np.asarray(r_dst), np.asarray(r_src), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_dst), np.asarray(t_src), rtol=1e-5)

    def test_exp_depth_semantics(self):
        r_src = jnp.eye(3)[None]
        t_src = jnp.asarray([[10., 20., 1000.]])
        t_delta = jnp.asarray([[0.5, -0.5, np.log(2.0)]])
        rot_delta = jnp.asarray([[1., 0., 0., 0., 1., 0.]])
        _, t_dst = compose_delta_pose(rot_delta, t_delta, r_src, t_src,
                                      weight=10., depth_transform="exp")
        vz = 1000. / 2.0
        vx = vz * (0.5 / 10. + 10. / 1000.)
        vy = vz * (-0.5 / 10. + 20. / 1000.)
        np.testing.assert_allclose(np.asarray(t_dst[0]), [vx, vy, vz], rtol=1e-5)

    def test_quaternion_delta(self):
        r_src = random_rotation(jax.random.PRNGKey(4), (4,))
        q = jnp.tile(jnp.asarray([0., 0., 0., 1.]), (4, 1))  # identity xyzw
        r_dst, _ = compose_delta_pose(q, jnp.zeros((4, 3)), r_src,
                                      jnp.full((4, 3), 100.))
        np.testing.assert_allclose(np.asarray(r_dst), np.asarray(r_src), atol=1e-6)


class TestProjection:
    def _k(self):
        return jnp.asarray([[500., 0., 128.], [0., 500., 128.], [0., 0., 1.]])

    def test_project_center(self):
        k = self._k()
        pts = jnp.asarray([[0., 0., 0.]])
        xy, z = project_points(pts, k, jnp.eye(3), jnp.asarray([0., 0., 1000.]))
        np.testing.assert_allclose(np.asarray(xy[0]), [128., 128.], atol=1e-4)
        np.testing.assert_allclose(np.asarray(z[0]), 1000., rtol=1e-6)

    def test_unproject_roundtrip(self, rng):
        k = self._k()
        depth = jnp.asarray(rng.uniform(800, 1200, size=(16, 16)), jnp.float32)
        pts_cam = unproject_depth(depth, k)
        # re-project camera-frame points with identity pose
        xy, z = project_points(pts_cam.reshape(-1, 3), k, jnp.eye(3), jnp.zeros(3))
        gx, gy = np.meshgrid(np.arange(16), np.arange(16))
        expect = np.stack([gx, gy], -1).reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(xy), expect, atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), np.asarray(depth).ravel(), rtol=1e-5)

    def test_correspondences_roundtrip(self):
        # Points unprojected into the object frame must re-project to their pixel.
        k = self._k()
        r = random_rotation(jax.random.PRNGKey(5), ())
        t = jnp.asarray([5., -3., 900.])
        depth = jnp.zeros((16, 16)).at[4:12, 4:12].set(950.)
        p2d, p3d, valid = depth_to_correspondences(depth, k, r, t)
        xy, _ = project_points(p3d.reshape(-1, 3), k, r, t)
        xy = np.asarray(xy).reshape(16, 16, 2)
        v = np.asarray(valid)
        np.testing.assert_allclose(xy[v], np.asarray(p2d)[v], atol=1e-3)


class TestFlow:
    def _scene(self):
        k = jnp.asarray([[400., 0., 64.], [0., 400., 64.], [0., 0., 1.]])[None]
        depth = jnp.zeros((1, 32, 32)).at[:, 8:24, 8:24].set(1000.)
        r_src = jnp.eye(3)[None]
        t_src = jnp.asarray([[0., 0., 1000.]])
        return k, depth, r_src, t_src

    def test_identity_pose_zero_flow(self):
        k, depth, r, t = self._scene()
        flow = flow_from_pose_and_depth(r, t, r, t, depth, k)
        f = np.asarray(flow[0])
        v = np.asarray(depth[0]) > 0
        np.testing.assert_allclose(f[v], 0.0, atol=1e-3)
        assert np.all(f[~v] == 400.0)

    def test_pure_x_translation(self):
        k, depth, r, t = self._scene()
        # moving the object +25mm in x at depth 1000 with f=400 → +10px flow
        t_dst = jnp.asarray([[25., 0., 1000.]])
        flow = flow_from_pose_and_depth(r, t, r, t_dst, depth, k)
        f = np.asarray(flow[0])
        v = np.asarray(depth[0]) > 0
        np.testing.assert_allclose(f[v][:, 0], 10.0, atol=1e-3)
        np.testing.assert_allclose(f[v][:, 1], 0.0, atol=1e-3)

    def test_flow_from_points_matches_depth_variant(self):
        k, depth, r, t = self._scene()
        r_dst = random_rotation(jax.random.PRNGKey(6), (1,))
        t_dst = jnp.asarray([[10., -5., 1100.]])
        _, p3d, valid = depth_to_correspondences(depth, k, r, t)
        f1 = flow_from_pose_and_points(r_dst, t_dst, k, p3d, valid)
        f2 = flow_from_pose_and_depth(r, t, r_dst, t_dst, depth, k)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-3)

    def test_filter_by_mask(self):
        k, depth, r, t = self._scene()
        flow = flow_from_pose_and_depth(r, t, r, t, depth, k)
        mask = jnp.zeros((1, 32, 32))  # nothing lands anywhere valid
        filt = filter_flow_by_mask(flow, mask)
        assert np.all(np.asarray(filt) == 400.0)
        full = filter_flow_by_mask(flow, depth > 0)
        # bilinear sampling at the ≥0.9 threshold erodes the mask boundary
        # (reference grid_sample semantics): assert on interior pixels whose
        # whole 8-neighborhood is foreground
        v = np.asarray(depth[0]) > 0
        interior = v.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                interior &= np.roll(np.roll(v, dy, 0), dx, 1)
        interior[0, :] = interior[-1, :] = False
        interior[:, 0] = interior[:, -1] = False
        assert interior.sum() > 10
        np.testing.assert_allclose(np.asarray(full[0])[interior], 0.0,
                                   atol=1e-3)


class TestAddErrors:
    def test_add_zero_for_same_pose(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        r = random_rotation(jax.random.PRNGKey(7), (4,))
        t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        e = add_error(r, t, r, t, pts)
        np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-5)

    def test_add_translation_offset(self, rng):
        pts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        r = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        t2 = jnp.asarray([[3., 4., 0.]])
        e = add_error(r, t2, r, t, pts)
        np.testing.assert_allclose(np.asarray(e), 5.0, rtol=1e-5)

    def test_adds_symmetric_invariance(self):
        # ring of points symmetric under 90° z-rotation
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        pts = jnp.asarray(np.stack([np.cos(ang), np.sin(ang), 0 * ang], -1),
                          jnp.float32)
        rz = jnp.asarray(R.from_rotvec([0, 0, np.pi / 2]).as_matrix(),
                         jnp.float32)[None]
        r_id = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        e_add = add_error(rz, t, r_id, t, pts)
        e_adds = adds_error(rz, t, r_id, t, pts)
        assert float(e_add[0]) > 1.0
        np.testing.assert_allclose(np.asarray(e_adds), 0.0, atol=1e-5)

    def test_transform_points_batched(self, rng):
        pts = jnp.asarray(rng.normal(size=(2, 10, 3)), jnp.float32)
        r = random_rotation(jax.random.PRNGKey(8), (2,))
        t = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
        out = transform_points(r, t, pts)
        expect = np.einsum("bij,bnj->bni", np.asarray(r), np.asarray(pts)) \
            + np.asarray(t)[:, None]
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


class TestFlowFilters:
    def _flow_scene(self):
        import jax.numpy as jnp

        # source depth: flat plane at z=500 in a 16x16 window
        h = w = 32
        depth = jnp.zeros((1, h, w))
        depth = depth.at[:, 8:24, 8:24].set(500.0)
        k = jnp.array([[[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]]])
        eye = jnp.eye(3)[None]
        t = jnp.array([[0.0, 0.0, 500.0]])
        return depth, k, eye, t

    def test_filter_by_depth_identity(self):
        import jax.numpy as jnp

        from scflow_tpu.geometry import filter_flow_by_depth

        depth, k, r, t = self._flow_scene()
        flow = jnp.zeros((1, 32, 32, 2))
        out = filter_flow_by_depth(flow, depth, depth, k, r, t, r, t,
                                   invalid_num=400.0)
        # zero flow between identical renders is fully consistent on fg
        assert float(jnp.abs(out[0, 8:24, 8:24]).max()) == 0.0
        # background is invalidated
        assert float(out[0, 0, 0, 0]) == 400.0

    def test_filter_by_depth_occlusion(self):
        import jax.numpy as jnp

        from scflow_tpu.geometry import filter_flow_by_depth

        depth, k, r, t = self._flow_scene()
        # target depth much closer -> inconsistent -> filtered
        target_depth = jnp.where(depth > 0, 250.0, 0.0)
        flow = jnp.zeros((1, 32, 32, 2))
        out = filter_flow_by_depth(flow, depth, target_depth, k, r, t, r, t,
                                   invalid_num=400.0)
        assert float(out[0, 16, 16, 0]) == 400.0

    def test_filter_by_face_index(self):
        import jax.numpy as jnp

        from scflow_tpu.geometry import filter_flow_by_face_index

        fid = -jnp.ones((1, 32, 32), jnp.int32)
        fid = fid.at[:, 8:24, 8:24].set(7)
        flow = jnp.zeros((1, 32, 32, 2))
        out = filter_flow_by_face_index(flow, fid, fid, invalid_num=400.0)
        assert float(jnp.abs(out[0, 10, 10]).max()) == 0.0
        assert float(out[0, 0, 0, 0]) == 400.0
        # shifted flow landing on background -> filtered
        flow2 = jnp.full((1, 32, 32, 2), 20.0)
        out2 = filter_flow_by_face_index(flow2, fid, fid, invalid_num=400.0)
        assert float(out2[0, 10, 10, 0]) == 400.0


class TestMxuGridSample:
    def test_mxu_sampler_matches_gather_sampler(self):
        """The TPU-path separable tent-contraction sampler is bit-exact
        against the gather formulation (same 4-tap bilinear + zeros
        padding) — proven on-chip too; this pins the math on CPU."""
        from scflow_tpu.geometry.flow import (_grid_sample_zeros,
                                              _grid_sample_zeros_mxu)

        rng = np.random.default_rng(0)
        n, h, w = 3, 24, 40
        img = jnp.asarray(rng.random((n, h, w)), jnp.float32)
        # in-range, out-of-range, and exactly-on-border samples
        x = jnp.asarray(rng.uniform(-4, w + 4, (n, 10, 30)), jnp.float32)
        y = jnp.asarray(rng.uniform(-4, h + 4, (n, 10, 30)), jnp.float32)
        x = x.at[:, 0, :5].set(jnp.asarray([0.0, w - 1.0, -1.0, w + 0.0, 7.0]))
        y = y.at[:, 0, :5].set(jnp.asarray([0.0, h - 1.0, 3.0, -1.0, 7.0]))
        a = np.asarray(_grid_sample_zeros(img, x, y))
        b = np.asarray(_grid_sample_zeros_mxu(
            img, x.reshape(n, -1), y.reshape(n, -1),
            chunk=128).reshape(n, 10, 30))
        np.testing.assert_allclose(a, b, atol=1e-6)

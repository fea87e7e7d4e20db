"""Pose-graph refinement: joint camera + per-object pose recovery."""
import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.geometry import (axis_angle_to_matrix, project_points,
                                 random_rotation, rotation_angle_deg)
from scflow_tpu.parallel import make_mesh
from scflow_tpu.parallel.pose_graph import (solve_pose_graph,
                                            solve_pose_graph_sharded)

K = jnp.asarray([[500., 0., 320.], [0., 500., 240.], [0., 0., 1.]])


def make_scene(n_objects=4, n_points=80, cam_err=True, obj_err=True, seed=0):
    """GT poses perturbed by a SHARED camera error + small per-object noise;
    observations are GT projections."""
    rng = np.random.default_rng(seed)
    points = jnp.asarray(rng.uniform(-40, 40, (n_objects, n_points, 3)),
                         jnp.float32)
    gt_r = random_rotation(jax.random.PRNGKey(seed), (n_objects,))
    gt_t = jnp.asarray(
        np.stack([rng.uniform(-100, 100, n_objects),
                  rng.uniform(-100, 100, n_objects),
                  rng.uniform(700, 1100, n_objects)], -1), jnp.float32)

    target = jax.vmap(lambda p, r, t: project_points(p, K, r, t)[0])(
        points, gt_r, gt_t)

    init_r, init_t = gt_r, gt_t
    if cam_err:
        cam_dr = axis_angle_to_matrix(jnp.asarray([0.02, -0.015, 0.01]))
        cam_dt = jnp.asarray([8., -5., 15.])
        init_r = jnp.einsum("ij,njk->nik", cam_dr, init_r)
        init_t = jnp.einsum("ij,nj->ni", cam_dr, init_t) + cam_dt
    if obj_err:
        obj_dr = axis_angle_to_matrix(
            jnp.asarray(rng.normal(0, 0.01, (n_objects, 3)), jnp.float32))
        init_r = jnp.einsum("nij,njk->nik", obj_dr, init_r)
        init_t = init_t + jnp.asarray(rng.normal(0, 3, (n_objects, 3)),
                                      jnp.float32)
    weights = jnp.ones((n_objects, n_points))
    return points, target, gt_r, gt_t, init_r, init_t, weights


def pose_errors(r_est, t_est, gt_r, gt_t):
    ang = np.asarray(rotation_angle_deg(r_est, gt_r))
    dt = np.asarray(jnp.linalg.norm(t_est - gt_t, axis=-1))
    return ang.max(), dt.max()


class TestPoseGraph:
    def test_recovers_camera_and_object_errors(self):
        points, target, gt_r, gt_t, init_r, init_t, w = make_scene()
        ang0, dt0 = pose_errors(init_r, init_t, gt_r, gt_t)
        out = solve_pose_graph(points, target, init_r, init_t, K, w,
                               iterations=5)
        ang, dt = pose_errors(out["rotations"], out["translations"],
                              gt_r, gt_t)
        assert ang < 0.05 and dt < 0.5
        assert ang < ang0 / 10 and dt < dt0 / 10

    def test_object_valid_mask(self):
        points, target, gt_r, gt_t, init_r, init_t, w = make_scene()
        # corrupt the last object's observations entirely, mask it out
        target = target.at[-1].add(500.0)
        ov = jnp.asarray([1., 1., 1., 0.])
        out = solve_pose_graph(points, target, init_r, init_t, K, w,
                               object_valid=ov, iterations=5)
        ang, dt = pose_errors(out["rotations"][:3], out["translations"][:3],
                              gt_r[:3], gt_t[:3])
        assert ang < 0.1 and dt < 1.0

    def test_per_object_intrinsics(self):
        """Objects cropped independently carry distinct Ks (adapt_intrinsic
        folds each crop transform into its own K) — the solver must use the
        full (N, 3, 3) stack, not slot 0's K broadcast to everyone."""
        rng = np.random.default_rng(3)
        n_objects, n_points = 4, 80
        points = jnp.asarray(rng.uniform(-40, 40, (n_objects, n_points, 3)),
                             jnp.float32)
        gt_r = random_rotation(jax.random.PRNGKey(3), (n_objects,))
        gt_t = jnp.asarray(
            np.stack([rng.uniform(-60, 60, n_objects),
                      rng.uniform(-60, 60, n_objects),
                      rng.uniform(700, 1100, n_objects)], -1), jnp.float32)
        # distinct crop intrinsics: different focal scales + principal points
        ks = jnp.asarray(np.stack([
            [[500. * s, 0., cx], [0., 500. * s, cy], [0., 0., 1.]]
            for s, cx, cy in zip(rng.uniform(0.6, 1.8, n_objects),
                                 rng.uniform(80, 200, n_objects),
                                 rng.uniform(80, 200, n_objects))
        ]), jnp.float32)
        target = jax.vmap(lambda p, kk, r, t: project_points(p, kk, r, t)[0])(
            points, ks, gt_r, gt_t)
        cam_dr = axis_angle_to_matrix(jnp.asarray([0.02, -0.015, 0.01]))
        cam_dt = jnp.asarray([8., -5., 15.])
        init_r = jnp.einsum("ij,njk->nik", cam_dr, gt_r)
        init_t = jnp.einsum("ij,nj->ni", cam_dr, gt_t) + cam_dt
        w = jnp.ones((n_objects, n_points))

        out = solve_pose_graph(points, target, init_r, init_t, ks, w,
                               iterations=5)
        ang, dt = pose_errors(out["rotations"], out["translations"],
                              gt_r, gt_t)
        assert ang < 0.05 and dt < 0.5

        # broadcasting slot 0's K to all objects (the pre-fix behavior)
        # must be measurably worse — it corrupts every other object
        bad = solve_pose_graph(points, target, init_r, init_t, ks[0], w,
                               iterations=5)
        ang_bad, dt_bad = pose_errors(bad["rotations"], bad["translations"],
                                      gt_r, gt_t)
        assert ang_bad > 10 * max(ang, 1e-3) or dt_bad > 10 * max(dt, 1e-2)

    def test_sharded_matches_single_device(self):
        mesh = make_mesh()
        points, target, gt_r, gt_t, init_r, init_t, w = make_scene(
            n_objects=8)
        ref = solve_pose_graph(points, target, init_r, init_t, K, w,
                               iterations=3)
        out = solve_pose_graph_sharded(points, target, init_r, init_t, K, w,
                                       mesh, iterations=3)
        np.testing.assert_allclose(np.asarray(out["rotations"]),
                                   np.asarray(ref["rotations"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out["translations"]),
                                   np.asarray(ref["translations"]), atol=0.3)

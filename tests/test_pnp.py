"""PnP solver tests: recover known poses from synthetic projections."""
import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.geometry import project_points, random_rotation, rotation_angle_deg
from scflow_tpu.geometry.pnp import epnp, ransac_pnp, refine_pose_gn, solve_pnp

K = jnp.asarray([[572.4, 0., 325.3], [0., 573.6, 242.0], [0., 0., 1.]])


def make_scene(seed, n=50, noise=0.0, spread=100.0):
    rng = np.random.default_rng(seed)
    pts3d = jnp.asarray(rng.uniform(-spread, spread, size=(n, 3)), jnp.float32)
    r = random_rotation(jax.random.PRNGKey(seed), ())
    t = jnp.asarray([rng.uniform(-50, 50), rng.uniform(-50, 50),
                     rng.uniform(700, 1300)], jnp.float32)
    xy, _ = project_points(pts3d, K, r, t)
    if noise > 0:
        xy = xy + jnp.asarray(rng.normal(0, noise, size=xy.shape), jnp.float32)
    return pts3d, xy, r, t


def assert_pose_close(r_est, t_est, r_gt, t_gt, deg=0.2, mm=2.0):
    ang = float(rotation_angle_deg(r_est[None], r_gt[None])[0])
    dt = float(jnp.linalg.norm(t_est - t_gt))
    assert ang < deg, f"rotation error {ang} deg"
    assert dt < mm, f"translation error {dt} mm"


class TestEPnP:
    def test_exact_correspondences(self):
        for seed in range(3):
            pts3d, xy, r, t = make_scene(seed)
            r_est, t_est = epnp(pts3d, xy, K)
            assert_pose_close(r_est, t_est, r, t, deg=0.5, mm=5.0)

    def test_with_refinement(self):
        pts3d, xy, r, t = make_scene(7)
        r_est, t_est = solve_pnp(pts3d, xy, K)
        assert_pose_close(r_est, t_est, r, t, deg=0.02, mm=0.2)

    def test_noisy(self):
        pts3d, xy, r, t = make_scene(11, n=200, noise=0.5)
        r_est, t_est = solve_pnp(pts3d, xy, K)
        assert_pose_close(r_est, t_est, r, t, deg=0.5, mm=5.0)

    def test_weights_ignore_points(self):
        pts3d, xy, r, t = make_scene(3, n=60)
        # corrupt last 10 points entirely, mask them out
        xy_bad = xy.at[-10:].add(300.0)
        w = jnp.concatenate([jnp.ones(50), jnp.zeros(10)])
        r_est, t_est = solve_pnp(pts3d, xy_bad, K, weights=w)
        assert_pose_close(r_est, t_est, r, t, deg=0.1, mm=1.0)

    def test_vmap_batched(self):
        scenes = [make_scene(s) for s in range(4)]
        pts = jnp.stack([s[0] for s in scenes])
        xy = jnp.stack([s[1] for s in scenes])
        r_est, t_est = jax.vmap(lambda a, b: solve_pnp(a, b, K))(pts, xy)
        for i, (_, _, r, t) in enumerate(scenes):
            assert_pose_close(r_est[i], t_est[i], r, t, deg=0.1, mm=1.0)

    def test_planar_points(self):
        # keypoint-style: 8 coplanar-ish bbox corners with z jitter ~ 0
        rng = np.random.default_rng(5)
        pts3d = jnp.asarray(
            np.stack(np.meshgrid([-50, 50], [-40, 40], [0., 1.]), -1).reshape(-1, 3),
            jnp.float32)
        r = random_rotation(jax.random.PRNGKey(21), ())
        t = jnp.asarray([10., -20., 900.], jnp.float32)
        xy, _ = project_points(pts3d, K, r, t)
        r_est, t_est = solve_pnp(pts3d, xy, K, refine_iters=10)
        assert_pose_close(r_est, t_est, r, t, deg=0.5, mm=5.0)


class TestGaussNewton:
    def test_refines_perturbed_pose(self):
        pts3d, xy, r, t = make_scene(13)
        r0 = random_rotation(jax.random.PRNGKey(99), ()) @ r  # big perturbation? no - use small
        from scflow_tpu.geometry import axis_angle_to_matrix
        r0 = axis_angle_to_matrix(jnp.asarray([0.05, -0.03, 0.02])) @ r
        t0 = t + jnp.asarray([5., -8., 30.])
        r_ref, t_ref = refine_pose_gn(r0, t0, pts3d, xy, K, iters=10)
        assert_pose_close(r_ref, t_ref, r, t, deg=0.02, mm=0.2)


class TestRansac:
    def test_outlier_rejection(self):
        pts3d, xy, r, t = make_scene(17, n=200)
        rng = np.random.default_rng(17)
        # 30% gross outliers
        n_out = 60
        idx = rng.choice(200, n_out, replace=False)
        xy_np = np.asarray(xy).copy()
        xy_np[idx] += rng.uniform(50, 200, size=(n_out, 2))
        out = ransac_pnp(jax.random.PRNGKey(0), pts3d, jnp.asarray(xy_np), K,
                         num_hypotheses=64, inlier_threshold=3.0)
        assert int(out["num_inliers"]) >= 130
        assert_pose_close(out["rotation"], out["translation"], r, t,
                          deg=0.2, mm=2.0)

    def test_all_inliers(self):
        pts3d, xy, r, t = make_scene(23, n=100)
        out = ransac_pnp(jax.random.PRNGKey(1), pts3d, xy, K)
        assert int(out["num_inliers"]) == 100
        assert_pose_close(out["rotation"], out["translation"], r, t,
                          deg=0.05, mm=0.5)

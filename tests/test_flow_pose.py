"""Flow→PnP path: perfect synthetic flow must recover the GT pose."""
import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.geometry import (flow_from_pose_and_depth, random_rotation,
                                 rotation_angle_deg)
from scflow_tpu.models.flow_pose import solve_pose_from_flow

K = jnp.asarray([[400., 0., 64.], [0., 400., 64.], [0., 0., 1.]])


def scene(n=2):
    k = jnp.tile(K, (n, 1, 1))
    # curved (paraboloid) depth: coplanar points would be EPnP-degenerate
    yy, xx = jnp.meshgrid(jnp.arange(128.), jnp.arange(128.), indexing="ij")
    bump = 800.0 + 0.02 * ((xx - 64) ** 2 + (yy - 64) ** 2)
    depth = jnp.zeros((n, 128, 128)).at[:, 32:96, 32:96].set(
        bump[32:96, 32:96])
    ref_r = random_rotation(jax.random.PRNGKey(0), (n,))
    ref_t = jnp.tile(jnp.asarray([0., 0., 800.]), (n, 1))
    gt_r = random_rotation(jax.random.PRNGKey(1), (n,))
    gt_t = ref_t + jnp.asarray([[20., -10., 50.], [-15., 5., -40.]][:n])
    return k, depth, ref_r, ref_t, gt_r, gt_t


def test_perfect_flow_recovers_pose():
    k, depth, ref_r, ref_t, gt_r, gt_t = scene()
    flow = flow_from_pose_and_depth(ref_r, ref_t, gt_r, gt_t, depth, k,
                                    invalid_num=400.0)
    out = solve_pose_from_flow(jax.random.PRNGKey(2), flow, None, depth,
                               ref_r, ref_t, k)
    assert bool(out["valid"].all())
    ang = np.asarray(rotation_angle_deg(out["rotations"], gt_r))
    dt = np.asarray(jnp.linalg.norm(out["translations"] - gt_t, axis=-1))
    assert ang.max() < 0.5
    assert dt.max() < 5.0


def test_occlusion_filter_excludes_bad_region():
    k, depth, ref_r, ref_t, gt_r, gt_t = scene(n=1)
    flow = flow_from_pose_and_depth(ref_r, ref_t, gt_r, gt_t, depth, k)
    # corrupt flow in a region, mark it occluded
    flow = flow.at[:, 32:64, 32:96].add(35.0)
    occ = jnp.ones((1, 128, 128)).at[:, 32:64, 32:96].set(0.0)
    out = solve_pose_from_flow(jax.random.PRNGKey(3), flow, occ, depth,
                               ref_r, ref_t, k)
    ang = float(rotation_angle_deg(out["rotations"], gt_r)[0])
    dt = float(jnp.linalg.norm(out["translations"][0] - gt_t[0]))
    assert ang < 0.5 and dt < 5.0


def test_fallback_when_no_points():
    k, depth, ref_r, ref_t, gt_r, gt_t = scene(n=1)
    empty_depth = jnp.zeros_like(depth)
    flow = jnp.zeros((1, 128, 128, 2))
    out = solve_pose_from_flow(jax.random.PRNGKey(4), flow, None, empty_depth,
                               ref_r, ref_t, k)
    assert not bool(out["valid"][0])
    np.testing.assert_allclose(np.asarray(out["rotations"]),
                               np.asarray(ref_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["translations"]),
                               np.asarray(ref_t), atol=1e-6)

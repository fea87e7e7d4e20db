"""Flow→pose-graph eval bridge: scene refinement from refiner outputs.

Covers the BASELINE §2.10 extension's eval wiring
(``pose_graph_from_flow`` + ``evaluate._pose_graph_refine`` /
``test.py --pose-graph``): flow-derived 2D targets built from the
rendered depth at the reference pose must let the joint solver recover a
shared camera error that independent per-object refinement cannot see.
No reference counterpart — the reference refines objects independently.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from scflow_tpu.geometry import axis_angle_to_matrix, project_points
from scflow_tpu.geometry.rotation import rotation_angle_deg
from scflow_tpu.parallel.pose_graph import pose_graph_from_flow

H = W = 64
K = jnp.asarray([[120.0, 0.0, 32.0], [0.0, 120.0, 32.0], [0.0, 0.0, 1.0]])


def make_flow_scene(n=4, cam_aa=(0.02, -0.015, 0.01), cam_t=(5.0, -3.0, 8.0),
                    obj_noise=0.003, seed=0):
    """Curved-patch scenes: each object is a patch with a depth gradient +
    curvature (a fronto-parallel CONSTANT-depth plane leaves the classic
    rotation/translation ambiguity — ωx↔ty/z, ωy↔tx/z — unresolvable by
    ANY solver; real renders always carry depth variation);
    GT = shared camera error ∘ (ref ∘ noise)."""
    rng = np.random.default_rng(seed)
    depth = np.zeros((n, H, W), np.float32)
    yy, xx = np.mgrid[16:48, 16:48].astype(np.float32)
    for i in range(n):
        base = 600.0 + 40.0 * i
        depth[i, 16:48, 16:48] = (base + 2.0 * (xx - 32) + 1.5 * (yy - 32)
                                  + 0.08 * ((xx - 32) ** 2 + (yy - 32) ** 2))
    depth = jnp.asarray(depth)
    ref_r = jnp.tile(jnp.eye(3), (n, 1, 1))
    ref_t = jnp.zeros((n, 3))

    cam_r = axis_angle_to_matrix(jnp.asarray(cam_aa))
    cam_t = jnp.asarray(cam_t)
    gt_r, gt_t = [], []
    for i in range(n):
        noise_r = axis_angle_to_matrix(
            jnp.asarray(rng.normal(0, obj_noise, 3), jnp.float32))
        gt_r.append(cam_r @ noise_r @ ref_r[i])
        gt_t.append(cam_r @ (noise_r @ ref_t[i]
                             + jnp.asarray(rng.normal(0, 1.0, 3),
                                           jnp.float32)) + cam_t)
    gt_r, gt_t = jnp.stack(gt_r), jnp.stack(gt_t)

    # object-frame points seen by each pixel (ref pose is identity, so
    # object frame == camera frame of the reference render)
    from scflow_tpu.geometry.projection import depth_to_correspondences

    grid, p_obj, fg = depth_to_correspondences(
        depth, jnp.tile(K, (n, 1, 1)), ref_r, ref_t)
    proj = jnp.stack([
        project_points(p_obj[i].reshape(-1, 3), K, gt_r[i], gt_t[i])[0]
        for i in range(n)]).reshape(n, H, W, 2)
    flow = jnp.where(fg[..., None], proj - grid, 0.0)
    occ = fg.astype(jnp.float32)
    return dict(depth=depth, flow=flow, occ=occ, ref_r=ref_r, ref_t=ref_t,
                gt_r=gt_r, gt_t=gt_t)


def pose_errors(r, t, gt_r, gt_t):
    rot = np.asarray(rotation_angle_deg(r, gt_r))
    trans = np.asarray(jnp.linalg.norm(t - gt_t, axis=-1))
    return rot, trans


class TestPoseGraphFromFlow:
    def test_recovers_shared_camera_error(self):
        """Full-graph recovery. NB: all objects here share one K (one
        viewing direction) — a 64² narrow-FoV scene leaves the shared
        camera block's ωx↔ty/ωy↔tx directions weakly observable (verified
        in f64: the exact GN optimum mixes them), so camera-only cannot
        split the correction; the full graph recovers via the per-object
        solves. Real eval crops carry per-object Ks spanning the image
        FoV, where the camera block is well observable
        (test_pose_graph.py::test_per_object_intrinsics)."""
        s = make_flow_scene()
        n = s["depth"].shape[0]
        out = pose_graph_from_flow(
            s["flow"], s["occ"], s["depth"], s["ref_r"], s["ref_t"],
            s["ref_r"], s["ref_t"], K, jnp.ones((n,)), iterations=5,
            camera_only=False)
        rot0, tr0 = pose_errors(s["ref_r"], s["ref_t"], s["gt_r"], s["gt_t"])
        rot1, tr1 = pose_errors(out["rotations"], out["translations"],
                                s["gt_r"], s["gt_t"])
        # the shared camera error (≈1.7° / ~10 units) must be mostly gone
        assert rot1.mean() < 0.3 * rot0.mean()
        assert tr1.mean() < 0.3 * tr0.mean()
        # and the recovered camera correction is a real rotation
        cr = np.asarray(out["camera_rotation"])
        np.testing.assert_allclose(cr @ cr.T, np.eye(3), atol=1e-4)

    def test_padded_slots_pass_through_and_do_not_leak(self):
        s = make_flow_scene(n=4)
        valid = jnp.asarray([1.0, 1.0, 1.0, 0.0])

        def run(pad_source):
            z = {k: np.asarray(v).copy() for k, v in s.items()
                 if k in ("flow", "occ", "depth")}
            for k in z:  # overwrite the padded slot with arbitrary content
                z[k][3] = z[k][pad_source]
            return pose_graph_from_flow(
                jnp.asarray(z["flow"]), jnp.asarray(z["occ"]),
                jnp.asarray(z["depth"]), s["ref_r"], s["ref_t"],
                s["ref_r"], s["ref_t"], K, valid)

        a, b = run(0), run(1)
        # padded slot keeps its input pose exactly
        np.testing.assert_array_equal(np.asarray(a["rotations"][3]),
                                      np.asarray(s["ref_r"][3]))
        # valid slots are unaffected by padding content
        np.testing.assert_allclose(np.asarray(a["rotations"][:3]),
                                   np.asarray(b["rotations"][:3]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a["translations"][:3]),
                                   np.asarray(b["translations"][:3]),
                                   atol=1e-5)

    def test_starved_object_freezes(self):
        """An object with no valid pixels keeps its input pose."""
        s = make_flow_scene(n=3)
        occ = np.asarray(s["occ"]).copy()
        occ[2] = 0.0
        out = pose_graph_from_flow(
            s["flow"], jnp.asarray(occ), s["depth"], s["ref_r"], s["ref_t"],
            s["ref_r"], s["ref_t"], K, jnp.ones((3,)), camera_only=False)
        np.testing.assert_array_equal(np.asarray(out["rotations"][2]),
                                      np.asarray(s["ref_r"][2]))
        rot, _ = pose_errors(out["rotations"][:2], out["translations"][:2],
                             s["gt_r"][:2], s["gt_t"][:2])
        rot0, _ = pose_errors(s["ref_r"][:2], s["ref_t"][:2],
                              s["gt_r"][:2], s["gt_t"][:2])
        assert rot.mean() < rot0.mean()


class TestEvalWiring:
    def test_pose_graph_refine_group_slicing(self):
        """_pose_graph_refine slices one image's slots out of a packed
        batch, pads to the budget, and returns only the image's poses."""
        from scflow_tpu.training.evaluate import _pose_graph_refine

        s = make_flow_scene(n=4)
        budget = 8
        # packed batch: slots 0-1 = another image, slots 2-5 = ours
        idx = np.asarray([0, 0, 0, 1, 2, 3, 0, 0])
        out = {
            "flow": np.asarray(s["flow"])[idx],
            "masks": np.asarray(s["occ"])[idx][..., None],
            "depth": np.asarray(s["depth"])[idx],
            "ref_rotations": np.asarray(s["ref_r"])[idx],
            "ref_translations": np.asarray(s["ref_t"])[idx],
            "rotations": np.asarray(s["ref_r"])[idx],
            "translations": np.asarray(s["ref_t"])[idx],
        }
        batch = {"k": np.tile(np.asarray(K), (budget, 1, 1))}
        pg = _pose_graph_refine(out, batch, start=2, n=4, budget=budget)
        assert pg["rotations"].shape == (4, 3, 3)
        rot0, _ = pose_errors(s["ref_r"], s["ref_t"], s["gt_r"], s["gt_t"])
        rot1, _ = pose_errors(jnp.asarray(pg["rotations"]),
                              jnp.asarray(pg["translations"]),
                              s["gt_r"], s["gt_t"])
        assert rot1.mean() < rot0.mean()

    def test_single_object_image_passthrough(self):
        from scflow_tpu.training.evaluate import _pose_graph_refine

        assert _pose_graph_refine({}, {}, start=0, n=1, budget=8) == {}

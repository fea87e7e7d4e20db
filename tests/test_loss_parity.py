"""Training-semantics parity vs the torch reference (VERDICT round-2 #4).

Round 2 proved *network* parity; these tests prove the supervision pipeline:
GT-flow mask filtering, the three sequence losses, and the flow→PnP test
path, each against the actual reference source loaded by torch_ref
(models/utils/flow.py, models/loss/sequence_loss.py,
models/loss/point_matching_loss.py:107-218, models/utils/pose.py:203-249).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_ref import load_reference


def _nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def scene(rng_module=None):
    """Shared synthetic supervision scene: depth + poses + gt mask."""
    rng = np.random.default_rng(0)
    n, h, w = 3, 32, 32
    yy, xx = np.mgrid[:h, :w]
    depth = np.zeros((n, h, w), np.float32)
    gt_masks = np.zeros((n, h, w), np.float32)
    for i in range(n):
        cy, cx = rng.uniform(12, 20, 2)
        r_fg = rng.uniform(8, 12)
        fg = (yy - cy) ** 2 + (xx - cx) ** 2 < r_fg ** 2
        depth[i][fg] = 600.0 + 20.0 * rng.standard_normal(fg.sum())
        # target mask: the fg disk shifted a little (occlusion analogue)
        fg2 = (yy - cy - 2) ** 2 + (xx - cx + 1) ** 2 < (r_fg - 1) ** 2
        gt_masks[i][fg2] = 1.0

    k = np.tile(np.asarray([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]],
                           np.float32), (n, 1, 1))
    ref_r = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    ref_t = np.tile(np.asarray([0, 0, 600], np.float32), (n, 1))

    from scipy.spatial.transform import Rotation

    gt_r = np.stack([
        (Rotation.from_euler("zyx", rng.uniform(-10, 10, 3), degrees=True)
         .as_matrix() @ ref_r[i]).astype(np.float32) for i in range(n)])
    gt_t = (ref_t + rng.uniform(-15, 15, (n, 3))).astype(np.float32)
    return dict(depth=depth, gt_masks=gt_masks, k=k, ref_r=ref_r,
                ref_t=ref_t, gt_r=gt_r, gt_t=gt_t, n=n, h=h, w=w, rng=rng)


class TestFlowFilterParity:
    def test_filter_flow_by_mask_matches_reference(self, ref, scene):
        """Bilinear mask warp + 0.9 threshold + zeros padding, including
        the align_corners=False half-pixel quirk
        (reference models/utils/flow.py:6-26)."""
        from scflow_tpu.geometry.flow import filter_flow_by_mask

        rng = scene["rng"]
        n, h, w = scene["n"], scene["h"], scene["w"]
        flow = rng.uniform(-6, 6, (n, h, w, 2)).astype(np.float32)
        # sprinkle pre-invalidated pixels (both channels at the sentinel)
        inv = rng.uniform(size=(n, h, w)) < 0.1
        flow[inv] = 400.0

        theirs = ref.flow.filter_flow_by_mask(
            _nchw(flow).clone(), torch.from_numpy(scene["gt_masks"]),
            invalid_num=400)
        theirs = np.moveaxis(theirs.numpy(), 1, -1)
        ours = np.asarray(filter_flow_by_mask(
            jnp.asarray(flow), jnp.asarray(scene["gt_masks"]),
            invalid_num=400.0))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


class TestSequenceLossParity:
    def _gt_flow(self, ref, scene):
        """Reference GT flow incl. mask filter (scflow_refiner.py:201-208)."""
        gt_flow = ref.pose.get_flow_from_delta_pose_and_depth(
            torch.from_numpy(scene["ref_r"]), torch.from_numpy(scene["ref_t"]),
            torch.from_numpy(scene["gt_r"]), torch.from_numpy(scene["gt_t"]),
            torch.from_numpy(scene["depth"]), torch.from_numpy(scene["k"]),
            invalid_num=400)
        return ref.flow.filter_flow_by_mask(
            gt_flow, torch.from_numpy(scene["gt_masks"]), invalid_num=400)

    def test_gt_flow_pipeline_matches(self, ref, scene):
        from scflow_tpu.geometry.flow import (filter_flow_by_mask,
                                              flow_from_pose_and_depth)

        theirs = np.moveaxis(self._gt_flow(ref, scene).numpy(), 1, -1)
        ours = flow_from_pose_and_depth(
            jnp.asarray(scene["ref_r"]), jnp.asarray(scene["ref_t"]),
            jnp.asarray(scene["gt_r"]), jnp.asarray(scene["gt_t"]),
            jnp.asarray(scene["depth"]), jnp.asarray(scene["k"]),
            invalid_num=400.0)
        ours = np.asarray(filter_flow_by_mask(
            ours, jnp.asarray(scene["gt_masks"]), invalid_num=400.0))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-3)

    def test_flow_and_mask_losses_match(self, ref, scene):
        """SequenceLoss(RAFTLoss w=0.1) and SequenceLoss(L1 w=10) per-iter
        values and totals (reference scflow_refiner.py:220-231)."""
        from scflow_tpu.losses import sequence_flow_loss, sequence_mask_loss

        rng = scene["rng"]
        t_iters, n, h, w = 3, scene["n"], scene["h"], scene["w"]
        gt_flow_t = self._gt_flow(ref, scene)
        gt_flow_j = jnp.asarray(np.moveaxis(gt_flow_t.numpy(), 1, -1))
        rendered_masks = (scene["depth"] > 0).astype(np.float32)

        seq_flow = rng.uniform(-8, 8, (t_iters, n, h, w, 2)).astype(np.float32)
        seq_mask = rng.uniform(0, 1, (t_iters, n, h, w)).astype(np.float32)

        flow_loss = ref.sequence_loss.SequenceLoss(
            loss_func_cfg=dict(type=ref.sequence_loss.RAFTLoss,
                               loss_weight=0.1, max_flow=400.0), gamma=0.8)
        theirs_flow, theirs_seq = flow_loss(
            [_nchw(f) for f in seq_flow], gt_flow=gt_flow_t,
            valid=torch.from_numpy(rendered_masks))

        ours_flow, ours_seq = sequence_flow_loss(
            jnp.asarray(seq_flow), gt_flow_j, jnp.asarray(rendered_masks),
            gamma=0.8, loss_weight=0.1, max_flow=400.0)
        np.testing.assert_allclose(float(ours_flow), float(theirs_flow),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ours_seq), [float(x) for x in theirs_seq], rtol=1e-5)

        # occlusion target + L1 mask loss (scflow_refiner.py:228-231)
        gt_occ_t = (gt_flow_t.sum(dim=1) < 400.0).to(torch.float32)
        mask_loss = ref.sequence_loss.SequenceLoss(
            loss_func_cfg=dict(type=ref.sequence_loss.L1Loss,
                               loss_weight=10.0), gamma=0.8)
        theirs_mask, theirs_mseq = mask_loss(
            [torch.from_numpy(m) for m in seq_mask], gt_mask=gt_occ_t,
            valid=torch.from_numpy(rendered_masks))

        gt_occ_j = (jnp.sum(gt_flow_j, axis=-1) < 400.0).astype(jnp.float32)
        ours_mask, ours_mseq = sequence_mask_loss(
            jnp.asarray(seq_mask), gt_occ_j, gamma=0.8, loss_weight=10.0)
        np.testing.assert_allclose(float(ours_mask), float(theirs_mask),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ours_mseq), [float(x) for x in theirs_mseq], rtol=1e-5)

    def test_disentangled_pose_loss_matches(self, ref, scene):
        """SequenceLoss(DisentanglePointMatchingLoss l1, disentangle_z,
        w=10) incl. symmetric-class knn matching
        (reference point_matching_loss.py:107-218; shipped config
        configs/refine_models/scflow_ycbv_pbr.py:237-249)."""
        from scflow_tpu.losses import sequence_pose_loss

        rng = scene["rng"]
        t_iters, n = 3, scene["n"]
        num_class = 3
        p = 64
        points = rng.uniform(-40, 40, (num_class, p, 3)).astype(np.float32)
        diameters = np.asarray([150.0, 180.0, 120.0], np.float32)
        labels = np.asarray([0, 1, 2])
        symmetric = np.asarray([False, True, False])

        from scipy.spatial.transform import Rotation

        seq_r = np.stack([np.stack([
            (Rotation.from_euler("zyx", rng.uniform(-20, 20, 3), degrees=True)
             .as_matrix().astype(np.float32) @ scene["gt_r"][i])
            for i in range(n)]) for _ in range(t_iters)])
        seq_t = (scene["gt_t"][None] + rng.uniform(
            -25, 25, (t_iters, n, 3))).astype(np.float32)

        loss_ref = ref.sequence_loss.SequenceLoss(
            loss_func_cfg=dict(
                type=ref.point_matching_loss.DisentanglePointMatchingLoss,
                symmetry_types=["cls_2"],        # label 1 is symmetric
                mesh_diameter=diameters.tolist(),
                use_perspective_shape=True,      # points via points_list
                loss_type="l1", disentangle_z=True, loss_weight=10.0),
            gamma=0.8)
        points_list = [torch.from_numpy(points[lb]) for lb in labels]
        theirs, theirs_seq = loss_ref(
            [torch.from_numpy(r) for r in seq_r],
            [torch.from_numpy(t) for t in seq_t],
            gt_r=torch.from_numpy(scene["gt_r"]),
            gt_t=torch.from_numpy(scene["gt_t"]),
            labels=torch.from_numpy(labels), points_list=points_list)

        pts_batch = jnp.asarray(points[labels])
        ours, ours_seq = sequence_pose_loss(
            jnp.asarray(seq_r), jnp.asarray(seq_t),
            jnp.asarray(scene["gt_r"]), jnp.asarray(scene["gt_t"]),
            pts_batch, jnp.ones((n, p), bool), jnp.asarray(symmetric),
            jnp.asarray(diameters[labels]), gamma=0.8, loss_weight=10.0,
            loss_type="l1", disentangled=True, disentangle_z=True)
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ours_seq), [float(x) for x in theirs_seq], rtol=1e-5)

    def test_plain_point_matching_matches(self, ref, scene):
        """Non-disentangled PointMatchingLoss (l2) parity incl. symmetry."""
        from scflow_tpu.losses import point_matching_loss

        rng = scene["rng"]
        n = scene["n"]
        p = 48
        points = rng.uniform(-30, 30, (n, p, 3)).astype(np.float32)
        diameters = np.asarray([140.0, 160.0, 110.0], np.float32)
        labels = np.asarray([0, 1, 2])
        pred_r = scene["gt_r"][::-1].copy()
        pred_t = (scene["gt_t"] + rng.uniform(-20, 20, (n, 3))).astype(
            np.float32)

        loss_ref = ref.point_matching_loss.PointMatchingLoss(
            symmetry_types=["cls_3"],            # label 2 symmetric
            mesh_diameter=diameters.tolist(), use_perspective_shape=True,
            loss_type="l2", loss_weight=1.0, reduction="mean")
        theirs = loss_ref(
            torch.from_numpy(pred_r), torch.from_numpy(pred_t),
            gt_r=torch.from_numpy(scene["gt_r"]),
            gt_t=torch.from_numpy(scene["gt_t"]),
            labels=torch.from_numpy(labels),
            points_list=[torch.from_numpy(pt) for pt in points])

        ours = point_matching_loss(
            jnp.asarray(pred_r), jnp.asarray(pred_t),
            jnp.asarray(scene["gt_r"]), jnp.asarray(scene["gt_t"]),
            jnp.asarray(points), jnp.ones((n, p), bool),
            jnp.asarray([False, False, True]),
            jnp.asarray(diameters[labels]), loss_type="l2")
        np.testing.assert_allclose(float(jnp.mean(ours)), float(theirs),
                                   rtol=1e-5)


class TestPnPvsCv2:
    def _setup(self):
        rng = np.random.default_rng(3)
        h, w = 48, 48
        yy, xx = np.mgrid[:h, :w]
        fg = (yy - 24) ** 2 + (xx - 24) ** 2 < 18 ** 2
        depth = np.where(fg, 650.0 + 0.4 * (xx - 24) + 0.2 * (yy - 24),
                         0.0).astype(np.float32)[None]
        k = np.asarray([[120.0, 0, w / 2], [0, 115.0, h / 2 - 2], [0, 0, 1]],
                       np.float32)[None]
        ref_r = np.eye(3, dtype=np.float32)[None]
        ref_t = np.asarray([[0, 0, 650]], np.float32)

        from scipy.spatial.transform import Rotation

        gt_r = Rotation.from_euler("zyx", [8, -5, 4], degrees=True) \
            .as_matrix().astype(np.float32)[None]
        gt_t = np.asarray([[12, -8, 680]], np.float32)
        return rng, depth, k, ref_r, ref_t, gt_r, gt_t, fg

    def test_solve_pose_from_flow_matches_cv2_ransac(self):
        """Our fixed-shape RANSAC-EPnP vs cv2.solvePnPRansac on identical
        flow-derived correspondences with 10% outliers (reference
        models/utils/pose.py:203-249 + base_flow_refiner.py:99-155)."""
        cv2 = pytest.importorskip("cv2")
        from scflow_tpu.geometry.flow import flow_from_pose_and_depth
        from scflow_tpu.geometry.projection import (depth_to_correspondences,
                                                    pixel_grid)
        from scflow_tpu.geometry.se3 import rotation_angle_deg
        from scflow_tpu.models.flow_pose import solve_pose_from_flow

        rng, depth, k, ref_r, ref_t, gt_r, gt_t, fg = self._setup()
        flow = np.array(flow_from_pose_and_depth(
            jnp.asarray(ref_r), jnp.asarray(ref_t), jnp.asarray(gt_r),
            jnp.asarray(gt_t), jnp.asarray(depth), jnp.asarray(k),
            invalid_num=400.0))
        # corrupt 10% of foreground flow with large outliers
        out_mask = fg & (rng.uniform(size=fg.shape) < 0.10)
        flow[0][out_mask] += rng.uniform(8, 25, (out_mask.sum(), 2)) \
            * rng.choice([-1, 1], (out_mask.sum(), 2))

        ours = solve_pose_from_flow(
            jax.random.PRNGKey(0), jnp.asarray(flow), None,
            jnp.asarray(depth), jnp.asarray(ref_r), jnp.asarray(ref_t),
            jnp.asarray(k), max_points=1024, num_hypotheses=64,
            inlier_threshold=3.0)
        assert bool(ours["valid"][0])

        # reference path: integer-pixel correspondences + cv2 RANSAC-EPnP
        _, p3d, valid = depth_to_correspondences(
            jnp.asarray(depth), jnp.asarray(k), jnp.asarray(ref_r),
            jnp.asarray(ref_t))
        grid = np.asarray(pixel_grid(48, 48, jnp.float32))
        v = np.asarray(valid[0])
        pts3 = np.asarray(p3d[0])[v]
        pts2 = (grid + flow[0])[v]
        _, rvec, tvec, inliers = cv2.solvePnPRansac(
            pts3.astype(np.float64), pts2.astype(np.float64),
            k[0].astype(np.float64), None, flags=cv2.SOLVEPNP_EPNP,
            reprojectionError=3.0, iterationsCount=100)
        r_cv = cv2.Rodrigues(rvec)[0]
        t_cv = tvec.ravel()

        # both must recover the true pose within RANSAC noise bounds
        for name, (r, t) in {
                "ours": (np.asarray(ours["rotations"][0]),
                         np.asarray(ours["translations"][0])),
                "cv2": (r_cv, t_cv)}.items():
            ang = float(rotation_angle_deg(jnp.asarray(r, jnp.float32),
                                           jnp.asarray(gt_r[0])))
            terr = float(np.linalg.norm(t - gt_t[0]))
            assert ang < 1.0, f"{name}: rotation error {ang} deg"
            assert terr < 8.0, f"{name}: translation error {terr} mm"
        # and agree with each other
        ang = float(rotation_angle_deg(
            jnp.asarray(ours["rotations"][0]),
            jnp.asarray(r_cv, jnp.float32)))
        terr = float(np.linalg.norm(
            np.asarray(ours["translations"][0]) - t_cv))
        assert ang < 1.0 and terr < 8.0

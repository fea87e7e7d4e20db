"""End-to-end oracle for the RAFT-refiner eval chain (VERDICT r4 #6).

Mirrors tests/test_full_eval_chain.py for the ``raft_ycbv`` family: the
chain is converted reference weights → sequence flows + occlusion →
occlusion-filtered RANSAC-PnP → remap → ADD, checked against the torch
reference ``RAFTRefinerFlowMask.forward_single_view`` + ``solve_pose``
(reference models/refiner/raft_refiner_flow_mask.py:133-159,
models/refiner/base_flow_refiner.py:99-155, models/utils/pose.py:182-249).

Split by handoff format (the stages exchange plain flow tensors):
1. network-leg parity — our ``RAFTRefiner`` with INGESTED reference
   weights reproduces the reference decoder's flows/occlusions on the
   same rendered crops, through the real eval-step plumbing;
2. PnP-leg parity — on realistic flows (pose-induced flow + noise +
   occlusion), our batched ``solve_pose_from_flow`` and the reference's
   ``get_2d_3d_corr_by_fw_flow`` → ``cv2.solvePnPRansac`` recover the
   same pose, through remap to the original resolution and final ADD.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast lane: see conftest)

torch = pytest.importorskip("torch")

from torch_ref import build_reference_raft_model, load_reference

ROOT = Path(__file__).resolve().parent.parent


def to_t(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x_nhwc, -1, 1))).float()


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop_raft")
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "4", "--num-classes", "3",
           "--height", "160", "--width", "160", "--max-objects", "1"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


@pytest.fixture(scope="module")
def raft_setup(minibop, tmp_path_factory):
    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank)
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(model=ModelConfig(family="raft_flow_mask", num_class=3,
                                   iters=3, test_iters=3),
                 data=DataConfig(image_scale=128))
    bank = load_mesh_dir(str(minibop / "models"))
    renderer = Renderer(bank, image_size=(128, 128))
    points = build_points_bank(bank, num_points=256)
    trainer = Trainer(cfg, renderer, points)
    trainer.init_eval_state(batch_size=4)

    full, sd = build_reference_raft_model(iters=3, seed=7)
    pth = tmp_path_factory.mktemp("ckpt") / "raft_random.pth"
    torch.save(sd, str(pth))
    report = trainer.load_torch_checkpoint(str(pth))

    ds = RefineDataset(str(minibop / "test"), str(minibop / "init_poses"),
                       str(minibop / "image_lists" / "test.txt"),
                       class_names=("a", "b", "c"))
    mesh_points = [np.asarray(points.points[c]) for c in range(3)]
    builder = TestBatchBuilder(ds, cfg, mesh_points)
    return dict(cfg=cfg, renderer=renderer, points=points, trainer=trainer,
                builder=builder, mesh_points=mesh_points, full=full,
                report=report)


def _reference_flows(full, cfg, renderer, item, test_iters=3):
    """Reference forward_single_view's flow leg on one image's crops
    (raft_refiner_flow_mask.py:133-147), fed the same rendered inputs."""
    import jax.numpy as jnp

    from scflow_tpu.training import render_at_pose

    rendered, depth, _ = render_at_pose(
        renderer, jnp.asarray(item["ref_rotations"]),
        jnp.asarray(item["ref_translations"]), jnp.asarray(item["k"]),
        jnp.asarray(item["labels"]), cfg.data.normalize_mean,
        cfg.data.normalize_std)
    rendered = np.asarray(rendered, np.float32)
    depth = np.asarray(depth, np.float32)
    n, h, w = depth.shape

    with torch.no_grad():
        from scflow_tpu.data.pipeline import normalize_image

        real_norm = np.asarray(item["real_images"])
        if real_norm.dtype == np.uint8:   # loader ships raw u8 crops now
            real_norm = normalize_image(real_norm, cfg.data.normalize_mean,
                                        cfg.data.normalize_std)
        feat_real = full.real_encoder(to_t(real_norm))
        feat_render = full.render_encoder(to_t(rendered))
        cxt = full.context(to_t(rendered))
        h_feat, cxt_feat = torch.split(cxt, [128, 128], dim=1)
        h_feat, cxt_feat = torch.tanh(h_feat), torch.relu(cxt_feat)
        hf, wf = feat_real.shape[-2:]
        init_flow = torch.zeros((n, 2, hf, wf))
        flows, occs = full.decoder(feat_render, feat_real, init_flow,
                                   h_feat, cxt_feat)
    return (flows[-1].numpy(), occs[-1].squeeze(1).numpy(),
            rendered, depth)


def test_conversion_ingested(raft_setup):
    report = raft_setup["report"]
    assert not report["unused"]
    assert len(report["covered"]) > 100


def test_network_leg_parity(raft_setup):
    """Our eval step's final flow + occlusion == the reference decoder's,
    with ingested weights, on the real crop pipeline's inputs."""
    s = raft_setup
    trainer, builder, cfg = s["trainer"], s["builder"], s["cfg"]
    checked = 0
    for i in range(len(builder)):
        item = builder[i]
        if item is None:
            continue
        out = trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats,
            {k: item[k] for k in ("real_images", "ref_rotations",
                                  "ref_translations", "k", "labels")})
        got_flow = np.moveaxis(np.asarray(out["flow"], np.float32), -1, 1)
        got_occ = np.asarray(out["masks"], np.float32)[..., 0]
        want_flow, want_occ, _, _ = _reference_flows(
            s["full"], cfg, s["renderer"], item)
        np.testing.assert_allclose(got_flow, want_flow, atol=5e-2)
        np.testing.assert_allclose(got_occ, want_occ, atol=5e-3)
        checked += 1
        if checked >= 2:          # two images cover the plumbing
            break
    assert checked >= 2


def test_pnp_leg_parity_to_add(raft_setup):
    """Realistic flows (pose-induced + noise + occlusion holes) through
    BOTH pose solvers → remap → ADD: ours matches the reference chain."""
    import jax
    import jax.numpy as jnp

    from scflow_tpu.data.pipeline import remap_pose_to_origin_resolution
    from scflow_tpu.geometry.flow import flow_from_pose_and_depth
    from scflow_tpu.models.flow_pose import solve_pose_from_flow
    from scflow_tpu.training import render_at_pose

    s = raft_setup
    ref = load_reference()
    builder, mesh_points, cfg = s["builder"], s["mesh_points"], s["cfg"]
    rng = np.random.default_rng(0)

    checked = 0
    for i in range(len(builder)):
        item = builder[i]
        if item is None:
            continue
        n = len(item["labels"])
        _, depth, _ = render_at_pose(
            s["renderer"], jnp.asarray(item["ref_rotations"]),
            jnp.asarray(item["ref_translations"]), jnp.asarray(item["k"]),
            jnp.asarray(item["labels"]), cfg.data.normalize_mean,
            cfg.data.normalize_std)
        depth = np.asarray(depth, np.float32)

        # synthetic "network output": exact pose-induced flow toward GT,
        # plus sub-pixel noise; occlusion = visible everywhere except a
        # hole (tests the occlusion filter on both sides)
        gt_r = item["gt_rotations"].astype(np.float32)
        gt_t = item["gt_translations"].astype(np.float32)
        flow = np.asarray(flow_from_pose_and_depth(
            jnp.asarray(item["ref_rotations"]),
            jnp.asarray(item["ref_translations"]),
            jnp.asarray(gt_r), jnp.asarray(gt_t), jnp.asarray(depth),
            jnp.asarray(item["k"]), invalid_num=400.0), np.float32)
        flow = np.where(np.abs(flow) >= 400.0, 0.0, flow)
        flow += rng.normal(0, 0.05, flow.shape).astype(np.float32)
        occ = np.ones(depth.shape, np.float32)
        occ[:, 40:60, 40:60] = 0.0     # occluded hole

        # ours: batched RANSAC-EPnP
        ours = solve_pose_from_flow(
            jax.random.PRNGKey(0), jnp.asarray(flow), jnp.asarray(occ),
            jnp.asarray(depth), jnp.asarray(item["ref_rotations"]),
            jnp.asarray(item["ref_translations"]), jnp.asarray(item["k"]))
        assert bool(np.all(np.asarray(ours["valid"])))

        # reference: get_2d_3d_corr_by_fw_flow + cv2.solvePnPRansac
        # (base_flow_refiner.py:118-137 semantics, occ_thresh 0.5)
        flow_t = torch.from_numpy(np.moveaxis(flow, -1, 1))
        corr = ref.pose.get_2d_3d_corr_by_fw_flow(
            flow_t, torch.from_numpy(depth),
            torch.from_numpy(item["ref_rotations"]).float(),
            torch.from_numpy(item["ref_translations"]).float(),
            torch.from_numpy(item["k"]).float(),
            torch.from_numpy(occ) > 0.5)
        want_r, want_t = [], []
        for j in range(n):
            _, tgt2d, p3 = corr[j]
            r, t, retval = ref.pose.solve_pose_by_pnp(
                tgt2d, p3, torch.from_numpy(item["k"][j]).float())
            assert retval
            want_r.append(np.asarray(r, np.float32))
            want_t.append(np.asarray(t, np.float32))
        want_r, want_t = np.stack(want_r), np.stack(want_t)

        got_r = np.asarray(ours["rotations"], np.float32)
        got_t = np.asarray(ours["translations"], np.float32)

        # both recover the GT pose from near-exact correspondences →
        # mutual agreement at PnP-noise tolerance
        np.testing.assert_allclose(got_r, want_r, atol=2e-2)
        np.testing.assert_allclose(got_t, want_t, rtol=2e-2, atol=2.0)

        # remap both to original resolution and compare the final ADD
        pts_sets = [mesh_points[int(c)][:256] for c in item["labels"]]
        for j in range(n):
            g_r, g_t, _ = remap_pose_to_origin_resolution(
                got_r[j], got_t[j], pts_sets[j][:64], item["k"][j],
                item["transform_matrix"][j], item["ori_k"],
                mode="adapt_intrinsic")
            w_r, w_t, _ = remap_pose_to_origin_resolution(
                want_r[j], want_t[j], pts_sets[j][:64], item["k"][j],
                item["transform_matrix"][j], item["ori_k"],
                mode="adapt_intrinsic")
            a = pts_sets[j] @ g_r.T + g_t
            b = pts_sets[j] @ w_r.T + w_t
            add_between = np.linalg.norm(a - b, axis=-1).mean()
            gt = pts_sets[j] @ gt_r[j].T + gt_t[j]
            add_ours_gt = np.linalg.norm(a - gt, axis=-1).mean()
            assert add_between < 2.0      # mm, solver-to-solver
            assert add_ours_gt < 2.0      # mm, near-exact recovery
        checked += 1
        if checked >= 2:
            break
    assert checked >= 2


def test_full_raft_eval_smoke(raft_setup):
    """The packed eval loop runs the RAFT family end to end (flows →
    PnP → remap → ADD metric) with finite results."""
    from scflow_tpu.metrics import ADDMetric
    from scflow_tpu.training.evaluate import evaluate_dataset

    s = raft_setup
    metric = ADDMetric(points_per_class=s["mesh_points"],
                       diameters=np.asarray(s["points"].diameters),
                       class_names=("a", "b", "c"))
    # slot budget must divide the 8-device virtual test mesh
    metrics, _ = evaluate_dataset(s["trainer"], s["builder"], metric,
                                  slot_budget=8, progress_every=0)
    assert metrics["num_instances"] >= 4
    for k, v in metrics.items():
        assert np.all(np.isfinite(v)), f"non-finite metric {k}"

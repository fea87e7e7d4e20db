"""One oracle test of the COMPLETE eval chain.

Runs the real ``test.py`` path — minibop BOP crops → ``TestBatchBuilder``
→ packed sharded batches → render at ref pose → SCFlow refinement with
CONVERTED reference weights (ingested from a saved ``.pth`` through
``Trainer.load_torch_checkpoint``, the ``--torch-checkpoint`` path) →
``remap_pose_to_origin_resolution`` → per-object ADD — and checks every
stage against the reference's ``forward_single_pass`` equivalent
(``extract_feat`` + ``SCFlowDecoder`` + ``remap_pose_to_origin_resoluaion``,
reference models/refiner/scflow_refiner.py:142-177 and
models/utils/pose.py:264-309) fed the SAME rendered crops.

This is the end-to-end gate for the "published checkpoint drops into
test.py" claim: if it passes, the whole eval-time glue (crop K adaptation,
packing, test_iters, remap, ADD) reproduces the reference's function, not
just the decoder.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast lane: see conftest)

torch = pytest.importorskip("torch")

from torch_ref import build_reference_scflow_model, load_reference

ROOT = Path(__file__).resolve().parent.parent


def to_t(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x_nhwc, -1, 1))).float()


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop_chain")
    # single object per image: the reference pose head's index_select picks
    # label[0] for the whole batch (pose_head.py:209-210), so per-image
    # reference batches must be label-uniform; OUR packed batches still mix
    # labels across slots, exercising per-slot class selection.
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "6", "--num-classes", "3",
           "--height", "160", "--width", "160", "--max-objects", "1"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


@pytest.fixture(scope="module")
def chain_setup(minibop, tmp_path_factory):
    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank)
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(model=ModelConfig(num_class=3, iters=3, test_iters=3,
                                   lowres_eval=False),
                 data=DataConfig(image_scale=128))
    bank = load_mesh_dir(str(minibop / "models"))
    renderer = Renderer(bank, image_size=(128, 128))
    points = build_points_bank(bank, num_points=256)
    trainer = Trainer(cfg, renderer, points)
    trainer.init_eval_state(batch_size=8)

    # reference model with random weights → .pth on disk → ingestion
    full, sd = build_reference_scflow_model(num_class=3, iters=3,
                                            feat_size=(16, 16), seed=11)
    pth = tmp_path_factory.mktemp("ckpt") / "ref_random.pth"
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


def _reference_predict(full, cfg, renderer, item, test_iters=3):
    """The reference forward_single_pass core on one image's crops, fed the
    same rendered inputs as our eval step (scflow_refiner.py:142-177)."""
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
        real_feat = full.real_encoder(to_t(real_norm))
        render_feat = full.render_encoder(to_t(rendered))
        cxt = full.context(to_t(rendered))
        h_feat, cxt_feat = torch.split(cxt, [128, 128], dim=1)
        h_feat, cxt_feat = torch.tanh(h_feat), torch.relu(cxt_feat)
        outs = full.decoder(
            render_feat, real_feat, h_feat, cxt_feat,
            torch.from_numpy(item["ref_rotations"]).float(),
            torch.from_numpy(item["ref_translations"]).float(),
            torch.from_numpy(depth), torch.from_numpy(item["k"]).float(),
            torch.from_numpy(item["labels"]).long(),
            init_flow=torch.zeros((n, 2, h, w)), invalid_flow_num=0.0)
    seq_r, seq_t = outs[2], outs[3]
    return seq_r[-1].numpy(), seq_t[-1].numpy()


def _add_errors(rot_a, tr_a, rot_b, tr_b, pts):
    a = pts @ np.moveaxis(rot_a, -1, -2) + tr_a[:, None, :]
    b = pts @ np.moveaxis(rot_b, -1, -2) + tr_b[:, None, :]
    return np.linalg.norm(a - b, axis=-1).mean(axis=-1)


def test_conversion_ingested(chain_setup):
    report = chain_setup["report"]
    assert not report["unused"]
    assert len(report["covered"]) > 100
    assert not any(leaf.startswith("batch_stats/")
                   for leaf in report["missing"])


def test_full_chain_parity(chain_setup):
    """packed eval loop (ours) vs per-image reference forward, through to
    per-object ADD against GT — final deltas at f32 tolerance."""
    from scflow_tpu.data.pipeline import remap_pose_to_origin_resolution
    from scflow_tpu.metrics import ADDMetric
    from scflow_tpu.training.evaluate import evaluate_dataset

    s = chain_setup
    cfg, trainer, builder = s["cfg"], s["trainer"], s["builder"]
    mesh_points = s["mesh_points"]

    metric = ADDMetric(points_per_class=mesh_points,
                       diameters=np.asarray(s["points"].diameters),
                       class_names=("a", "b", "c"))
    metrics, results = evaluate_dataset(trainer, builder, metric,
                                        slot_budget=8, collect_results=True,
                                        progress_every=0)
    by_img = {(r["scene_id"], r["img_id"]): r for r in results}
    assert metrics["num_instances"] >= 6
    for k, v in metrics.items():
        assert np.all(np.isfinite(v)), f"non-finite metric {k}"

    ref = load_reference()
    n_checked = 0
    for i in range(len(builder)):
        item = builder[i]
        if item is None:
            continue
        ours = by_img[(item["scene_id"], item["img_id"])]
        want_r, want_t = _reference_predict(s["full"], cfg, s["renderer"],
                                            item)

        # the crop pipeline adapts K (adapt_intrinsic), so remap is the
        # identity on both sides — still exercise both implementations
        meta = {"geometry_transform_mode": "adapt_intrinsic"}
        (ref_r_list,), (ref_t_list,) = (
            ref.pose.remap_pose_to_origin_resoluaion(
                [torch.from_numpy(want_r)], [torch.from_numpy(want_t)],
                [torch.from_numpy(item["k"])], [meta]))
        want_r, want_t = ref_r_list.numpy(), ref_t_list.numpy()
        got_r, got_t = [], []
        for j in range(len(item["labels"])):
            r, t, _ = remap_pose_to_origin_resolution(
                ours["rotations"][j], ours["translations"][j],
                mesh_points[int(item["labels"][j])][:64], item["k"][j],
                item["transform_matrix"][j], item["ori_k"],
                mode="adapt_intrinsic")
            got_r.append(r)
            got_t.append(t)
        got_r, got_t = np.stack(got_r), np.stack(got_t)

        # pose-level parity (converted weights, real rendered crops)
        np.testing.assert_allclose(got_r, want_r, atol=5e-3)
        np.testing.assert_allclose(got_t, want_t, rtol=5e-3, atol=0.5)

        # final per-object ADD vs GT: ours ≈ reference at f32 tolerance
        pts = np.stack([mesh_points[int(c)][:256]
                        for c in item["labels"]])
        gt_r = item["gt_rotations"].astype(np.float32)
        gt_t = item["gt_translations"].astype(np.float32)
        add_ours = np.array([_add_errors(got_r[j:j + 1], got_t[j:j + 1],
                                         gt_r[j:j + 1], gt_t[j:j + 1],
                                         pts[j])[0]
                             for j in range(len(got_r))])
        add_ref = np.array([_add_errors(want_r[j:j + 1], want_t[j:j + 1],
                                        gt_r[j:j + 1], gt_t[j:j + 1],
                                        pts[j])[0]
                            for j in range(len(want_r))])
        np.testing.assert_allclose(add_ours, add_ref, rtol=2e-2, atol=0.5)
        n_checked += len(got_r)
    assert n_checked >= 6


def test_remap_keep_intrinsic_parity(chain_setup):
    """The non-identity remap leg: same predicted pose through our
    remap_pose_to_origin_resolution(keep_intrinsic) vs the reference's
    remap_pose (datasets/pose.py:80-104, cv2 EPnP) — isolates the remap
    math on real eval outputs (in keep_intrinsic mode k_crop == k_origin,
    so both solve under the crop intrinsics)."""
    s = chain_setup
    ref = load_reference()
    builder, mesh_points = s["builder"], s["mesh_points"]

    item = next(b for b in (builder[i] for i in range(len(builder)))
                if b is not None)
    want_r, want_t = _reference_predict(s["full"], s["cfg"], s["renderer"],
                                        item)
    from scflow_tpu.data.pipeline import remap_pose_to_origin_resolution

    for j in range(len(item["labels"])):
        pts = mesh_points[int(item["labels"][j])][:64].astype(np.float64)
        k_crop = item["k"][j].astype(np.float64)
        transform = item["transform_matrix"][j].astype(np.float64)
        ref_r, ref_t, diff = ref.datasets_pose.remap_pose(
            k_crop, want_r[j].astype(np.float64),
            want_t[j].astype(np.float64), pts, k_crop,
            np.linalg.inv(transform))
        assert diff >= 0, "reference remap failed to solve"
        got_r, got_t, _ = remap_pose_to_origin_resolution(
            want_r[j], want_t[j], pts, k_crop, transform, k_crop,
            mode="keep_intrinsic")
        # the reference stops at EPnP; ours polishes with f64 LM — the two
        # solutions agree to ~5e-4 in R (both reproject exactly)
        np.testing.assert_allclose(got_r, ref_r, atol=3e-3)
        np.testing.assert_allclose(got_t, ref_t, rtol=2e-3, atol=0.2)

"""End-to-end disk pipeline test: generate a tiny BOP dataset, read it
back through the real readers, refine with an untrained model, and compute
metrics — the whole test.py path minus the CLI (SURVEY.md §4(e))."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast lane: see conftest)

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop")
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "3", "--num-classes", "2",
           "--height", "160", "--width", "160", "--max-objects", "2"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


def test_generator_layout(minibop):
    assert (minibop / "models" / "obj_000001.ply").exists()
    assert (minibop / "test" / "000001" / "scene_gt.json").exists()
    assert (minibop / "test" / "000001" / "scene_camera.json").exists()
    assert (minibop / "init_poses" / "000001" / "scene_gt.json").exists()
    lines = (minibop / "image_lists" / "test.txt").read_text().split()
    assert len(lines) == 3


def test_supervise_dataset_reads(minibop):
    from scflow_tpu.data.bop import SuperviseTrainDataset

    ds = SuperviseTrainDataset(str(minibop / "test"),
                               str(minibop / "image_lists" / "test.txt"),
                               class_names=("a", "b"), min_visib_fract=0.0)
    item = ds[0]
    assert item is not None
    assert item["image"].shape == (160, 160, 3)
    assert item["gt_masks"].dtype == bool
    assert item["k"].shape[-2:] == (3, 3)


def test_refine_eval_roundtrip(minibop):
    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder, pad_to_batch
    from scflow_tpu.metrics import ADDMetric, format_metric_table
    from scflow_tpu.rendering import load_mesh_dir, Renderer
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank, render_at_pose)
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(model=ModelConfig(num_class=2, iters=2, test_iters=2),
                 data=DataConfig(image_scale=64))
    bank = load_mesh_dir(str(minibop / "models"))
    renderer = Renderer(bank, image_size=(64, 64))
    points = build_points_bank(bank, num_points=128)
    trainer = Trainer(cfg, renderer, points)

    ds = RefineDataset(str(minibop / "test"), str(minibop / "init_poses"),
                       str(minibop / "image_lists" / "test.txt"),
                       class_names=("a", "b"))
    mesh_points = [np.asarray(points.points[c]) for c in range(2)]
    builder = TestBatchBuilder(ds, cfg, mesh_points)

    first = next(b for b in (builder[i] for i in range(len(builder)))
                 if b is not None)
    init = pad_to_batch(first, 8)
    rendered, depth, mask = render_at_pose(
        renderer, init["ref_rotations"], init["ref_translations"],
        init["k"], init["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    trainer.init_state(dict(init, rendered_images=rendered,
                            rendered_depths=depth, rendered_masks=mask,
                            gt_rotations=init["ref_rotations"],
                            gt_translations=init["ref_translations"],
                            gt_masks=mask))

    metric = ADDMetric(points_per_class=mesh_points,
                       diameters=np.asarray(points.diameters),
                       class_names=("a", "b"))
    for i in range(len(builder)):
        item = builder[i]
        if item is None:
            continue
        n = len(item["labels"])
        batch = pad_to_batch(item, 8)
        out = trainer.predict({k: batch[k] for k in
                               ("real_images", "ref_rotations",
                                "ref_translations", "k", "labels")})
        pred = {"labels": item["labels"][:n],
                "rotations": out["rotations"][:n],
                "translations": out["translations"][:n],
                "scores": np.ones(n, np.float32)}
        gt = {"labels": item["gt_labels"],
              "rotations": item["gt_rotations"],
              "translations": item["gt_translations"]}
        metric.process(pred, gt, k=item["ori_k"])

    results = metric.compute()
    assert results["num_instances"] >= 3
    # untrained model ~= init poses; generator jitter keeps ADD < 0.5d mostly
    assert results["average/add_0.50d"] > 0.3
    table = format_metric_table(results)
    assert "average" in table

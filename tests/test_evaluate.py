"""Sharded batched eval: packing, exact-metric equivalence with the
per-image loop, device-side masked accumulation, and observability wiring
(reference analogues: tools/eval.py:39-216, tensorboard_hook.py:87-120)."""
import json
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


class TestPacking:
    def _item(self, n, tag):
        return {
            "real_images": np.full((n, 8, 8, 3), tag, np.float32),
            "ref_rotations": np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
            "ref_translations": np.zeros((n, 3), np.float32),
            "k": np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
            "labels": np.full((n,), tag, np.int64),
        }

    def test_packs_multiple_images_per_batch(self):
        from scflow_tpu.training.evaluate import pack_eval_batches

        items = [self._item(3, 0), self._item(2, 1), self._item(4, 2), None,
                 self._item(1, 3)]
        packs = list(pack_eval_batches(iter(items), slot_budget=8))
        # 3 + 2 fit in the first batch; 4 + 1 in the second
        assert len(packs) == 2
        batch0, metas0 = packs[0]
        assert batch0["real_images"].shape == (8, 8, 8, 3)
        assert [(s, n) for _, s, n in metas0] == [(0, 3), (3, 2)]
        np.testing.assert_array_equal(batch0["sample_valid"],
                                      [1, 1, 1, 1, 1, 0, 0, 0])
        assert list(batch0["labels"][:5]) == [0, 0, 0, 1, 1]
        batch1, metas1 = packs[1]
        assert [(s, n) for _, s, n in metas1] == [(0, 4), (4, 1)]

    def test_oversized_image_truncated(self):
        from scflow_tpu.training.evaluate import pack_eval_batches

        packs = list(pack_eval_batches(iter([self._item(6, 0)]),
                                       slot_budget=4))
        assert len(packs) == 1
        batch, metas = packs[0]
        assert metas[0][2] == 4
        np.testing.assert_array_equal(batch["sample_valid"], [1, 1, 1, 1])


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop_eval")
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "5", "--num-classes", "2",
           "--height", "160", "--width", "160", "--max-objects", "2"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


@pytest.fixture(scope="module")
def eval_setup(minibop):
    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank)
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(model=ModelConfig(num_class=2, iters=2, test_iters=2),
                 data=DataConfig(image_scale=64))
    bank = load_mesh_dir(str(minibop / "models"))
    renderer = Renderer(bank, image_size=(64, 64))
    points = build_points_bank(bank, num_points=128)
    trainer = Trainer(cfg, renderer, points)
    trainer.init_eval_state(batch_size=8)

    ds = RefineDataset(str(minibop / "test"), str(minibop / "init_poses"),
                       str(minibop / "image_lists" / "test.txt"),
                       class_names=("a", "b"))
    mesh_points = [np.asarray(points.points[c]) for c in range(2)]
    builder = TestBatchBuilder(ds, cfg, mesh_points)
    return cfg, renderer, points, trainer, builder, mesh_points


@pytest.mark.slow
class TestShardedEval:
    def _metric(self, mesh_points, points):
        from scflow_tpu.metrics import ADDMetric

        return ADDMetric(points_per_class=mesh_points,
                         diameters=np.asarray(points.diameters),
                         class_names=("a", "b"))

    def test_matches_sequential_loop(self, eval_setup):
        """The packed sharded eval must produce identical metrics to the
        reference-style one-image-per-step loop."""
        from scflow_tpu.data.loader import pad_to_batch
        from scflow_tpu.training.evaluate import evaluate_dataset

        cfg, renderer, points, trainer, builder, mesh_points = eval_setup

        metric_seq = self._metric(mesh_points, points)
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
            metric_seq.process(pred, gt, k=item["ori_k"])
        seq = metric_seq.compute()

        metric_packed = self._metric(mesh_points, points)
        packed, results = evaluate_dataset(trainer, builder, metric_packed,
                                           slot_budget=8,
                                           collect_results=True,
                                           progress_every=0)
        assert packed["num_instances"] == seq["num_instances"]
        for k in seq:
            np.testing.assert_allclose(packed[k], seq[k], rtol=1e-5,
                                       err_msg=f"metric {k} differs")
        assert len(results) >= 5  # one BOP record per image

    def test_records_roundtrip(self, eval_setup):
        """records_arrays/load_arrays preserve compute() exactly (the
        multi-process gather path)."""
        cfg, renderer, points, trainer, builder, mesh_points = eval_setup
        from scflow_tpu.training.evaluate import evaluate_dataset

        metric = self._metric(mesh_points, points)
        out, _ = evaluate_dataset(trainer, builder, metric, slot_budget=8,
                                  progress_every=0)
        arrays = metric.records_arrays()
        metric2 = self._metric(mesh_points, points)
        metric2.load_arrays(arrays)
        out2 = metric2.compute()
        assert out2 == out


@pytest.mark.slow
class TestDeviceAccumulatorEval:
    def test_masked_scene_eval(self):
        """Fully on-device masked ADD(-S) over padded scene-style batches:
        padding slots must not change the metrics."""
        from scflow_tpu.data import synthetic_batch
        from scflow_tpu.rendering import Renderer, make_test_meshes
        from scflow_tpu.training import (Config, ModelConfig,
                                         build_points_bank)
        from scflow_tpu.training.evaluate import evaluate_device_accumulator
        from scflow_tpu.training.trainer import Trainer

        cfg = Config(model=ModelConfig(num_class=2, iters=2, test_iters=2,
                                       feat_channels=64, h_channels=32,
                                       cxt_channels=32, num_levels=2,
                                       radius=2))
        bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.0)
        renderer = Renderer(bank, image_size=(64, 64))
        points = build_points_bank(bank, symmetric_classes=(1,),
                                   num_points=64)
        trainer = Trainer(cfg, renderer, points, use_mesh=False)
        trainer.init_eval_state(batch_size=4)

        batch = {k: np.asarray(v) for k, v in synthetic_batch(
            jax.random.PRNGKey(0), renderer, 3).items()}
        padded = {k: np.concatenate([v, v[:1]], axis=0)
                  for k, v in batch.items()}
        padded["sample_valid"] = np.asarray([1, 1, 1, 0], np.float32)

        out_pad = evaluate_device_accumulator(trainer, [padded], points, 2)
        assert out_pad["num_instances"] == 3
        assert 0.0 <= out_pad["average/auc"] <= 1.0
        assert (out_pad["average/auc_lo"] <= out_pad["average/auc"]
                <= out_pad["average/auc_hi"])

        unpadded = {k: v for k, v in batch.items()}
        out_unpad = evaluate_device_accumulator(trainer, [unpadded],
                                                points, 2)
        for k in out_pad:
            np.testing.assert_allclose(out_pad[k], out_unpad[k], rtol=1e-6,
                                       err_msg=f"{k} differs")


@pytest.mark.slow
class TestObservabilityWiring:
    def test_fit_writes_panels_and_eval_log(self, tmp_path):
        """Trainer.fit with panel_every + eval_fn leaves panel PNGs and
        eval/ scalars in work_dir (VERDICT item 6)."""
        from scflow_tpu.data import synthetic_batch
        from scflow_tpu.rendering import Renderer, make_test_meshes
        from scflow_tpu.training import (Config, DataConfig, LossConfig,
                                         ModelConfig, OptimConfig,
                                         build_points_bank)
        from scflow_tpu.training.evaluate import evaluate_device_accumulator
        from scflow_tpu.training.trainer import Trainer

        cfg = Config(
            model=ModelConfig(num_class=2, iters=2, test_iters=2,
                              feat_channels=64, h_channels=32,
                              cxt_channels=32, num_levels=2, radius=2),
            loss=LossConfig(num_loss_points=64),
            optim=OptimConfig(total_steps=4),
            data=DataConfig(batch_size=2),
            checkpoint_interval=1000, log_interval=2,
            work_dir=str(tmp_path / "run"))
        bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.0)
        renderer = Renderer(bank, image_size=(64, 64))
        points = build_points_bank(bank, num_points=64)
        trainer = Trainer(cfg, renderer, points, use_mesh=False)

        def get_batch(step):
            return synthetic_batch(jax.random.PRNGKey(step), renderer, 2)

        from scflow_tpu.training import render_at_pose

        sample = get_batch(0)
        rendered, depth, mask = render_at_pose(
            renderer, sample["ref_rotations"], sample["ref_translations"],
            sample["k"], sample["labels"], cfg.data.normalize_mean,
            cfg.data.normalize_std)
        trainer.init_state(dict(sample, rendered_images=rendered,
                                rendered_depths=depth, rendered_masks=mask))

        def eval_fn(tr):
            b = synthetic_batch(jax.random.PRNGKey(99), renderer, 2)
            return evaluate_device_accumulator(tr, [b], points, 2)

        trainer.fit(get_batch, num_steps=4, eval_every=2, eval_fn=eval_fn,
                    panel_every=2)

        images = list((tmp_path / "run" / "images").glob("*.png"))
        assert len(images) == 2  # steps 2 and 4
        log_lines = [json.loads(ln) for ln in
                     (tmp_path / "run" / "train_log.jsonl").read_text()
                     .splitlines()]
        assert any("eval/average/auc" in ln for ln in log_lines)
        assert any("epe_iter0" in ln for ln in log_lines)

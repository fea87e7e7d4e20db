"""Multi-object scene training proof (BASELINE.md config 4).

The claim under test: a padded scene batch (filler slots masked by
``sample_valid``) produces *identical* loss, gradients, and BN statistics
to the equivalent unpadded batch — the fixed-shape TPU answer to the
reference's ragged per-image object lists
(models/refiner/base_refiner.py:95,160-167).
"""
import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast lane: see conftest)

ROOT = Path(__file__).resolve().parent.parent


def _pad_batch(batch: dict, total: int) -> dict:
    """Pad every per-sample array with copies of sample 0 + sample_valid."""
    n = len(batch["labels"])
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        filler = np.tile(v[:1], (total - n,) + (1,) * (v.ndim - 1))
        out[k] = np.concatenate([v, filler], axis=0)
    out["sample_valid"] = np.asarray([1.0] * n + [0.0] * (total - n),
                                     np.float32)
    return out


class TestBatchNormMask:
    def test_mask_excludes_padded_slots(self):
        """ConvBlock BN with sample_mask: valid-slot outputs and updated
        running statistics must be identical to the unpadded computation
        (models/layers.py BN mask= path)."""
        from scflow_tpu.models.layers import ConvBlock

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (3, 8, 8, 4))
        x_pad = jnp.concatenate([x, x[:1], x[:1]], axis=0)
        mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])

        block = ConvBlock(16, norm="bn")
        variables = block.init(jax.random.PRNGKey(1), x, train=True)

        out, upd = block.apply(variables, x, train=True,
                               mutable=["batch_stats"])
        out_p, upd_p = block.apply(variables, x_pad, train=True,
                                   sample_mask=mask, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_p[:3]), np.asarray(out),
                                   rtol=1e-6, atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            upd_p["batch_stats"], upd["batch_stats"])

    def test_no_mask_differs(self):
        """Sanity: without the mask, filler slots DO shift BN statistics."""
        from scflow_tpu.models.layers import ConvBlock

        x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 4))
        x_pad = jnp.concatenate([x, 5.0 + x[:1]], axis=0)
        block = ConvBlock(16, norm="bn")
        variables = block.init(jax.random.PRNGKey(1), x, train=True)
        out, _ = block.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        out_p, _ = block.apply(variables, x_pad, train=True,
                               mutable=["batch_stats"])
        assert float(jnp.abs(out_p[:3] - out).max()) > 1e-4


class TestPaddedEqualsUnpadded:
    @pytest.fixture(scope="class")
    def setup(self):
        from scflow_tpu.data import synthetic_batch
        from scflow_tpu.rendering import Renderer, make_test_meshes
        from scflow_tpu.training import (Config, LossConfig, ModelConfig,
                                         build_model, build_points_bank,
                                         render_at_pose)

        cfg = Config(model=ModelConfig(num_class=2, iters=2, test_iters=2,
                                       feat_channels=64, h_channels=32,
                                       cxt_channels=32, num_levels=2,
                                       radius=2),
                     loss=LossConfig(num_loss_points=64))
        bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.0)
        renderer = Renderer(bank, image_size=(64, 64))
        points = build_points_bank(bank, symmetric_classes=(1,),
                                   num_points=64)
        model = build_model(cfg)

        batch = synthetic_batch(jax.random.PRNGKey(0), renderer, 3)
        batch = {k: np.asarray(v) for k, v in batch.items()}
        rendered, depth, mask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], cfg.data.normalize_mean,
            cfg.data.normalize_std)
        full = dict(batch, rendered_images=np.asarray(rendered),
                    rendered_depths=np.asarray(depth),
                    rendered_masks=np.asarray(mask))
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(1), full["rendered_images"],
            full["real_images"], full["ref_rotations"],
            full["ref_translations"], full["rendered_depths"], full["k"],
            full["labels"])
        return cfg, model, points, full, variables

    def test_loss_grads_and_bn_stats_match(self, setup):
        """Loss, every gradient leaf, and the updated BN statistics of a
        padded batch (2 filler slots, sample_valid mask) match the unpadded
        batch — the whole point of the scene plumbing."""
        from scflow_tpu.training import scflow_loss

        cfg, model, points, full, variables = setup
        padded = _pad_batch(full, 5)

        def run(batch):
            grad_fn = jax.value_and_grad(scflow_loss, has_aux=True)
            (loss, (stats, metrics, _)), grads = grad_fn(
                variables["params"], variables.get("batch_stats", {}),
                batch, model=model, points_bank=points, cfg=cfg, train=True)
            return loss, grads, stats, metrics

        loss_u, grads_u, stats_u, metrics_u = jax.jit(run)(full)
        loss_p, grads_p, stats_p, metrics_p = jax.jit(run)(padded)

        np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-5)
        for key in ("loss_pose", "loss_flow", "loss_mask"):
            np.testing.assert_allclose(float(metrics_p[key]),
                                       float(metrics_u[key]), rtol=1e-5)
        flat_u = jax.tree_util.tree_leaves_with_path(grads_u)
        flat_p = jax.tree.leaves(grads_p)
        assert len(flat_u) == len(flat_p)
        for (path, gu), gp in zip(flat_u, flat_p):
            # tolerance floor: XLA compiles different conv/reduce fusions
            # for the 5- vs 3-sample graphs, so f32 reduction order differs
            # in the last ulp and gets amplified through the recurrent
            # pose → pose-induced-flow chain. Exact invariance to the
            # padded slots' *contents* is proven separately below at 1e-6.
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gu), rtol=2e-3, atol=1e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            stats_p, stats_u)

    def test_filler_slots_influence_nothing(self, setup):
        """Replacing filler-slot contents with garbage must not change the
        loss (proves sample_valid gates every loss term)."""
        from scflow_tpu.training import scflow_loss

        cfg, model, points, full, variables = setup
        padded = _pad_batch(full, 5)
        garbage = dict(padded)
        for key in ("real_images", "rendered_images"):
            arr = padded[key].copy()
            arr[3:] = np.float32(7.5)
            garbage[key] = arr

        def loss_of(batch):
            loss, _ = scflow_loss(
                variables["params"], variables.get("batch_stats", {}),
                batch, model=model, points_bank=points, cfg=cfg, train=True)
            return loss

        l1 = float(jax.jit(loss_of)(padded))
        l2 = float(jax.jit(loss_of)(garbage))
        np.testing.assert_allclose(l2, l1, rtol=1e-6)


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop_scene")
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "4", "--num-classes", "2",
           "--height", "160", "--width", "160", "--max-objects", "3"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


class TestSceneBatchBuilder:
    def test_layout_and_sample_valid(self, minibop):
        from scflow_tpu.data.bop import SuperviseTrainDataset
        from scflow_tpu.data.loader import SceneTrainBatchBuilder
        from scflow_tpu.rendering import load_mesh_dir
        from scflow_tpu.training import Config, DataConfig, ModelConfig, \
            build_points_bank

        cfg = Config(model=ModelConfig(num_class=2),
                     data=DataConfig(image_scale=64, batch_size=8))
        bank = load_mesh_dir(str(minibop / "models"))
        points = build_points_bank(bank, num_points=64)
        mesh_points = [np.asarray(points.points[c]) for c in range(2)]
        ds = SuperviseTrainDataset(str(minibop / "test"),
                                   str(minibop / "image_lists" / "test.txt"),
                                   class_names=("a", "b"), sample_num=-1,
                                   min_visib_fract=0.0)
        builder = SceneTrainBatchBuilder(
            ds, cfg, mesh_points, list(np.asarray(points.diameters)),
            num_images=2, slots_per_image=4)
        batch = builder()

        n = 2 * 4
        assert batch["real_images"].shape == (n, 64, 64, 3)
        assert batch["sample_valid"].shape == (n,)
        valid = batch["sample_valid"].reshape(2, 4)
        # per image: a contiguous run of 1s then 0s, at least one valid slot
        for row in valid:
            k = int(row.sum())
            assert k >= 1
            np.testing.assert_array_equal(row,
                                          [1.0] * k + [0.0] * (4 - k))
        # filler slots replicate the image's slot 0 (safe, masked anyway)
        for img in range(2):
            row = valid[img]
            k = int(row.sum())
            for pad_slot in range(k, 4):
                np.testing.assert_array_equal(
                    batch["labels"][img * 4 + pad_slot],
                    batch["labels"][img * 4])
        # every valid slot has a usable crop + pose
        assert np.isfinite(batch["gt_rotations"]).all()
        assert batch["gt_masks"].max() > 0

    def test_spawn_has_independent_rng(self, minibop):
        from scflow_tpu.data.bop import SuperviseTrainDataset
        from scflow_tpu.data.loader import SceneTrainBatchBuilder
        from scflow_tpu.rendering import load_mesh_dir
        from scflow_tpu.training import Config, DataConfig, ModelConfig, \
            build_points_bank

        cfg = Config(model=ModelConfig(num_class=2),
                     data=DataConfig(image_scale=64))
        bank = load_mesh_dir(str(minibop / "models"))
        points = build_points_bank(bank, num_points=64)
        mesh_points = [np.asarray(points.points[c]) for c in range(2)]
        ds = SuperviseTrainDataset(str(minibop / "test"),
                                   str(minibop / "image_lists" / "test.txt"),
                                   class_names=("a", "b"), sample_num=-1)
        builder = SceneTrainBatchBuilder(
            ds, cfg, mesh_points, list(np.asarray(points.diameters)),
            num_images=1, slots_per_image=2)
        clone = builder.spawn(1)
        assert isinstance(clone, SceneTrainBatchBuilder)
        assert clone.num_images == 1 and clone.slots_per_image == 2
        assert clone.rng is not builder.rng


class TestMaskedSceneMetric:
    def test_masked_accumulator_equals_unpadded(self):
        """MetricAccumulator with a validity mask over padded scene slots
        reproduces the unpadded accumulation (masked ADD(-S) scene eval)."""
        from scflow_tpu.parallel.collect import MetricAccumulator

        rng = np.random.default_rng(0)
        labels = rng.integers(0, 3, size=6).astype(np.int32)
        errors = rng.uniform(0, 80, size=6).astype(np.float32)
        diameters = np.full(6, 150.0, np.float32)

        acc = MetricAccumulator(num_classes=3)
        # unpadded: only the first 4 instances
        s_ref = acc.update(acc.init(), labels[:4], errors[:4], diameters[:4])
        # padded: all 6 slots, the last 2 masked out
        valid = np.asarray([1, 1, 1, 1, 0, 0], np.float32)
        s_pad = acc.update(acc.init(), labels, errors, diameters, valid=valid)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), s_pad, s_ref)
        out = acc.compute(s_pad)
        assert out["num_instances"] == 4

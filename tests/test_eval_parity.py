"""Eval fast-path gating (VERDICT round-2 #5): the accuracy cost of
``lowres_eval`` (low-res pose-flow carry) and of bf16 compute is measured
as a metric-level delta on a synthetic BOP eval, not asserted in comments.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast lane: see conftest)

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop_gate")
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "6", "--num-classes", "2",
           "--height", "160", "--width", "160", "--max-objects", "2"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


def _run_eval(minibop, *, lowres: bool, dtype: str = "float32",
              iters: int = 4):
    import jax

    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.metrics import ADDMetric
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank)
    from scflow_tpu.training.evaluate import evaluate_dataset
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(model=ModelConfig(num_class=2, iters=iters,
                                   test_iters=iters, lowres_eval=lowres,
                                   dtype=dtype),
                 data=DataConfig(image_scale=64))
    bank = load_mesh_dir(str(minibop / "models"))
    renderer = Renderer(bank, image_size=(64, 64))
    points = build_points_bank(bank, num_points=128)
    trainer = Trainer(cfg, renderer, points, use_mesh=False)
    # same init key across variants → identical params
    trainer.init_eval_state(batch_size=8, rng=jax.random.PRNGKey(42))

    ds = RefineDataset(str(minibop / "test"), str(minibop / "init_poses"),
                       str(minibop / "image_lists" / "test.txt"),
                       class_names=("a", "b"))
    mesh_points = [np.asarray(points.points[c]) for c in range(2)]
    builder = TestBatchBuilder(ds, cfg, mesh_points)
    metric = ADDMetric(points_per_class=mesh_points,
                       diameters=np.asarray(points.diameters),
                       class_names=("a", "b"))
    out, _ = evaluate_dataset(trainer, builder, metric, slot_budget=8,
                              progress_every=0)
    return out, metric.records_arrays()


class TestLowresEvalGate:
    def test_lowres_auc_delta_under_a_tenth_point(self, minibop):
        """Full eval, exact vs lowres pose-flow carry: per-instance ADD
        errors and the AUC must be metrically indistinguishable
        (< 0.1 pt AUC, < 0.2 mm per-instance) — the number that justifies
        ``ModelConfig.lowres_eval=True`` as the default."""
        exact, rec_exact = _run_eval(minibop, lowres=False)
        fast, rec_fast = _run_eval(minibop, lowres=True)
        assert exact["num_instances"] == fast["num_instances"] > 0
        np.testing.assert_array_equal(rec_exact["labels"],
                                      rec_fast["labels"])
        finite = np.isfinite(rec_exact["add"])
        assert float(np.abs(rec_exact["add"][finite]
                            - rec_fast["add"][finite]).max()) < 0.2
        assert abs(exact["instance/auc"] - fast["instance/auc"]) < 1e-3
        assert abs(exact["average/auc"] - fast["average/auc"]) < 1e-3


class TestBf16EvalGate:
    def test_bf16_auc_delta_small(self, minibop):
        """bf16 compute vs f32 on the same weights: the metric-level cost
        of the TPU fast path, bounded in a test (pose math stays f32; only
        the conv/GRU stack runs bf16)."""
        f32, rec32 = _run_eval(minibop, lowres=True, dtype="float32")
        bf16, rec16 = _run_eval(minibop, lowres=True, dtype="bfloat16")
        assert f32["num_instances"] == bf16["num_instances"] > 0
        # bf16 perturbs each iteration's delta pose slightly; bound the
        # end-to-end metric drift
        assert abs(f32["instance/auc"] - bf16["instance/auc"]) < 0.01
        assert abs(f32["average/auc"] - bf16["average/auc"]) < 0.01

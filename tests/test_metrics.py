"""ADD metric, AUC, matching, and BOP writer tests (pure numpy)."""
import json
import os

import numpy as np
import pytest

from scflow_tpu.metrics import ADDMetric, add_auc, match_results, write_bop_results
from scflow_tpu.metrics.add import add_error_np, adds_error_np, rep_error_np


@pytest.fixture
def points():
    rng = np.random.default_rng(0)
    return [rng.normal(scale=50, size=(200, 3)).astype(np.float32)
            for _ in range(3)]


def rot_z(deg):
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestErrors:
    def test_add_translation(self, points):
        r = np.eye(3, dtype=np.float32)
        e = add_error_np(points[0], r, np.array([3., 4., 0.]), r, np.zeros(3))
        assert abs(e - 5.0) < 1e-4

    def test_adds_leq_add(self, points):
        e_add = add_error_np(points[0], rot_z(30), np.zeros(3),
                             np.eye(3), np.zeros(3))
        e_adds = adds_error_np(points[0], rot_z(30), np.zeros(3),
                               np.eye(3), np.zeros(3))
        assert e_adds <= e_add + 1e-6

    def test_rep_zero_same_pose(self, points):
        k = np.array([[500., 0, 128], [0, 500., 128], [0, 0, 1]])
        r = np.eye(3, dtype=np.float32)
        t = np.array([0., 0., 600.])
        assert rep_error_np(points[0], k, r, t, r, t) < 1e-5


class TestAUC:
    def test_perfect(self):
        assert add_auc(np.zeros(100)) == pytest.approx(1.0)

    def test_all_beyond_max(self):
        assert add_auc(np.full(10, 1e6)) == pytest.approx(0.0, abs=1e-6)

    def test_halfway(self):
        # all errors at exactly 50mm with max 100 → AUC = 0.5
        assert add_auc(np.full(1000, 50.0)) == pytest.approx(0.5, abs=0.01)

    def test_monotone_in_errors(self):
        rng = np.random.default_rng(0)
        e1 = rng.uniform(0, 50, 100)
        e2 = e1 + 30
        assert add_auc(e1) > add_auc(e2)


class TestMatching:
    def test_lowest_add_wins(self, points):
        r = np.eye(3, dtype=np.float32)
        gt = {"labels": np.array([0]), "rotations": r[None],
              "translations": np.zeros((1, 3))}
        pred = {"labels": np.array([0, 0]),
                "rotations": np.stack([r, r]),
                "translations": np.array([[50., 0, 0], [1., 0, 0]])}
        recs = match_results(pred, gt, points, np.ones(3) * 100, ())
        assert recs[0]["matched"] and recs[0]["pred_idx"] == 1

    def test_missing_pred_is_worst_case(self, points):
        gt = {"labels": np.array([1]), "rotations": np.eye(3)[None],
              "translations": np.zeros((1, 3))}
        pred = {"labels": np.array([0]), "rotations": np.eye(3)[None],
                "translations": np.zeros((1, 3))}
        metric = ADDMetric(points, np.ones(3) * 100, ())
        metric.process(pred, gt)
        out = metric.compute()
        assert out["average/add_0.50d"] == 0.0
        assert out["average/auc"] == 0.0


class TestADDMetric:
    def test_perfect_predictions(self, points):
        metric = ADDMetric(points, np.full(3, 100.0), symmetric_classes=(2,),
                           class_names=("a", "b", "c"))
        rng = np.random.default_rng(1)
        for _ in range(5):
            labels = np.array([0, 1, 2])
            rots = np.stack([np.eye(3, dtype=np.float32)] * 3)
            ts = rng.uniform(-10, 10, (3, 3)).astype(np.float32)
            pred = {"labels": labels, "rotations": rots, "translations": ts}
            metric.process(pred, {"labels": labels, "rotations": rots,
                                  "translations": ts})
        out = metric.compute()
        assert out["average/auc"] == pytest.approx(1.0, abs=1e-4)
        assert out["a/add_0.05d"] == 1.0
        assert out["num_instances"] == 15

    def test_threshold_sensitivity(self, points):
        # 8mm error with 100mm diameter: fails 0.05d, passes 0.10d
        metric = ADDMetric(points, np.full(3, 100.0))
        r = np.eye(3, dtype=np.float32)
        pred = {"labels": np.array([0]), "rotations": r[None],
                "translations": np.array([[8., 0., 0.]])}
        gt = {"labels": np.array([0]), "rotations": r[None],
              "translations": np.zeros((1, 3))}
        metric.process(pred, gt)
        out = metric.compute()
        assert out["average/add_0.05d"] == 0.0
        assert out["average/add_0.10d"] == 1.0


class TestBopWriter:
    def test_round_trip(self, tmp_path):
        results = [{
            "scene_id": 48, "img_id": 1,
            "labels": np.array([0, 4]),
            "rotations": np.stack([np.eye(3)] * 2),
            "translations": np.zeros((2, 3)),
            "scores": np.array([1.0, 0.5]),
        }]
        paths = write_bop_results(results, str(tmp_path))
        assert len(paths) == 1 and paths[0].endswith("000048/scene_gt.json")
        data = json.load(open(paths[0]))
        assert "1" in data and len(data["1"]) == 2
        assert data["1"][0]["obj_id"] == 1
        assert data["1"][1]["obj_id"] == 5


def test_format_metric_table():
    from scflow_tpu.metrics import format_metric_table

    results = {
        "mug/add_0.05d": 0.5, "mug/add_0.10d": 0.75, "mug/add_0.20d": 0.9,
        "mug/add_0.50d": 1.0, "mug/rep_2px": 0.4, "mug/rep_5px": 0.8,
        "mug/rep_10px": 0.95, "mug/auc": 0.8123,
        "average/add_0.05d": 0.5, "average/auc": 0.8123,
        "instance/auc": 0.8, "num_instances": 10,
    }
    table = format_metric_table(results)
    assert "mug" in table and "average" in table
    assert "81.23" in table          # auc as percentage
    assert "instance AUC: 80.00" in table
    assert format_metric_table({}) == "(no results)"


def test_sequence_epe_report():
    import jax.numpy as jnp

    from scflow_tpu.training.logging import sequence_epe_report

    gt = jnp.ones((2, 8, 8, 2))
    seq = jnp.stack([gt * 3.0, gt * 1.5, gt])  # converging to gt
    rep = sequence_epe_report(seq, gt)
    assert len(rep) == 3
    assert rep[0]["epe"] > rep[1]["epe"] > rep[2]["epe"]
    assert rep[2]["epe"] < 1e-6 and rep[2]["acc1"] == 1.0

"""Tests for the named-recipe registry (reference configs/ parity)."""
import pytest

from scflow_tpu.configs import RECIPES, get_recipe


def test_all_recipes_build():
    for name in RECIPES:
        spec = get_recipe(name)
        assert spec.config.model.num_class >= 1
        assert spec.test_data is not None


def test_flagship_recipe_knobs():
    spec = get_recipe("scflow_ycbv_pbr")
    cfg = spec.config
    assert cfg.model.family == "scflow"
    assert cfg.model.iters == 8 and cfg.model.num_levels == 4
    assert cfg.model.radius == 4 and cfg.model.rotation_mode == "ortho6d"
    assert cfg.loss.gamma == 0.8 and cfg.loss.pose_weight == 10.0
    assert cfg.optim.lr == 4e-4 and cfg.optim.total_steps == 100_000
    assert spec.train_data.min_visib_fract == 0.2
    assert len(spec.train_data.class_names) == 21
    assert spec.test_data.ref_annots_root is not None


def test_raft_recipe():
    spec = get_recipe("raft_ycbv")
    assert spec.config.model.family == "raft_flow_mask"
    assert spec.config.model.iters == 12
    assert spec.config.loss.pose_weight == 0.0


def test_track_concat_recipe():
    spec = get_recipe("scflow_track_real_mix_syn")
    assert len(spec.train_data.data_roots) == 2
    assert spec.config.model.num_class == 1
    assert spec.train_data.digits == 5


def test_unknown_recipe():
    with pytest.raises(KeyError):
        get_recipe("nope")


def test_concat_dataset_indexing():
    from scflow_tpu.data.bop import ConcatDataset

    class Fake:
        def __init__(self, vals):
            self.vals = vals

        def __len__(self):
            return len(self.vals)

        def __getitem__(self, i):
            return self.vals[i]

    c = ConcatDataset([Fake([0, 1, 2]), Fake([10, 11])])
    assert len(c) == 5
    assert [c[i] for i in range(5)] == [0, 1, 2, 10, 11]

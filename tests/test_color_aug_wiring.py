"""Background/occlusion augmentation wiring into the train loader
(VERDICT round-2 #9; reference color_transform.py:176-403 + the mixpbr
recipe's RandomBackground(background_dir='data/coco', p=0.3))."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def minibop(tmp_path_factory):
    out = tmp_path_factory.mktemp("minibop_aug")
    cmd = [sys.executable, str(ROOT / "tools" / "make_synthetic_bop.py"),
           "--out", str(out), "--num-images", "3", "--num-classes", "2",
           "--height", "160", "--width", "160", "--max-objects", "2"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    return out


@pytest.fixture(scope="module")
def bg_dir(tmp_path_factory):
    import cv2

    out = tmp_path_factory.mktemp("backgrounds")
    solid = np.full((64, 96, 3), (10, 200, 60), np.uint8)
    cv2.imwrite(str(out / "bg0.png"), solid[..., ::-1])
    cv2.imwrite(str(out / "bg1.jpg"), solid[..., ::-1])
    return out


def _builder(minibop, **data_kwargs):
    from scflow_tpu.data.bop import SuperviseTrainDataset
    from scflow_tpu.data.loader import TrainBatchBuilder
    from scflow_tpu.rendering import load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank)

    cfg = Config(model=ModelConfig(num_class=2),
                 data=DataConfig(image_scale=64, batch_size=2,
                                 color_aug=False, **data_kwargs))
    bank = load_mesh_dir(str(minibop / "models"))
    points = build_points_bank(bank, num_points=64)
    mesh_points = [np.asarray(points.points[c]) for c in range(2)]
    ds = SuperviseTrainDataset(str(minibop / "test"),
                               str(minibop / "image_lists" / "test.txt"),
                               class_names=("a", "b"), min_visib_fract=0.0)
    return TrainBatchBuilder(ds, cfg, mesh_points,
                             list(np.asarray(points.diameters)), seed=0)


class TestBackgroundWiring:
    def test_background_replaced_at_p1(self, minibop, bg_dir):
        b = _builder(minibop, background_dir=str(bg_dir), background_p=1.0)
        assert len(b._bg_paths) == 2
        batch = b()
        imgs = batch["real_images"].astype(np.float32)  # raw uint8 crops
        masks = batch["gt_masks"] > 0.5
        bg_color = np.asarray([10, 200, 60], np.float32)
        for i in range(len(imgs)):
            bg_px = imgs[i][~masks[i]]
            assert len(bg_px) > 50
            # most background pixels carry the solid bg color (resize
            # interpolation only blurs the frame edge)
            close = np.all(np.abs(bg_px - bg_color) < 12.0, axis=-1)
            assert close.mean() > 0.7
            # foreground untouched: object pixels are NOT the bg color
            fg_px = imgs[i][masks[i]]
            fg_close = np.all(np.abs(fg_px - bg_color) < 12.0, axis=-1)
            assert fg_close.mean() < 0.3

    def test_no_background_dir_is_noop(self, minibop):
        b = _builder(minibop)
        assert b._bg_paths == []
        batch = b()
        assert np.isfinite(batch["real_images"]).all()


class TestOcclusionWiring:
    def test_occlusion_shrinks_mask(self, minibop):
        b_occ = _builder(minibop, occlusion_p=1.0)
        b_raw = _builder(minibop)
        item = b_raw.dataset[0]
        assert item is not None
        # identical RNG streams → identical jitter/crop draws; the only
        # divergence is the occlusion branch, so masks are comparable
        shrunk = 0
        for seed in range(5):
            b_raw.rng = np.random.default_rng(seed)
            b_occ.rng = np.random.default_rng(seed)
            raw = b_raw._prep_object(item, 0)["gt_masks"] > 0.5
            occ = b_occ._prep_object(item, 0)["gt_masks"] > 0.5
            assert occ.sum() <= raw.sum()
            shrunk += int(occ.sum() < raw.sum())
        assert shrunk >= 3  # p=1.0: occluder pasted in ~every draw

    def test_recipes_wire_background(self):
        from scflow_tpu.configs import get_recipe

        for name in ("scflow_ycbv_mixpbr", "scflow_ycbv_mix20real"):
            cfg = get_recipe(name).config
            assert cfg.data.background_dir == "data/coco"
            assert cfg.data.background_p == 0.3
            assert cfg.data.occlusion_v2_p == 0.3


class TestOcclusionV2:
    """Object-paste occlusion (reference RandomOcclusionV2 behavior class,
    color_transform.py:329-403)."""

    def test_paste_updates_image_and_mask(self):
        from scflow_tpu.data.color_aug import random_occlusion_v2

        rng = np.random.default_rng(0)
        img = np.zeros((96, 96, 3), np.uint8)
        mask = np.zeros((96, 96), bool)
        mask[30:70, 30:70] = True           # target object: 40x40 square
        img[mask] = (200, 0, 0)
        occ_img = np.zeros((96, 96, 3), np.uint8)
        occ_mask = np.zeros((96, 96), bool)
        occ_mask[10:40, 10:40] = True       # occluder: 30x30 square
        occ_img[occ_mask] = (0, 255, 0)

        changed = 0
        for seed in range(8):
            rng = np.random.default_rng(seed)
            out, new_mask = random_occlusion_v2(rng, img, mask, occ_img,
                                                occ_mask, p=1.0)
            # mask only ever shrinks; occluded pixels leave visibility
            assert not (new_mask & ~mask).any()
            # pasted pixels carry occluder content (green channel), and the
            # visibility lost matches where the occluder landed on the mask
            # (up to warp edge pixels: the image warps INTER_LINEAR, the
            # mask INTER_NEAREST — reference does the same split)
            pasted = (out[..., 1] > 200)
            if pasted.any():
                lost = mask & ~new_mask
                agree = (lost == (mask & pasted)).mean()
                assert agree > 0.99
            changed += int((new_mask.sum() < mask.sum()))
        # occluder center lands inside the target bbox and its area is
        # scaled to ~the object's: at p=1 most draws must actually occlude
        assert changed >= 6

    def test_area_matched_scale(self):
        """The pasted occluder's area is ~U(0.5,1.0)× the target's."""
        from scflow_tpu.data.color_aug import random_occlusion_v2

        img = np.zeros((128, 128, 3), np.uint8)
        mask = np.zeros((128, 128), bool)
        mask[40:90, 40:90] = True
        occ_img = np.full((128, 128, 3), (0, 255, 0), np.uint8)
        occ_mask = np.zeros((128, 128), bool)
        occ_mask[60:70, 60:70] = True       # tiny occluder → big upscale
        ratios = []
        for seed in range(12):
            rng = np.random.default_rng(seed)
            out, _ = random_occlusion_v2(rng, img, mask, occ_img, occ_mask,
                                         p=1.0, rotate_range=(0, 0))
            pasted = (out[..., 1] > 200).sum()
            if pasted:
                ratios.append(pasted / mask.sum())
        # in-frame pastes should be near the area-matched window (clipping
        # at the frame border can only shrink them)
        assert ratios and max(ratios) > 0.35 and min(ratios) <= 1.05

    def test_builder_reservoir_wiring(self, minibop):
        """occlusion_v2_p>0: the builder stashes clean crops and pastes
        them; masks shrink vs the unoccluded stream."""
        b_occ = _builder(minibop, occlusion_v2_p=1.0)
        b_raw = _builder(minibop)
        item = b_raw.dataset[0]
        assert item is not None
        # prime the reservoir with one clean crop
        b_occ._prep_object(item, 0)
        assert len(b_occ._occluder_pool) >= 1
        shrunk = 0
        for seed in range(6):
            b_raw.rng = np.random.default_rng(seed)
            b_occ.rng = np.random.default_rng(seed)
            raw = b_raw._prep_object(item, 0)["gt_masks"] > 0.5
            occ = b_occ._prep_object(item, 0)["gt_masks"] > 0.5
            assert occ.sum() <= raw.sum()
            shrunk += int(occ.sum() < raw.sum())
        assert shrunk >= 3

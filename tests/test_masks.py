"""Tests for the instance-mask toolkit (reference BitmapMasks parity,
datasets/mask.py:12-419)."""
import numpy as np

from scflow_tpu.data.masks import InstanceMasks


def _square(h=16, w=16, y0=4, y1=8, x0=4, x1=8):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_areas_and_bboxes():
    masks = InstanceMasks(np.stack([_square(), _square(y0=0, y1=2, x0=0, x1=3)]))
    assert list(masks.areas) == [16, 6]
    boxes = masks.get_bboxes()
    np.testing.assert_allclose(boxes[0], [4, 4, 8, 8])
    np.testing.assert_allclose(boxes[1], [0, 0, 3, 2])


def test_empty_and_background():
    empty = InstanceMasks(np.zeros((0, 8, 8), bool), 8, 8)
    assert len(empty) == 0
    assert empty.get_background_mask().all()
    masks = InstanceMasks(_square(8, 8, 0, 4, 0, 4))
    merged = masks.merge_background_mask()
    assert len(merged) == 2
    assert merged.masks[1].sum() == 64 - 16
    assert not (merged.masks[0] & merged.masks[1]).any()


def test_iof():
    a = InstanceMasks(_square(16, 16, 0, 8, 0, 8))
    b = InstanceMasks(np.stack([_square(16, 16, 0, 8, 0, 8),
                                _square(16, 16, 0, 4, 0, 8),
                                np.zeros((16, 16), bool)]))
    iof = a.cal_iof(b)
    np.testing.assert_allclose(iof[0], [1.0, 0.5, 0.0])


def test_resize_flip_pad_crop():
    masks = InstanceMasks(_square(16, 16, 4, 8, 4, 8))
    r = masks.resize((32, 32))
    assert r.masks.shape == (1, 32, 32)
    assert abs(int(r.areas[0]) - 64) <= 8  # nearest resize keeps ~4x area

    f = masks.flip("horizontal")
    assert f.masks[0, 5, 16 - 8]  # x in [8, 12) after flip
    assert not f.masks[0, 5, 4]

    p = masks.pad((20, 24))
    assert p.masks.shape == (1, 20, 24)
    assert p.areas[0] == masks.areas[0]

    c = masks.crop((4, 4, 8, 8))
    assert c.masks.shape == (1, 4, 4)
    assert c.masks.all()


def test_crop_and_resize():
    masks = InstanceMasks(np.stack([_square(16, 16, 0, 8, 0, 8),
                                    _square(16, 16, 8, 16, 8, 16)]))
    rois = masks.crop_and_resize(np.array([[0, 0, 8, 8], [8, 8, 16, 16]]),
                                 (4, 4))
    assert rois.masks.shape == (2, 4, 4)
    assert rois.masks.all()


def test_translate_shear_rotate():
    masks = InstanceMasks(_square(16, 16, 4, 8, 4, 8))
    t = masks.translate(4, "horizontal")
    assert t.masks[0, 5, 10] and not t.masks[0, 5, 4]
    assert t.areas[0] == masks.areas[0]

    r180 = masks.rotate(180.0)
    # square centered at (6,6) maps to square centered at (10,10)
    assert r180.masks[0, 9, 9]
    assert abs(int(r180.areas[0]) - 16) <= 6

    s = masks.shear(0.5, "horizontal")
    assert s.areas[0] > 0


def test_getitem():
    masks = InstanceMasks(np.stack([_square(), _square(y0=0, y1=2, x0=0, x1=2)]))
    one = masks[0]
    assert len(one) == 1 and one.areas[0] == 16

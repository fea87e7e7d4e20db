"""Visualization tools: draw_detections panels + VisTool overlays
(reference tools/visualize.py:87-156 draw_detections, :582-640
Pytorch3dVisTool)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

cv2 = pytest.importorskip("cv2")

from visualize import VisTool, draw_detections  # noqa: E402


@pytest.fixture(scope="module")
def scene():
    from scflow_tpu.rendering import Renderer, make_test_meshes

    bank = make_test_meshes(num_classes=2, subdivisions=1, radius=40.0)
    renderer = Renderer(bank, image_size=(96, 96))
    k = np.array([[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]], np.float32)
    rots = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    trans = np.array([[0, 0, 400.0], [20, 10, 500.0]], np.float32)
    labels = np.array([0, 1], np.int32)
    ks = np.tile(k, (2, 1, 1))
    pts = np.asarray(bank.verts[0], np.float32)
    return dict(renderer=renderer, rots=rots, trans=trans, labels=labels,
                ks=ks, pts=pts)


def test_draw_detections_draws(scene):
    img = np.zeros((96, 96, 3), np.uint8)
    out = draw_detections(img, scene["rots"], scene["trans"], scene["pts"],
                          scene["ks"], labels=scene["labels"],
                          scores=np.array([0.9, 0.4]))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != 0).any()                  # something was drawn
    assert (img == 0).all()                  # input untouched


def test_vistool_mask_and_contour(scene):
    img = np.full((96, 96, 3), 30, np.uint8)
    for mode in ("mask", "contour"):
        tool = VisTool(scene["renderer"], vis_mode=mode)
        out = tool(img, scene["rots"], scene["trans"], scene["labels"],
                   scene["ks"])
        assert out.shape == img.shape
        assert (out != img).any()
    # score threshold filters everything → input returned unchanged content
    tool = VisTool(scene["renderer"], vis_mode="contour", score_thr=0.95)
    out = tool(img, scene["rots"], scene["trans"], scene["labels"],
               scene["ks"], scores=np.array([0.5, 0.2]))
    np.testing.assert_array_equal(out, img)

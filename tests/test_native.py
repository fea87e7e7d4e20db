"""Native C++ data-path library vs the pure-Python pipeline."""
import numpy as np
import pytest

from scflow_tpu.data.native import (crop_resize_pad_batch, decode_image,
                                    get_lib, load_patch)
from scflow_tpu.data.pipeline import crop_resize_pad

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


@pytest.fixture
def image(rng):
    return rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8)


class TestDecode:
    def test_png_roundtrip(self, tmp_path, image):
        import cv2

        path = str(tmp_path / "img.png")
        cv2.imwrite(path, image[..., ::-1])  # BGR on disk
        out = decode_image(path)
        np.testing.assert_array_equal(out, image)

    def test_jpeg_decode(self, tmp_path, image):
        import cv2

        path = str(tmp_path / "img.jpg")
        cv2.imwrite(path, image[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        out = decode_image(path)
        assert out.shape == image.shape
        # must match cv2's libjpeg decode bit-for-bit
        ref = cv2.imread(path)[..., ::-1]
        np.testing.assert_array_equal(out, ref)

    def test_gray_mask_decode(self, tmp_path):
        import cv2

        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        path = str(tmp_path / "mask.png")
        cv2.imwrite(path, mask)
        out = decode_image(path, channels=1)
        np.testing.assert_array_equal(out, mask)


class TestCropResizePad:
    def test_matches_python_pipeline(self, image):
        k = np.array([[300., 0, 160], [0, 300., 120], [0, 0, 1]], np.float32)
        bbox = np.array([80., 60., 200., 180.], np.float32)
        py = crop_resize_pad(image, bbox, k, 128, size_ratio=1.0)
        patches, transforms = crop_resize_pad_batch([image], bbox[None], 128)
        native = patches[0] * 255.0  # un-normalize (std=255)
        ref = py.patch.astype(np.float32)
        # interior agreement (boundary rows may differ by resampling details)
        diff = np.abs(native[8:-8, 8:-8] - ref[8:-8, 8:-8])
        assert np.median(diff) < 6.0
        np.testing.assert_allclose(transforms[0], py.transform, atol=1.0)

    def test_batch_threads(self, image):
        boxes = np.asarray([[10, 10, 110, 110], [50, 40, 250, 200],
                            [-20, -20, 100, 100], [200, 100, 340, 260]],
                           np.float32)
        patches, transforms = crop_resize_pad_batch([image] * 4, boxes, 64,
                                                    num_threads=4)
        assert patches.shape == (4, 64, 64, 3)
        assert np.isfinite(patches).all()
        # out-of-frame crop has pad values (128/255)
        assert np.any(np.isclose(patches[2], 128.0 / 255.0, atol=1e-3))

    def test_load_patch_fused(self, tmp_path, image):
        import cv2

        path = str(tmp_path / "img.png")
        cv2.imwrite(path, image[..., ::-1])
        out, transform = load_patch(path, [40, 30, 180, 170], 96)
        assert out.shape == (96, 96, 3)
        assert transform.shape == (3, 3)
        assert np.isfinite(out).all()

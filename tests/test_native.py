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


class TestBuilderNativePath:
    """The native path wired into the loaders (VERDICT round-2 #7):
    TestBatchBuilder native crops agree with the Python pipeline, and the
    end-to-end eval metrics are insensitive to the switch."""

    @pytest.fixture(scope="class")
    def minibop(self, tmp_path_factory):
        import subprocess
        import sys
        from pathlib import Path

        root = Path(__file__).resolve().parent.parent
        out = tmp_path_factory.mktemp("minibop_native")
        cmd = [sys.executable, str(root / "tools" / "make_synthetic_bop.py"),
               "--out", str(out), "--num-images", "3", "--num-classes", "2",
               "--height", "160", "--width", "160", "--max-objects", "2"]
        res = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=str(root))
        assert res.returncode == 0, res.stderr[-2000:]
        return out

    def _builder(self, minibop, use_native):
        from scflow_tpu.data.bop import RefineDataset
        from scflow_tpu.data.loader import TestBatchBuilder
        from scflow_tpu.rendering import load_mesh_dir
        from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                         build_points_bank)

        cfg = Config(model=ModelConfig(num_class=2),
                     data=DataConfig(image_scale=64, use_native=use_native,
                                     native_crop="on" if use_native
                                     else "off"))
        bank = load_mesh_dir(str(minibop / "models"))
        points = build_points_bank(bank, num_points=128)
        mesh_points = [np.asarray(points.points[c]) for c in range(2)]
        ds = RefineDataset(str(minibop / "test"),
                           str(minibop / "init_poses"),
                           str(minibop / "image_lists" / "test.txt"),
                           class_names=("a", "b"))
        return TestBatchBuilder(ds, cfg, mesh_points)

    def test_transforms_identical_patches_close(self, minibop):
        b_native = self._builder(minibop, True)
        b_python = self._builder(minibop, False)
        assert b_native._native, "native lib should have built"
        checked = 0
        for i in range(len(b_native)):
            a, b = b_native[i], b_python[i]
            if a is None:
                continue
            # box shaping is shared -> transforms and adapted K identical
            np.testing.assert_allclose(a["transform_matrix"],
                                       b["transform_matrix"], atol=1e-5)
            np.testing.assert_allclose(a["k"], b["k"], rtol=1e-6)
            # resampling kernels differ in boundary details only; the
            # native path emits normalized f32, the python path raw uint8
            # (device-normalized) — compare on the normalized scale
            from scflow_tpu.data.pipeline import normalize_image

            av, bv = a["real_images"], b["real_images"]
            if av.dtype == np.uint8:
                av = normalize_image(av)
            if bv.dtype == np.uint8:
                bv = normalize_image(bv)
            diff = np.abs(av - bv)
            assert float(np.median(diff)) < 0.02  # images in [0, 1]
            checked += 1
        assert checked >= 3

    def test_decode_used_by_reader(self, minibop):
        """BOP readers route image decode through the C++ library when
        enabled (bit-exact with cv2 per TestDecode above)."""
        import cv2

        from scflow_tpu.data import native
        from scflow_tpu.data.bop import _imread

        img_path = next((minibop / "test" / "000001" / "rgb").glob("*.png"))
        native.set_enabled(True)
        a = _imread(str(img_path))
        native.set_enabled(False)
        b = _imread(str(img_path))
        native.set_enabled(True)
        np.testing.assert_array_equal(a, b)

"""ctypes bindings for the C++ data-path library (native/scflow_native.cpp).

Builds the shared library on first use (g++ + libjpeg/libpng, both baked
into the image) and exposes:
- :func:`decode_image` — JPEG/PNG → RGB uint8 array.
- :func:`load_patch` — fused decode + crop + keep-ratio resize + center pad
  + normalize, returning the float32 patch and the accumulated 3×3 affine
  (identical semantics to ``scflow_tpu.data.pipeline.crop_resize_pad``).
- :func:`crop_resize_pad_batch` — thread-pooled batch over in-memory images.

Falls back to the pure-Python pipeline when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libscflow_native.so"))
_lib = None

# default-on where the library builds (DataConfig.use_native / SCFLOW_NATIVE
# override); every native call site falls back to the Python path when off
_enabled = os.environ.get("SCFLOW_NATIVE", "1") != "0"


def set_enabled(value: bool) -> None:
    """Toggle the native data path (wired from DataConfig.use_native)."""
    global _enabled
    _enabled = bool(value)


def is_enabled() -> bool:
    return _enabled


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.scflow_decode_image.restype = ctypes.c_longlong
    lib.scflow_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.scflow_image_dims.restype = ctypes.c_int
    lib.scflow_image_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.scflow_load_patch.restype = ctypes.c_int
    lib.scflow_load_patch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.scflow_crop_resize_pad_batch.restype = None
    _lib = lib
    return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_image(path: str, channels: int = 3) -> np.ndarray:
    """Decode a JPEG/PNG file to (H, W, C) uint8 (RGB or grayscale).

    A header-only dims probe sizes the buffer so pixels decode exactly once
    (the old probe-by-decoding pattern ran libjpeg twice per image)."""
    lib = get_lib()
    if lib is None:
        from .bop import _imread

        return _imread(path, gray=channels == 1)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.scflow_image_dims(path.encode(), ctypes.byref(h),
                               ctypes.byref(w))
    if rc != 0:
        raise IOError(f"header probe failed ({rc}) for {path}")
    need = h.value * w.value * channels
    buf = np.empty(need, np.uint8)
    got = lib.scflow_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        need, ctypes.byref(h), ctypes.byref(w), channels)
    if got < 0:
        raise IOError(f"decode failed ({got}) for {path}")
    assert got == need, (got, need, path)
    shape = (h.value, w.value) if channels == 1 else (h.value, w.value, 3)
    return buf.reshape(shape)


def load_patch(path: str, bbox, out_size: int, pad_val: float = 128.0,
               mean=(0.0, 0.0, 0.0), std=(255.0, 255.0, 255.0)):
    """Fused decode+crop+resize+pad+normalize.

    Returns (patch (S, S, 3) float32, transform (3, 3) float32) or None if
    the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    box = np.ascontiguousarray(np.asarray(bbox, np.float32))
    mean = np.ascontiguousarray(np.asarray(mean, np.float32))
    std = np.ascontiguousarray(np.asarray(std, np.float32))
    out = np.empty((out_size, out_size, 3), np.float32)
    transform = np.empty((3, 3), np.float32)
    sh = ctypes.c_int()
    sw = ctypes.c_int()
    rc = lib.scflow_load_patch(path.encode(), _fptr(box), out_size,
                               ctypes.c_float(pad_val), _fptr(mean),
                               _fptr(std), _fptr(out), _fptr(transform),
                               ctypes.byref(sh), ctypes.byref(sw))
    if rc != 0:
        raise IOError(f"load_patch failed ({rc}) for {path}")
    return out, transform


def crop_resize_pad_batch(images: list[np.ndarray], boxes: np.ndarray,
                          out_size: int, pad_val: float = 128.0,
                          mean=(0.0, 0.0, 0.0), std=(255.0, 255.0, 255.0),
                          num_threads: int = 2):
    """Thread-pooled batch crop/resize/pad/normalize over in-memory images.

    Returns (patches (N, S, S, 3) float32, transforms (N, 3, 3)).
    """
    lib = get_lib()
    n = len(images)
    boxes = np.ascontiguousarray(np.asarray(boxes, np.float32))
    mean = np.ascontiguousarray(np.asarray(mean, np.float32))
    std = np.ascontiguousarray(np.asarray(std, np.float32))
    out = np.empty((n, out_size, out_size, 3), np.float32)
    transforms = np.empty((n, 3, 3), np.float32)
    if lib is None:
        from .pipeline import crop_resize_pad

        for i, img in enumerate(images):
            res = crop_resize_pad(img, boxes[i], np.eye(3, dtype=np.float32),
                                  out_size, size_ratio=1.0, pad_val=int(pad_val))
            out[i] = (res.patch.astype(np.float32) - mean) / std
            transforms[i] = res.transform
        return out, transforms

    images = [np.ascontiguousarray(im) for im in images]
    img_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images])
    heights = np.asarray([im.shape[0] for im in images], np.int32)
    widths = np.asarray([im.shape[1] for im in images], np.int32)
    lib.scflow_crop_resize_pad_batch(
        img_ptrs,
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        3, _fptr(boxes), n, out_size, ctypes.c_float(pad_val), _fptr(mean),
        _fptr(std), _fptr(out), _fptr(transforms), num_threads)
    return out, transforms

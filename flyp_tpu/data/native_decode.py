"""ctypes bindings for the native C++ decode/transform library.

``native/flyp_native.cc`` implements JPEG/PNG decode (libjpeg/libpng) and
the CLIP bicubic transforms with Pillow-matching numerics.  ctypes releases
the GIL for the duration of each call, so the threaded loader
(`flyp_tpu/data/loader.py`) scales across host cores — the Python/PIL path
serializes on the GIL (the reference sidesteps this with DataLoader worker
*processes*, `laion.py:586`; threads + native code is the lighter design).

The shared library is built on first use with g++ (cached beside the
source; rebuilt when the source is newer).  Everything degrades gracefully:
``available()`` is False when the toolchain or headers are missing, and
callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from flyp_tpu.data.transforms import CLIP_MEAN, CLIP_STD, sample_resized_crop_box

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "flyp_native.cc")
_LIB = os.path.join(os.path.dirname(_SRC), "libflyp_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-lpng", "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        # An existing .so with no source alongside (installed-package layout,
        # pruned tree) is taken as-is rather than crashing on getmtime(_SRC).
        fresh = os.path.exists(_LIB) and (
            not os.path.exists(_SRC) or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        )
        if not fresh and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.flyp_image_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.flyp_image_info.restype = ctypes.c_int
        lib.flyp_decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.flyp_decode_rgb.restype = ctypes.c_int
        lib.flyp_transform.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.flyp_transform.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode(data: bytes) -> np.ndarray:
    """JPEG/PNG bytes -> RGB8 HWC array. Raises ValueError on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode library unavailable")
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.flyp_image_info(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("unsupported or corrupt image")
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    if lib.flyp_decode_rgb(data, len(data), out.ctypes.data_as(ctypes.c_void_p)) != 0:
        raise ValueError("image decode failed")
    return out


_MEAN = np.ascontiguousarray(CLIP_MEAN, dtype=np.float32)
_STD = np.ascontiguousarray(CLIP_STD, dtype=np.float32)


def _transform(rgb: np.ndarray, box: Tuple[float, float, float, float],
               rs_w: int, rs_h: int, crop: Tuple[int, int, int]) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode library unavailable")
    h, w = rgb.shape[:2]
    cx, cy, cs = crop
    out_size = cs if cs > 0 else None
    out = np.empty((out_size or rs_h, out_size or rs_w, 3), dtype=np.float32)
    rgb = np.ascontiguousarray(rgb)
    rc = lib.flyp_transform(
        rgb.ctypes.data_as(ctypes.c_void_p), h, w,
        box[0], box[1], box[2], box[3], rs_w, rs_h, cx, cy, cs,
        _MEAN.ctypes.data_as(ctypes.c_void_p), _STD.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("native transform failed")
    return out


def train_transform_from_rgb(rgb: np.ndarray, n_px: int, rng: np.random.Generator) -> np.ndarray:
    """RandomResizedCrop(0.9-1.0 bicubic) + normalize, PIL-equivalent."""
    h, w = rgb.shape[:2]
    top, left, ch, cw = sample_resized_crop_box(w, h, rng)
    return _transform(rgb, (left, top, left + cw, top + ch), n_px, n_px, (0, 0, 0))


def eval_transform_from_rgb(rgb: np.ndarray, n_px: int) -> np.ndarray:
    """Resize shortest side + center crop + normalize, PIL-equivalent."""
    h, w = rgb.shape[:2]
    if w <= h:
        new_w, new_h = n_px, max(1, round(n_px * h / w))
    else:
        new_w, new_h = max(1, round(n_px * w / h)), n_px
    left = round((new_w - n_px) / 2)
    top = round((new_h - n_px) / 2)
    return _transform(rgb, (0, 0, w, h), new_w, new_h, (left, top, n_px))


class NativeTransform:
    """Path-consuming transform: native decode + transform, PIL fallback.

    Datasets detect the ``from_path`` attribute and hand over the file path
    instead of a decoded PIL image, keeping the whole hot path in C++.
    """

    def __init__(self, n_px: int, train: bool):
        self.n_px = n_px
        self.train = train

    def from_path(self, path: str, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        with open(path, "rb") as f:
            return self.from_bytes(f.read(), rng)

    def from_bytes(self, data: bytes, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        try:
            rgb = decode(data)
        except ValueError:  # non-JPEG/PNG format: PIL decodes, C++ transforms
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(data))
            rgb = np.asarray(img.convert("RGB") if img.mode != "RGB" else img)
        if self.train:
            return train_transform_from_rgb(rgb, self.n_px, rng or np.random.default_rng())
        return eval_transform_from_rgb(rgb, self.n_px)

    def __call__(self, img, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """PIL-image entry point (same signature as the Python transforms)."""
        rgb = np.asarray(img.convert("RGB") if img.mode != "RGB" else img)
        if self.train:
            return train_transform_from_rgb(rgb, self.n_px, rng or np.random.default_rng())
        return eval_transform_from_rgb(rgb, self.n_px)


def native_train_transform(n_px: int) -> NativeTransform:
    return NativeTransform(n_px, train=True)


def native_eval_transform(n_px: int) -> NativeTransform:
    return NativeTransform(n_px, train=False)

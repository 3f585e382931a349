"""ctypes bindings for the native host-side image ops (native/aadff_io.cpp).

Falls back to scipy/cv2 transparently when the shared library has not been
built (`make -C native`).  The native rotate is bilinear (order=1); the
reference augmentation uses scipy's default cubic spline — for *data
augmentation* the interpolation order is immaterial, and bilinear is what
production loaders use.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libaadff_io.so",
)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        try:  # build on first use if the toolchain is present
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.rotate_bilinear.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_float]
    lib.resize_bilinear.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.flip_inplace.argtypes = [fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int]
    lib.color_jitter.argtypes = [fp, ctypes.c_int64, ctypes.c_float,
                                 ctypes.c_float]
    lib.aadff_io_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_f32_hwc(img):
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        return img[..., None], True
    return img, False


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotate(img, angle_deg: float):
    """Bilinear rotate about the centre (reshape=False, zero fill)."""
    lib = _load()
    if lib is None:
        from scipy.ndimage import rotate as sp_rotate

        return sp_rotate(img, angle_deg, reshape=False, order=1)
    a, squeeze = _as_f32_hwc(img)
    out = np.empty_like(a)
    H, W, C = a.shape
    lib.rotate_bilinear(_ptr(a), _ptr(out), H, W, C, float(angle_deg))
    return out[..., 0] if squeeze else out


def resize(img, out_hw):
    """Bilinear resize to (OH, OW) with half-pixel centers."""
    lib = _load()
    if lib is None:
        import cv2 as cv

        return cv.resize(np.asarray(img, np.float32), (out_hw[1], out_hw[0]))
    a, squeeze = _as_f32_hwc(img)
    H, W, C = a.shape
    OH, OW = out_hw
    out = np.empty((OH, OW, C), np.float32)
    lib.resize_bilinear(_ptr(a), _ptr(out), H, W, C, OH, OW)
    return out[..., 0] if squeeze else out


def flip(img, axis: int):
    """Flip along axis 0 (vertical) or 1 (horizontal); returns a copy."""
    lib = _load()
    a, squeeze = _as_f32_hwc(img)
    a = a.copy()
    if lib is None:
        a = np.ascontiguousarray(np.flip(a, axis))
    else:
        H, W, C = a.shape
        lib.flip_inplace(_ptr(a), H, W, C, int(axis))
    return a[..., 0] if squeeze else a


def color_jitter(img, contrast: float, brightness: float):
    """out = clip(0.5 + contrast*(img-0.5) + brightness, 0, 1), in a copy."""
    lib = _load()
    a = np.ascontiguousarray(img, np.float32).copy()
    if lib is None:
        return np.clip(0.5 + contrast * (a - 0.5) + brightness, 0.0, 1.0)
    lib.color_jitter(_ptr(a), a.size, float(contrast), float(brightness))
    return a

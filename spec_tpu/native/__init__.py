"""Native (C++) host runtime: build-on-first-use + ctypes bindings.

Compiles ``preproc.cpp`` with g++ -O3 -fopenmp into a shared object next
to this package on first use (no pybind11 in this image — plain C ABI via
ctypes). All entry points degrade gracefully: if the toolchain or the .so
is unavailable, callers fall back to the python/cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'preproc.cpp')
_SO = os.path.join(_HERE, '_preproc.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           _SRC, '-o', _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, building it if needed; None when unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
        i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
        lib.spin_crop_batch.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,       # img, H, W
            i32p, ctypes.c_int,                     # corners, n
            ctypes.c_int, f32p, f32p,               # res, mean, std
            ctypes.c_int, f32p]                     # normalize, out
        lib.spin_crop_batch.restype = None
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def spin_crop_batch(
    img: np.ndarray,           # (H, W, 3) float32 RGB [0, 255]
    centers: np.ndarray,       # (N, 2)
    scales: np.ndarray,        # (N,)
    res: int = 224,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    normalize: bool = True,
) -> np.ndarray:
    """Fused SPIN-crop + resize + (optional) ImageNet-normalize for N
    bboxes of one frame. Returns (N, res, res, 3) float32.

    Matches the python path (data/transforms.crop + normalize_img) to
    float rounding; the outermost half-pixel ring may differ (the cv2
    resize clamps at the crop-slice edge, this samples the source frame).
    """
    from spec_tpu.core import constants as C

    from spec_tpu.data.transforms import transform_point

    lib = get_lib()
    assert lib is not None, 'native preproc unavailable'
    img = np.ascontiguousarray(img, np.float32)
    # Keep the caller's dtype for the corner computation: the truncation
    # in transform_point sits on knife edges, and the canonical python
    # path (CamDataset) computes with float32 centers/scales.
    centers = np.asarray(centers).reshape(-1, 2)
    scales = np.asarray(scales).reshape(-1)
    n = len(scales)
    corners = np.empty((n, 4), np.int32)
    for k in range(n):
        ul = transform_point([1, 1], centers[k], float(scales[k]),
                             [res, res], invert=1) - 1
        br = transform_point([res + 1, res + 1], centers[k],
                             float(scales[k]), [res, res], invert=1) - 1
        corners[k] = [ul[0], ul[1], br[0], br[1]]
    mean = np.ascontiguousarray(
        C.IMG_NORM_MEAN if mean is None else mean, np.float32)
    std = np.ascontiguousarray(
        C.IMG_NORM_STD if std is None else std, np.float32)
    out = np.empty((n, res, res, 3), np.float32)
    lib.spin_crop_batch(
        img, img.shape[0], img.shape[1], np.ascontiguousarray(corners),
        n, res, mean, std, int(normalize), out)
    return out

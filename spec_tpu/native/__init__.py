"""Native (C++) host runtime: build-on-first-use + ctypes bindings.

Compiles ``preproc.cpp`` (fused SPIN crop/resize/normalize) and
``raster.cpp`` (z-buffer mesh rasterizer) with g++ -O3 -fopenmp into one
shared object next to this package on first use (no pybind11 in this
image — plain C ABI via ctypes). All entry points degrade gracefully: if
the toolchain or the .so is unavailable, callers fall back to the
python/cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, 'preproc.cpp'),
         os.path.join(_HERE, 'raster.cpp')]
_SO = os.path.join(_HERE, '_native.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           *_SRCS, '-o', _SO]
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
        try:
            stale = not os.path.exists(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(s)
                for s in _SRCS)
        except OSError:
            # sources stripped from the install: use the prebuilt .so
            # if present, otherwise degrade gracefully (docstring
            # contract) instead of raising out of available().
            stale = not os.path.exists(_SO)
        if stale:
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
        u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
        lib.spin_crop_batch.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,       # img, H, W
            i32p, ctypes.c_int,                     # corners, n
            ctypes.c_int, f32p, f32p,               # res, mean, std
            ctypes.c_int, f32p]                     # normalize, out
        lib.spin_crop_batch.restype = None
        lib.raster_mesh.argtypes = [
            f32p, ctypes.c_int,                     # verts_cam, V
            i32p, ctypes.c_int,                     # faces, F
            f32p, ctypes.c_int, ctypes.c_int,       # K, H, W
            f32p, f32p, ctypes.c_int,               # color, lights, n_lights
            f32p, u8p]                              # rgb_out, mask_out
        lib.raster_mesh.restype = None
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


def raster_mesh(
    verts_cam: np.ndarray,     # (V, 3) camera-frame vertices
    faces: np.ndarray,         # (F, 3) int32
    K: np.ndarray,             # (3, 3)
    image_hw,
    base_color,
    light_dirs: np.ndarray,    # (L, 3) normalized directions
):
    """Z-buffer mesh rasterization (see raster.cpp). Returns
    (rgb float32 (H, W, 3) in [0, 1], mask bool (H, W)); rgb is zero
    outside the mask — same contract as utils.renderer.rasterize_mesh."""
    lib = get_lib()
    assert lib is not None, 'native rasterizer unavailable'
    H, W = int(image_hw[0]), int(image_hw[1])
    verts_cam = np.ascontiguousarray(verts_cam, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    rgb = np.zeros((H, W, 3), np.float32)
    mask = np.zeros((H, W), np.uint8)
    lib.raster_mesh(
        verts_cam, verts_cam.shape[0], faces, faces.shape[0],
        np.ascontiguousarray(K, np.float32), H, W,
        np.ascontiguousarray(base_color, np.float32),
        np.ascontiguousarray(light_dirs, np.float32),
        light_dirs.shape[0], rgb, mask)
    return rgb, mask.astype(bool)

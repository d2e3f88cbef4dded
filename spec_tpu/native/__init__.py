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
         os.path.join(_HERE, 'raster.cpp'),
         os.path.join(_HERE, 'jpegroi.cpp')]
_SO = os.path.join(_HERE, '_native.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           *_SRCS, '-o', _SO, '-ljpeg']
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
        u8p_ro = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
        lib.jpeg_probe.argtypes = [u8p_ro, ctypes.c_long, i32p]
        lib.jpeg_probe.restype = ctypes.c_int
        lib.jpeg_decode_roi.argtypes = [
            u8p_ro, ctypes.c_long, ctypes.c_int,    # bytes, n, reduce
            i32p, i32p,                             # x0 (inout), w (inout)
            ctypes.c_int, ctypes.c_int,             # y0, h
            u8p, ctypes.c_int]                      # out, stride_px
        lib.jpeg_decode_roi.restype = ctypes.c_int
        lib.crop_affine_u8.argtypes = [
            u8p_ro, ctypes.c_int, ctypes.c_int,     # img, h, w
            ctypes.c_int,                           # reduce
            ctypes.c_float, ctypes.c_float,         # origin x, y
            f32p, ctypes.c_int, ctypes.c_int,       # aff, res_h, res_w
            ctypes.c_int, f32p, f32p]               # box_clamp, box, out
        lib.crop_affine_u8.restype = None
        lib.jpeg_roi_crop.argtypes = [
            u8p_ro, ctypes.c_long, ctypes.c_int,    # bytes, n, reduce
            ctypes.c_int, ctypes.c_int,             # win_x0, win_y0
            ctypes.c_int, ctypes.c_int,             # win_w, win_h
            f32p, ctypes.c_int, ctypes.c_int,       # aff, res_h, res_w
            ctypes.c_int, f32p, f32p]               # box_clamp, box, out
        lib.jpeg_roi_crop.restype = ctypes.c_int
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


# -- JPEG ROI decode + crop (jpegroi.cpp) -----------------------------------


def _as_u8(data) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(data, np.uint8)
    return np.ascontiguousarray(data, np.uint8).reshape(-1)


def jpeg_probe(data):
    """Header-only probe -> (H, W, exif_orientation, progressive) or
    None when the bytes are not decodable JPEG."""
    lib = get_lib()
    if lib is None:
        return None
    buf = _as_u8(data)
    out = np.zeros(4, np.int32)
    if lib.jpeg_probe(buf, len(buf), out):
        return None
    return int(out[0]), int(out[1]), int(out[2]), bool(out[3])


def jpeg_decode_roi(data, x0: int, y0: int, w: int, h: int,
                    reduce: int = 1):
    """Decode rows [y0, y0+h) x cols [x0, x0+w) of the 1/reduce-scaled
    image. Returns (strip uint8 (h, w, 3), 0) with EXACTLY the requested
    window (the iMCU over-decode is sliced off), or None on any decode
    error (python caller falls back to cv2)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = _as_u8(data)
    stride_px = ((w + 31) // 32 + 2) * 32
    out = np.empty((h, stride_px, 3), np.uint8)
    ax = np.array([x0], np.int32)
    aw = np.array([w], np.int32)
    if lib.jpeg_decode_roi(buf, len(buf), int(reduce), ax, aw,
                           int(y0), int(h), out, stride_px):
        return None
    lo = x0 - int(ax[0])
    return np.ascontiguousarray(out[:, lo:lo + w]), 0


def crop_affine_u8(img: np.ndarray, aff: np.ndarray, res_hw,
                   box=None, reduce: int = 1, origin=(0.0, 0.0)
                   ) -> np.ndarray:
    """The shared SPIN crop sampler over an in-memory uint8 HxWx3 strip.

    aff: 2x3 dst->FULL-RES-src affine (row-major [a,b,c;d,e,f]).
    box: optional SPIN clamp box [x0, y0, x1, y1] (full-res, inclusive) —
      the zero-pad-slice + resize semantics of ``transforms.crop``.
    reduce/origin place the strip on the full-res grid (strip pixel (0,0)
      is reduced-grid pixel ``origin``).
    Returns (res_h, res_w, 3) float32 in [0, 255].
    """
    lib = get_lib()
    assert lib is not None, 'native sampler unavailable'
    img = np.ascontiguousarray(img, np.uint8)
    res_h, res_w = int(res_hw[0]), int(res_hw[1])
    out = np.empty((res_h, res_w, 3), np.float32)
    aff = np.ascontiguousarray(np.asarray(aff, np.float32).reshape(-1)[:6])
    boxf = np.zeros(4, np.float32) if box is None else \
        np.ascontiguousarray(box, np.float32)
    lib.crop_affine_u8(img, img.shape[0], img.shape[1], int(reduce),
                       float(origin[0]), float(origin[1]), aff,
                       res_h, res_w, int(box is not None), boxf, out)
    return out


def jpeg_roi_crop(data, window, aff, res_hw, box=None,
                  reduce: int = 1):
    """Fused JPEG ROI decode + crop: decode only ``window`` (= [x0, y0,
    w, h] in REDUCED-grid coords, pre-clamped to the scaled image) and
    sample the crop from it in one native call. Window must cover every
    bilinear tap of the affine/box (callers add a +-2 px margin).
    Returns (res_h, res_w, 3) float32 in [0, 255], or None on decode
    error (python caller falls back to cv2)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = _as_u8(data)
    res_h, res_w = int(res_hw[0]), int(res_hw[1])
    out = np.empty((res_h, res_w, 3), np.float32)
    aff = np.ascontiguousarray(np.asarray(aff, np.float32).reshape(-1)[:6])
    boxf = np.zeros(4, np.float32) if box is None else \
        np.ascontiguousarray(box, np.float32)
    x0, y0, w, h = (int(v) for v in window)
    if lib.jpeg_roi_crop(buf, len(buf), int(reduce), x0, y0, w, h,
                         aff, res_h, res_w, int(box is not None), boxf,
                         out):
        return None
    return out

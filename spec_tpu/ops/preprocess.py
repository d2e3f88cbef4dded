"""On-device image preprocessing: batched SPIN-crop + resize + normalize.

The BASELINE.json north star calls for the preprocessing hot path (crop,
resize, normalize) fused on device — the reference does all of it per
sample on the host (cam_dataset.py:252-280, tester crop loop :116-125).
This op takes a batch of same-shape frames already in HBM plus per-sample
integer crop corners and emits normalized (B, res, res, 3) crops in one
XLA program (two gathers + fused elementwise): the crops never exist on
the host, and the output feeds the backbone directly.

Geometry matches the host paths exactly: each output pixel bilinearly
samples ``src = ul + (dst + 0.5) * (br - ul) / res - 0.5`` with zero
padding outside the frame (see native/preproc.cpp for the same math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spec_tpu.core import constants as C


def spin_crop_corners(centers, scales, res: int = 224) -> np.ndarray:
    """Integer crop corners (N, 4) [ulx, uly, brx, bry] via the exact host
    transform (data/transforms.transform_point) — host-side, tiny."""
    from spec_tpu.data.transforms import transform_point

    centers = np.asarray(centers).reshape(-1, 2)
    scales = np.asarray(scales).reshape(-1)
    out = np.empty((len(scales), 4), np.int32)
    for k in range(len(scales)):
        ul = transform_point([1, 1], centers[k], float(scales[k]),
                             [res, res], invert=1) - 1
        br = transform_point([res + 1, res + 1], centers[k],
                             float(scales[k]), [res, res], invert=1) - 1
        out[k] = [ul[0], ul[1], br[0], br[1]]
    return out


@functools.partial(jax.jit, static_argnames=('res', 'normalize'))
def crop_resize_normalize(
    frames: jnp.ndarray,    # (B, H, W, 3) float32 RGB in [0, 255]
    corners: jnp.ndarray,   # (B, 4) int32 [ulx, uly, brx, bry]
    res: int = 224,
    normalize: bool = True,
) -> jnp.ndarray:
    """-> (B, res, res, 3) float32, /255 and ImageNet-normalized."""
    B, H, W, _ = frames.shape
    corners = corners.astype(jnp.float32)
    ulx, uly = corners[:, 0:1], corners[:, 1:2]
    box_w = corners[:, 2:3] - ulx
    box_h = corners[:, 3:4] - uly

    r = jnp.arange(res, dtype=jnp.float32) + 0.5
    xs = ulx + r[None, :] * box_w / res - 0.5        # (B, res)
    ys = uly + r[None, :] * box_h / res - 0.5

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[:, None, :, None]                 # (B, 1, res, 1)
    fy = (ys - y0)[:, :, None, None]                 # (B, res, 1, 1)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    b_idx = jnp.arange(B)[:, None, None]

    def tap(yi, xi):
        # (B, res) index vectors -> gathered (B, res, res, 3) with zero
        # padding outside the frame.
        valid = ((yi >= 0) & (yi < H))[:, :, None, None] & \
                ((xi >= 0) & (xi < W))[:, None, :, None]
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = frames[b_idx, yc[:, :, None], xc[:, None, :]]
        return jnp.where(valid, vals, 0.0)

    v = ((1 - fy) * (1 - fx) * tap(y0, x0)
         + (1 - fy) * fx * tap(y0, x0 + 1)
         + fy * (1 - fx) * tap(y0 + 1, x0)
         + fy * fx * tap(y0 + 1, x0 + 1))

    v = v / 255.0
    if normalize:
        v = (v - jnp.asarray(C.IMG_NORM_MEAN)) / jnp.asarray(C.IMG_NORM_STD)
    return v

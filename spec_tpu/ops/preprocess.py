"""On-device image preprocessing: batched SPIN-crop + resize + normalize.

The BASELINE.json north star calls for the preprocessing hot path (crop,
resize, normalize) fused on device — the reference does all of it per
sample on the host (cam_dataset.py:252-280, tester crop loop :116-125).
This op takes a batch of same-shape frames already in HBM plus per-sample
integer crop corners and emits normalized (B, res, res, 3) crops in one
XLA program (two gathers + fused elementwise): the crops never exist on
the host, and the output feeds the backbone directly.

Geometry matches the host paths exactly, INCLUDING the border ring:
each output pixel bilinearly samples ``(dst + 0.5) * box / res - 0.5``
in box coordinates with cv2's edge clamping at the box boundary, mapped
into the frame with zero padding outside it (see native/preproc.cpp for
the same math).
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


def device_jitter_normalize(img_u8: jnp.ndarray, A: jnp.ndarray,
                            b: jnp.ndarray,
                            true_shape: jnp.ndarray = None) -> jnp.ndarray:
    """On-device twin of ``data.pano_dataset.jitter_normalize``: apply a
    per-image ColorJitter affine ``x -> A @ x + b`` (sampled on host by
    ``sample_jitter_affine`` — host keeps the rng and the contrast gray
    mean), clip to [0, 255], ImageNet-normalize. The host then ships RAW
    uint8 frames + (B,3,3)/(B,3) affines instead of normalized f32 — 4x
    less host->device transfer, and XLA fuses the whole chain into the
    first conv's input processing (the normalize multiply it already
    fuses).

    ``true_shape`` (B,2 int): each image's unpadded (h, w). The pad mask
    is rebuilt ON DEVICE from it (two iota comparisons — 8 bytes/sample
    uploaded, not a full-resolution f32 mask, which would hand back most
    of the transfer saving) and zeroes the pad region AFTER
    normalization, so padded pixels stay exactly 0.0 in normalized
    space like the host path's ``pad_collate`` zeros.
    """
    x = img_u8.astype(jnp.float32)
    x = jnp.einsum('bij,bhwj->bhwi', A, x) + b[:, None, None, :]
    x = jnp.clip(x, 0.0, 255.0)
    x = (x / 255.0 - jnp.asarray(C.IMG_NORM_MEAN)) / jnp.asarray(
        C.IMG_NORM_STD)
    if true_shape is not None:
        H, W = x.shape[1], x.shape[2]
        rows = (jnp.arange(H)[None, :]
                < true_shape[:, 0, None])          # (B, H)
        cols = (jnp.arange(W)[None, :]
                < true_shape[:, 1, None])          # (B, W)
        mask = rows[:, :, None] & cols[:, None, :]
        x = x * mask[..., None].astype(x.dtype)
    return x


def _axis_weights(ul: jnp.ndarray, box: jnp.ndarray, size: int,
                  res: int) -> jnp.ndarray:
    """Per-sample bilinear resampling weights along one axis, with cv2
    box-edge semantics.

    The host golden path zero-pad-slices the crop box then cv2.resize's
    it; cv2 CLAMPS sample taps at the box edges (replicating the edge
    pixel) rather than reading neighboring frame pixels. Matching that
    exactly: tap coordinates are computed in BOX space, clamped to
    [0, box-1], mapped into the frame by +ul, and taps outside the frame
    get zero weight (the zero padding).

    ul, box: (B, 1) float32. Returns (B, res, size).
    """
    r = jnp.arange(res, dtype=jnp.float32) + 0.5
    xb = r[None, :] * box / res - 0.5                 # (B, res) box coords
    xb = jnp.clip(xb, 0.0, jnp.maximum(box - 1.0, 0.0))
    c0 = jnp.floor(xb)
    f = (xb - c0)[..., None]                          # (B, res, 1)
    c1 = jnp.minimum(c0 + 1.0, jnp.maximum(box - 1.0, 0.0))
    X0 = (ul + c0)[..., None]                         # frame coords
    X1 = (ul + c1)[..., None]
    idx = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    w = (1.0 - f) * (idx == X0) + f * (idx == X1)
    return w.astype(jnp.float32)                      # (B, res, size)


@functools.partial(jax.jit,
                   static_argnames=('res', 'normalize', 'precision'))
def crop_resize_normalize(
    frames: jnp.ndarray,    # (B, H, W, 3) float32 RGB in [0, 255]
    corners: jnp.ndarray,   # (B, 4) int32 [ulx, uly, brx, bry]
    res: int = 224,
    normalize: bool = True,
    precision: jax.lax.Precision = jax.lax.Precision.HIGH,
) -> jnp.ndarray:
    """-> (B, res, res, 3) float32, /255 and ImageNet-normalized.

    Implemented as two batched one-hot MXU matmuls (separable bilinear)
    rather than gathers: on TPU, XLA lowers batched 4D gathers inside a
    large fused graph to SERIAL while-loops over every output element
    (~350 ms for B=128 at 224^2 — measured), while the matmul form runs
    in ~2 ms. Out-of-frame taps get zero weight rows = zero padding.

    precision: HIGH (bf16_3x, default) keeps 8-bit pixel data within
    0.011/255 of the fp32 host path — 50x under the 2e-3 test budget and
    ~1.5x faster than HIGHEST on the MXU; pass HIGHEST for bit-level
    studies.
    """
    B, H, W, _ = frames.shape
    corners = corners.astype(jnp.float32)
    ulx, uly = corners[:, 0:1], corners[:, 1:2]
    box_w = corners[:, 2:3] - ulx
    box_h = corners[:, 3:4] - uly

    w_y = _axis_weights(uly, box_h, H, res)           # (B, res, H)
    w_x = _axis_weights(ulx, box_w, W, res)           # (B, res, W)

    # Rows then columns (row-first is cheaper: 59 vs 44 GFLOP split).
    tmp = jnp.einsum('bih,bhwc->biwc', w_y, frames, precision=precision,
                     preferred_element_type=jnp.float32)
    v = jnp.einsum('bjw,biwc->bijc', w_x, tmp, precision=precision,
                   preferred_element_type=jnp.float32)

    v = v / 255.0
    if normalize:
        v = (v - jnp.asarray(C.IMG_NORM_MEAN)) / jnp.asarray(C.IMG_NORM_STD)
    return v

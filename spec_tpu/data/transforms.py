"""Host-side image/keypoint transforms (SPIN center-scale-crop semantics).

Re-derivation of the external ``pare.utils.image_utils`` functions the
reference datasets use (``crop``, ``transform``, ``flip_img/kp/pose``,
``rot_aa``, ``random_crop``; import sites reference
``spec/dataset/cam_dataset.py:30-32``). The semantics are the classic
Stacked-Hourglass/SPIN pipeline: a bbox is (center, scale) with side =
scale * 200 px; the crop warps that box (optionally rotated about its
center) to a res x res image.

These run on the host in dataloader workers (decode + crop are IO-bound);
everything downstream (normalize, flip-noise, model) is on-device. The
implementation uses a single cv2.warpAffine with the closed-form affine
instead of the reference's pad-slice-rotate-resize chain — same map,
one pass, ~5x faster on host.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from spec_tpu.core import constants as C

BBOX_SIDE = 200.0  # SPIN convention: bbox pixel side = scale * 200


def get_transform(center, scale, res, rot=0):
    """3x3 matrix mapping original-image points into the res x res crop
    (the SPIN ``get_transform``): scale*200 box -> res, then rotation about
    the crop center."""
    h = BBOX_SIDE * scale
    t = np.zeros((3, 3), dtype=np.float64)
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-center[0] / h + 0.5)
    t[1, 2] = res[0] * (-center[1] / h + 0.5)
    t[2, 2] = 1.0
    if rot != 0:
        rot_rad = -rot * np.pi / 180.0  # counter-clockwise in image coords
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat = np.eye(3)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        # rotate about the crop center
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform_point(pt, center, scale, res, invert=0, rot=0):
    """Map a (2,) point image<->crop (SPIN ``transform``). Uses the SPIN
    1-based convention: callers pass pt+1 and the result is 1-based."""
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = np.array([pt[0] - 1, pt[1] - 1, 1.0])
    new_pt = t @ new_pt
    return new_pt[:2].astype(int) + 1


def crop(img, center, scale, res, rot=0):
    """Crop (and optionally rotate) around (center, scale) to ``res``.

    rot == 0 (the eval path): bit-faithful to the SPIN crop — integer
    ul/br corners from the inverse point transform, zero-padded slice,
    one bilinear resize. Preprocessing parity is a hard requirement for
    the metric budget (SURVEY.md §7.4 item 3).

    rot != 0 (train-only augmentation): a single warpAffine with the
    composite map — one resampling instead of the reference's
    pad/rotate/slice/resize chain; the augmentation is stochastic, so
    subpixel convention drift is irrelevant there.
    """
    if rot == 0:
        ul = transform_point([1, 1], center, scale, res, invert=1) - 1
        br = transform_point([res[0] + 1, res[1] + 1], center, scale, res,
                             invert=1) - 1
        new_shape = [br[1] - ul[1], br[0] - ul[0]]
        if img.ndim > 2:
            new_shape += [img.shape[2]]
        new_img = np.zeros(new_shape, dtype=np.float32)
        new_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
        new_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
        old_x = max(0, ul[0]), min(img.shape[1], br[0])
        old_y = max(0, ul[1]), min(img.shape[0], br[1])
        if new_x[1] > new_x[0] and new_y[1] > new_y[0]:
            new_img[new_y[0]:new_y[1], new_x[0]:new_x[1]] = \
                img[old_y[0]:old_y[1], old_x[0]:old_x[1]]
        return cv2.resize(new_img, (int(res[1]), int(res[0])),
                          interpolation=cv2.INTER_LINEAR)

    t = get_transform(center, scale, res, rot=rot)
    M = t[:2, :].astype(np.float32)
    return cv2.warpAffine(
        img.astype(np.float32), M, (int(res[1]), int(res[0])),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
        borderValue=0)


def flip_img(img):
    """Horizontal flip (reference ``flip_img``)."""
    return np.ascontiguousarray(img[:, ::-1])


def flip_kp(kp):
    """Flip 2D/3D keypoints in the 49-joint layout: negate x and permute
    left/right (reference ``flip_kp`` + spec/constants.py J49 perm)."""
    kp = kp[C.J49_FLIP_PERM] if kp.shape[0] == 49 else kp[C.J24_FLIP_PERM]
    kp[:, 0] = -kp[:, 0]
    return kp


def flip_pose(pose):
    """Flip SMPL axis-angle pose (72,): permute joints L<->R and negate the
    y/z rotation components (reference ``flip_pose``)."""
    pose = pose[C.SMPL_POSE_FLIP_PERM]
    pose[1::3] = -pose[1::3]
    pose[2::3] = -pose[2::3]
    return pose


def rot_aa(aa, rot):
    """Rotate the global orientation axis-angle by an in-plane rotation of
    ``rot`` degrees (reference ``rot_aa``)."""
    if rot == 0:
        return aa
    import cv2 as _cv2
    rot_rad = -rot * np.pi / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    R = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]], dtype=np.float64)
    per_rdg, _ = _cv2.Rodrigues(aa.astype(np.float64))
    res_rot, _ = _cv2.Rodrigues(R @ per_rdg)
    return res_rot.reshape(3).astype(aa.dtype)


def random_crop(center, scale, crop_scale_factor, axis='all', rng=None):
    """Shrink the bbox to a random sub-crop (reference ``random_crop``):
    new side = side * crop_scale_factor, center jittered so the sub-box
    stays inside the original box. ``axis`` limits the jitter direction."""
    rng = rng or np.random
    h = BBOX_SIDE * scale
    new_h = h * crop_scale_factor
    space = (h - new_h) / 2.0
    new_center = np.asarray(center, np.float64).copy()
    if axis in ('all', 'x'):
        new_center[0] += rng.uniform(-space, space)
    if axis in ('all', 'y'):
        new_center[1] += rng.uniform(-space, space)
    return new_center, new_h / BBOX_SIDE


_REDUCED_FLAGS = {}  # populated lazily: cv2 may be absent at import


def read_img(path, reduce: int = 1):
    """RGB uint8 image load (reference ``read_img``: cv2 BGR->RGB).

    Returns uint8, not the reference's float64/float32: both ``crop``
    paths convert exactly (the rot==0 slice assigns into a float32
    buffer; the warp path astypes), so outputs are bit-identical while
    skipping a full-frame float conversion (+24 MB alloc per full-HD
    item) on the hot loader path.

    ``reduce`` in {1, 2, 4, 8} decodes at 1/reduce scale via
    ``cv2.IMREAD_REDUCED_COLOR_N``. For JPEG this is libjpeg DCT-domain
    scaling (the decoder skips most of the IDCT work; the Huffman pass
    is unavoidable, so the end-to-end decode win is ~1.3-2.5x depending
    on content); other formats decode full-size and downsample inside
    imread. Output dims are ceil(full/reduce). No reference analogue —
    this is the opt-in ``fast_decode`` loader path.
    """
    if reduce == 1:
        flag = cv2.IMREAD_COLOR
    else:
        if not _REDUCED_FLAGS:
            _REDUCED_FLAGS.update({2: cv2.IMREAD_REDUCED_COLOR_2,
                                   4: cv2.IMREAD_REDUCED_COLOR_4,
                                   8: cv2.IMREAD_REDUCED_COLOR_8})
        flag = _REDUCED_FLAGS[reduce]
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def image_dims(path):
    """Full-resolution (H, W) from the file header only — no pixel
    decode (PIL defers raster decoding until pixels are accessed). The
    fast_decode path needs the true dims for ``orig_shape``/K while the
    pixels are decoded reduced.

    Must match what ``read_img`` (cv2) returns for the same file: cv2
    APPLIES EXIF orientation by default, while the PIL header reports
    pre-rotation dims — for orientation 5-8 (90°-family rotations) the
    decoded raster is transposed, so the header dims are swapped here.
    """
    from PIL import Image
    with Image.open(path) as im:
        w, h = im.size
        try:
            orientation = im.getexif().get(0x0112, 1)
        except Exception:
            orientation = 1
    if orientation in (5, 6, 7, 8):
        w, h = h, w
    return np.array([h, w], np.float32)


def pick_reduce(box_px: float, out_res: int, margin: float = 1.15,
                max_reduce: int = 8) -> int:
    """Largest decode reduction in {1,2,4,8} that keeps the (center,
    scale) crop a DOWNSAMPLE: box_px/reduce >= margin*out_res. margin
    >1 absorbs the decoder's ceil-rounding and the +-1px SPIN corner
    truncation so the final bilinear resize never upsamples."""
    r = 1
    while r * 2 <= max_reduce and box_px / (r * 2) >= margin * out_res:
        r *= 2
    return r


def crop_from_reduced(img, center, scale, res, reduce: int, rot=0):
    """SPIN crop sampled from a 1/reduce-decoded image.

    ``center``/``scale`` stay in FULL-res coordinates; the function maps
    the full-res crop window into the reduced grid (reduced pixel i
    covers full columns [i*r, (i+1)*r), center at i*r + (r-1)/2) and
    warps in one pass, so the window matches the full-res ``crop`` to
    sub-pixel. Naively rescaling (center, scale) by 1/reduce instead
    puts the SPIN integer corner truncation on the coarser grid — a
    systematic shift of up to ``reduce`` full pixels (measured 0.56 crop
    px at reduce=2 on an 800 px box; test_data.py pins the bound).

    rot == 0 replicates the slice+resize sampling of the full-res path
    (same truncated ul/br corners, then the cv2.resize center-aligned
    map dst j -> src (j+.5)*w/res-.5+ul); rot != 0 composes the train
    augmentation affine with the grid map. Content differs from the
    full-res crop only by the resampling-filter difference.
    """
    if reduce == 1:
        return crop(img, center, scale, res, rot=rot)
    off = (reduce - 1) / 2.0
    if rot == 0:
        ul = transform_point([1, 1], center, scale, res, invert=1) - 1
        br = transform_point([res[0] + 1, res[1] + 1], center, scale, res,
                             invert=1) - 1
        ax = (br[0] - ul[0]) / res[1]
        ay = (br[1] - ul[1]) / res[0]
        # dst (jx, jy) -> reduced src ((ax*jx + bx - off)/reduce, ...)
        M = np.array(
            [[ax / reduce, 0, (0.5 * ax - 0.5 + ul[0] - off) / reduce],
             [0, ay / reduce, (0.5 * ay - 0.5 + ul[1] - off) / reduce]],
            dtype=np.float32)
        return cv2.warpAffine(
            img.astype(np.float32), M, (int(res[1]), int(res[0])),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    grid = np.array([[reduce, 0, off], [0, reduce, off], [0, 0, 1.0]])
    t = get_transform(center, scale, res, rot=rot) @ grid
    return cv2.warpAffine(
        img.astype(np.float32), t[:2, :].astype(np.float32),
        (int(res[1]), int(res[0])), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)


def crop_affine(center, scale, res, rot=0):
    """The SPIN crop as a dst -> full-res-src affine (the single
    closed-form shared by the python cv2 paths above and the native
    sampler ``native.crop_affine_u8`` / ``native.jpeg_roi_crop``).

    Returns ``(aff (2, 3) float32, box (4,) float32 or None)``:

    * rot == 0: the zero-pad-slice + cv2.resize map of :func:`crop` —
      dst (x, y) samples src ``((x + .5) * bw / res_w - .5 + ulx, ...)``
      with coords CLAMPED to the integer SPIN box (``box`` is
      ``[x0, y0, x1, y1]`` inclusive; corners from the exact
      :func:`transform_point` truncation, so knife edges match the
      python path bit-for-bit).
    * rot != 0: the inverse of :func:`get_transform` (what
      cv2.warpAffine inverts internally in :func:`crop`); no clamp box —
      BORDER_CONSTANT semantics.
    """
    if rot == 0:
        ul = transform_point([1, 1], center, scale, res, invert=1) - 1
        br = transform_point([res[0] + 1, res[1] + 1], center, scale, res,
                             invert=1) - 1
        bw, bh = br[0] - ul[0], br[1] - ul[1]
        ax, ay = bw / res[1], bh / res[0]
        aff = np.array([[ax, 0, 0.5 * ax - 0.5 + ul[0]],
                        [0, ay, 0.5 * ay - 0.5 + ul[1]]], np.float32)
        box = np.array([ul[0], ul[1], ul[0] + bw - 1, ul[1] + bh - 1],
                       np.float32)
        return aff, box
    t = get_transform(center, scale, res, rot=rot)
    return np.linalg.inv(t)[:2].astype(np.float32), None


def sample_window(aff, box, res, frame_hw, reduce: int = 1,
                  margin: int = 2):
    """Smallest reduced-grid window covering every bilinear tap of the
    crop ``(aff, box)``: the native ROI decode reads only this.

    Returns ``(x0, y0, w, h)`` in 1/reduce-grid coords clamped to the
    scaled frame, or None when the crop box lies entirely outside the
    frame (the crop is all zeros)."""
    if box is not None:
        u0, v0, u1, v1 = (float(b) for b in box)
    else:
        res_h, res_w = int(res[0]), int(res[1])
        cs = np.array([[0, res_w - 1, 0, res_w - 1],
                       [0, 0, res_h - 1, res_h - 1],
                       [1, 1, 1, 1]], np.float64)
        uv = np.asarray(aff, np.float64) @ cs
        u0, u1 = uv[0].min(), uv[0].max()
        v0, v1 = uv[1].min(), uv[1].max()
    off = (reduce - 1) / 2.0
    x0 = int(np.floor((u0 - off) / reduce)) - margin
    x1 = int(np.ceil((u1 - off) / reduce)) + margin + 1
    y0 = int(np.floor((v0 - off) / reduce)) - margin
    y1 = int(np.ceil((v1 - off) / reduce)) + margin + 1
    rh = int(np.ceil(frame_hw[0] / reduce))
    rw = int(np.ceil(frame_hw[1] / reduce))
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(rw, x1), min(rh, y1)
    if x1 <= x0 or y1 <= y0:
        return None
    return x0, y0, x1 - x0, y1 - y0


def native_jpeg_crops(data, plans, frame_hw, reduce: int = 1):
    """Native fused JPEG ROI decode + SPIN crop(s) of ONE frame.

    ``plans``: list of ``(res, aff, box)`` (from :func:`crop_affine`).
    A single plan decodes + samples in one native call; multiple plans
    (the eval disp_img path) decode the union window once and sample
    each crop from it. Crops whose window misses the frame are zeros
    (matching :func:`crop`'s zero padding).

    Returns a list of float32 ``(res_h, res_w, 3)`` crops in [0, 255],
    or None when the native decode is unavailable/fails (caller falls
    back to the cv2 path)."""
    from spec_tpu import native
    if not native.available():
        return None
    wins, crops = [], [None] * len(plans)
    for res, aff, box in plans:
        wins.append(sample_window(aff, box, res, frame_hw, reduce))
    live = [i for i, w in enumerate(wins) if w is not None]
    for i, w in enumerate(wins):
        if w is None:
            res = plans[i][0]
            crops[i] = np.zeros((int(res[0]), int(res[1]), 3), np.float32)
    if not live:
        return crops
    if len(live) == 1:
        i = live[0]
        res, aff, box = plans[i]
        out = native.jpeg_roi_crop(data, wins[i], aff, res, box=box,
                                   reduce=reduce)
        if out is None:
            return None
        crops[i] = out
        return crops
    x0 = min(wins[i][0] for i in live)
    y0 = min(wins[i][1] for i in live)
    x1 = max(wins[i][0] + wins[i][2] for i in live)
    y1 = max(wins[i][1] + wins[i][3] for i in live)
    got = native.jpeg_decode_roi(data, x0, y0, x1 - x0, y1 - y0,
                                 reduce=reduce)
    if got is None:
        return None
    strip, _ = got
    for i in live:
        res, aff, box = plans[i]
        crops[i] = native.crop_affine_u8(strip, aff, res, box=box,
                                         reduce=reduce, origin=(x0, y0))
    return crops


def motion_blur(img, rng, p=0.5, kernel_range=(3, 7)):
    """Albumentations-MotionBlur equivalent (reference
    spec/dataset/cam_dataset.py:267-272): random-direction line kernel."""
    if rng.rand() >= p:
        return img
    k = int(rng.randint(kernel_range[0], kernel_range[1] + 1)) | 1
    kernel = np.zeros((k, k), np.float32)
    x1, y1 = rng.randint(0, k), rng.randint(0, k)
    x2, y2 = rng.randint(0, k), rng.randint(0, k)
    cv2.line(kernel, (x1, y1), (x2, y2), 1.0, thickness=1)
    s = kernel.sum()
    if s == 0:
        return img
    return cv2.filter2D(img, -1, kernel / s)


def normalize_img(img_hwc: np.ndarray) -> np.ndarray:
    """[0,1] float HWC -> ImageNet-normalized float32 HWC (NHWC for TPU;
    the reference normalizes CHW tensors)."""
    return ((img_hwc - C.IMG_NORM_MEAN) / C.IMG_NORM_STD).astype(np.float32)

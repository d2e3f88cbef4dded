"""CamCalib training datasets (Pano360 perspective crops).

Rebuild of reference ``camcalib/pano_dataset.py`` (CameraRegressorDataset,
the aspect-preserving Resize(min,max), the pad-collator) and
``camcalib/pano_agora_dataset.py`` (npz-merged Pano+AGORA variant).

TPU restructuring: the reference pads every variable-size image in a
batch to the batch max (ImageList, pano_dataset.py:223-306) — a dynamic
shape per batch that would force an XLA recompile each step. Here images
are padded to a fixed size grid (``pad_multiple``, default 64 px) and
grouped by bucket so the step compiles once per bucket. A padding mask is
carried for completeness, but like the reference (which pools over the
padded map) the model average-pools over the padded tensor — training
matches reference behavior.

Targets per loss type (pano_dataset.py:135-142): integer bin indices
(np.digitize against the edge tables) for 'ce'/'kl'; continuous soft
indices in [-1, 1] for the softargmax losses.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance

from spec_tpu.core import bins as B
from spec_tpu.core import constants as C


def resize_scale(w: int, h: int, min_size: int, max_size: int) -> float:
    """torchvision-semantics Resize(min_size) scale with a max_size cap.

    The ONE definition of the resize formula: ``__getitem__`` (both
    decode paths), ``shape_buckets`` and the fast-decode draft target
    must all agree on the final ``round(dim * s)`` size or a 1-px drift
    can cross a pad bucket boundary and break ``pad_collate(fixed_hw)``.
    """
    s = min_size / min(w, h)
    if max(w, h) * s > max_size:
        s = max_size / max(w, h)
    return s


def aspect_resize(pil_img: Image.Image, min_size: int, max_size: int):
    """torchvision-semantics Resize(min_size) with a max_size cap."""
    w, h = pil_img.size
    s = resize_scale(w, h, min_size, max_size)
    return pil_img.resize((round(w * s), round(h * s)), Image.BILINEAR)


def color_jitter(pil_img: Image.Image, rng: np.random.RandomState,
                 brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1):
    """torchvision-ColorJitter equivalent (reference pano_dataset.py:65-78):
    random order, each factor U(1-x, 1+x); hue via HSV shift."""
    ops = []
    ops.append(('brightness',
                rng.uniform(1 - brightness, 1 + brightness)))
    ops.append(('contrast', rng.uniform(1 - contrast, 1 + contrast)))
    ops.append(('saturation', rng.uniform(1 - saturation, 1 + saturation)))
    ops.append(('hue', rng.uniform(-hue, hue)))
    rng.shuffle(ops)
    for name, f in ops:
        if name == 'brightness':
            pil_img = ImageEnhance.Brightness(pil_img).enhance(f)
        elif name == 'contrast':
            pil_img = ImageEnhance.Contrast(pil_img).enhance(f)
        elif name == 'saturation':
            pil_img = ImageEnhance.Color(pil_img).enhance(f)
        elif name == 'hue' and abs(f) > 1e-6:
            hsv = np.asarray(pil_img.convert('HSV')).copy()
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(f * 255)) % 256
            pil_img = Image.fromarray(hsv, 'HSV').convert('RGB')
    return pil_img


_GRAY_W = np.array([0.299, 0.587, 0.114], np.float32)  # ITU-R 601 (PIL L)


def sample_jitter_affine(arr_u8: np.ndarray, rng: np.random.RandomState,
                         brightness=0.2, contrast=0.2, saturation=0.2,
                         hue=0.1):
    """Draw one ColorJitter outcome and compose it into a pixel-space
    affine ``x -> A @ x + b`` (f64). The ONE definition of the factor
    distributions / op-order semantics: :func:`jitter_normalize` applies
    it on host, the device-jitter path ships (A, b) per image and
    applies it on device (ops/preprocess.device_jitter_normalize) —
    identical rng draw pattern to both and to :func:`color_jitter`."""
    ops = [('brightness', rng.uniform(1 - brightness, 1 + brightness)),
           ('contrast', rng.uniform(1 - contrast, 1 + contrast)),
           ('saturation', rng.uniform(1 - saturation, 1 + saturation)),
           ('hue', rng.uniform(-hue, hue))]
    rng.shuffle(ops)

    # contrast's gray mean on a 4x-strided grid: the full-image u8
    # reduce measured 23 ms/item (the single hottest line); the
    # subsampled estimate is within ~0.5 gray levels on natural images
    # and enters scaled by (1 - f) <= 0.2
    mu = arr_u8[::4, ::4].reshape(-1, 3).mean(axis=0, dtype=np.float32)
    A = np.eye(3, dtype=np.float64)
    b = np.zeros(3, np.float64)
    for name, f in ops:
        if name == 'brightness':
            A *= f
            b *= f
        elif name == 'contrast':
            m = float(_GRAY_W @ (A @ mu + b))
            A *= f
            b = f * b + (1.0 - f) * m
        elif name == 'saturation':
            S = f * np.eye(3) + (1.0 - f) * np.outer(
                np.ones(3), _GRAY_W)
            A = S @ A
            b = S @ b
        elif name == 'hue' and abs(f) > 1e-6:
            th = 2.0 * np.pi * f
            c, s = np.cos(th), np.sin(th)
            # the standard luma-preserving hue-rotate matrix
            # (SVG/CSS filter spec, Rec.709 luma)
            H = np.array([
                [0.213 + 0.787 * c - 0.213 * s,
                 0.715 - 0.715 * c - 0.715 * s,
                 0.072 - 0.072 * c + 0.928 * s],
                [0.213 - 0.213 * c + 0.143 * s,
                 0.715 + 0.285 * c + 0.140 * s,
                 0.072 - 0.072 * c - 0.283 * s],
                [0.213 - 0.213 * c - 0.787 * s,
                 0.715 - 0.715 * c + 0.715 * s,
                 0.072 + 0.928 * c + 0.072 * s]])
            A = H @ A
            b = H @ b
    return A, b


def jitter_normalize(arr_u8: np.ndarray, rng: np.random.RandomState,
                     brightness=0.2, contrast=0.2, saturation=0.2,
                     hue=0.1) -> np.ndarray:
    """Fused color-jitter + ImageNet-normalize: ONE 3x4 RGB affine.

    The torchvision-ColorJitter semantics (random op order, factors
    U(1-x, 1+x) / hue U(-x, x), reference pano_dataset.py:65-78) are
    composed SYMBOLICALLY instead of as four sequential PIL passes
    (measured 38.6 ms of a 56 ms loader item at 600x900 — the dominant
    camcalib-training loader cost; this path is ~7x):

      brightness f: x -> f*x
      contrast   f: x -> f*x + (1-f)*mean_gray(current)   [mean tracked
                     through the running affine, so order is honored]
      saturation f: x -> (f*I + (1-f)*1*w^T) x            [per-pixel gray]
      hue      th : rotation about the gray axis by th = 2*pi*f
                     (the standard hue-rotate matrix — DEVIATION from
                     PIL's uint8-HSV channel shift; equivalent to first
                     order, distributionally indistinguishable for
                     |f| <= 0.1)

    then clips to [0, 255] once (PIL clamps per pass; with factors
    <= 0.2 the intermediate clips are inactive except at saturated
    pixels) and applies (x/255 - mean)/std. Consumes the SAME rng draw
    pattern as :func:`color_jitter` (4 uniforms + shuffle)."""
    A, b = sample_jitter_affine(arr_u8, rng, brightness=brightness,
                                contrast=contrast, saturation=saturation,
                                hue=hue)
    # Apply: jitter affine in pixel space (cv2.transform = SIMD 3x4
    # color transform; the (N,3)@(3,3) BLAS path measured ~18 ms/item),
    # SCALAR-bounds clip (per-channel broadcast bounds measured 15 ms,
    # scalars ~3), then the ImageNet normalize folded into a second
    # tiny diagonal transform.
    scale = (1.0 / (255.0 * np.asarray(C.IMG_NORM_STD))).astype(
        np.float32)
    bias = (-np.asarray(C.IMG_NORM_MEAN)
            / np.asarray(C.IMG_NORM_STD)).astype(np.float32)
    try:
        import cv2
        out = cv2.transform(np.asarray(arr_u8, np.float32),
                            np.hstack([A, b[:, None]]))
        np.clip(out, 0.0, 255.0, out=out)
        norm = np.hstack([np.diag(scale), bias[:, None]]
                         ).astype(np.float64)
        return cv2.transform(out, norm)
    except ImportError:
        x = np.asarray(arr_u8, np.float32).reshape(-1, 3)
        out = x @ A.T.astype(np.float32) + b.astype(np.float32)
        np.clip(out, 0.0, 255.0, out=out)
        out = out * scale + bias
        return out.reshape(arr_u8.shape)


def normalize_u8(arr_u8: np.ndarray) -> np.ndarray:
    """(x/255 - mean)/std in one fused pass (the naive float64
    broadcast costs 10.6 ms at 600x900; cv2.transform's SIMD color
    transform does u8 -> normalized f32 in one shot)."""
    scale = 1.0 / (255.0 * np.asarray(C.IMG_NORM_STD))
    bias = -np.asarray(C.IMG_NORM_MEAN) / np.asarray(C.IMG_NORM_STD)
    try:
        import cv2
        m = np.hstack([np.diag(scale), bias[:, None]])
        return cv2.transform(np.asarray(arr_u8, np.float32), m)
    except ImportError:
        return (np.asarray(arr_u8, np.float32) * scale.astype(np.float32)
                + bias.astype(np.float32))


def encode_targets(vfov, pitch, roll, loss_type: str) -> dict:
    if loss_type in ('kl', 'ce'):
        return {
            'vfov': np.int32(B.angle_to_bin_index(vfov, B.VFOV_EDGES)),
            'pitch': np.int32(B.angle_to_bin_index(pitch, B.PITCH_EDGES)),
            'roll': np.int32(
                B.angle_to_bin_index(roll, B.LEGACY_ROLL_EDGES)),
        }
    return {
        'vfov': np.float32(B.vfov2soft_idx(vfov)),
        'pitch': np.float32(B.pitch2soft_idx(pitch)),
        'roll': np.float32(B.roll2soft_idx(roll)),
    }


class CameraRegressorDataset:
    """Pano360 crops + JSON annotations.

    Annotation conventions (reference pano_dataset.py:116-127):
      'pano': json next to image under annotations/, vfov in DEGREES;
      'pano_scalenet': json next to the jpg, vfov in radians.
    """

    def __init__(
        self,
        dataset_folder: str,
        dataset: str = 'pano_scalenet',
        is_train: bool = True,
        min_size: int = 600,
        max_size: int = 1000,
        loss_type: str = 'kl',
        num_images: int = -1,
        pad_multiple: int = 64,
        seed: int = 0,
        fast_decode: bool = False,
        decode_cache: int = 0,
        device_jitter: bool = False,
    ):
        import joblib

        self.dataset = dataset
        self.dataset_folder = dataset_folder
        self.is_train = is_train
        self.min_size = min_size
        self.max_size = max_size
        self.loss_type = loss_type
        self.pad_multiple = pad_multiple
        # Opt-in JPEG DCT-scaled decode (PIL draft): every pano sample is
        # resized DOWN to min-side `min_size` anyway, so decoding at the
        # nearest 1/2^k scale >= 1.15x the target keeps the final
        # bilinear resize a downsample — the only change is the
        # resampling-filter difference. No reference analogue (the
        # reference decodes full panorama-scale frames, torchvision
        # Resize after). color_jitter then also runs on the reduced
        # image (pointwise ops commute with the resample).
        self.fast_decode = fast_decode
        # Opt-in decoded+RESIZED uint8 LRU shared by loader threads:
        # epochs 2+ skip the JPEG decode and the bilinear resize (the
        # dominant per-item costs — the pano loader re-decodes every
        # crop every epoch otherwise, reference torch DataLoader
        # behavior). Cached images are pre-jitter, so with the cache on
        # color_jitter runs on the RESIZED image — the same pointwise-
        # ops-commute-with-the-resample semantics fast_decode already
        # establishes (and bit-identical for val, which never jitters).
        from spec_tpu.data.cache import FrameCache
        self._decode_cache = (FrameCache(decode_cache) if decode_cache
                              else None)
        # Device-jitter mode (DATASET.DEVICE_JITTER): items carry RAW
        # uint8 pixels plus the per-image jitter affine (A, b) sampled
        # on host; clip + normalize (+ the affine itself) run ON DEVICE
        # (ops/preprocess.device_jitter_normalize). 4x less host->device
        # transfer (u8 vs normalized f32) and the host item cost drops
        # to decode+resize. Val items carry the identity affine.
        self.device_jitter = bool(device_jitter)
        self.rng = np.random.RandomState(seed)

        split = 'train_images.pkl' if is_train else 'val_images.pkl'
        self.image_filenames = list(
            joblib.load(os.path.join(dataset_folder, split)))
        if num_images > 0:
            # Without replacement (duplicates would silently drop other
            # images from the subset), matching PanoAgoraDataset.
            n = min(num_images, len(self.image_filenames))
            self.image_filenames = list(self.rng.choice(
                self.image_filenames, n, replace=False))

    def __len__(self):
        return len(self.image_filenames)

    def _annot_path(self, imgname: str) -> str:
        if self.dataset == 'pano':
            return imgname.replace('images', 'annotations').replace(
                '.png', '.json').replace('.jpg', '.json')
        return imgname.rsplit('.', 1)[0] + '.json'

    def _decode_resized(self, imgname: str):
        """Decode + aspect-resize to the bucket target; returns
        (uint8 RGB HWC, orig (W, H)). The resize TARGET is always
        computed from the FULL-res header dims — the same numbers
        shape_buckets() predicts from. With fast_decode the
        draft-reduced dims differ (ceil rounding), and recomputing the
        scale from them can land 1 px past the predicted pad bucket,
        crashing pad_collate(fixed_hw)."""
        pil_img = Image.open(imgname)
        w0, h0 = pil_img.size
        s = resize_scale(w0, h0, self.min_size, self.max_size)
        target = (round(w0 * s), round(h0 * s))
        if self.fast_decode and s < 1.0:
            # draft never returns smaller than requested, so a 1.15x
            # margin keeps the final resize a strict downsample
            pil_img.draft(None, (int(np.ceil(w0 * s * 1.15)),
                                 int(np.ceil(h0 * s * 1.15))))
        pil_img = pil_img.convert('RGB')
        if pil_img.size != target:
            pil_img = pil_img.resize(target, Image.BILINEAR)
        return (np.asarray(pil_img, np.uint8),
                np.array((w0, h0), np.int32))

    def __getitem__(self, index: int) -> dict:
        imgname = os.path.join(self.dataset_folder, 'images',
                               self.image_filenames[index])
        if self._decode_cache is not None:
            # cached buffers are shared read-only; both consumers below
            # allocate fresh output arrays
            arr, orig_shape = self._decode_cache.get_or_compute(
                (imgname, self.min_size, self.max_size),
                lambda: self._decode_resized(imgname))
        else:
            arr, orig_shape = self._decode_resized(imgname)
        jitter_ab = None
        if self.device_jitter:
            # Raw u8 out; jitter affine sampled here (host has the
            # pixels for the contrast mean), applied on DEVICE together
            # with clip + normalize. Same rng draw pattern as the host
            # path, so seeds line up across modes.
            img = arr
            if self.is_train:
                A, b = sample_jitter_affine(arr, self.rng)
            else:
                A, b = np.eye(3), np.zeros(3)
            jitter_ab = (A.astype(np.float32), b.astype(np.float32))
        elif self.is_train:
            # DEVIATIONS from the reference aug (documented, val is
            # bit-unaffected — it never jitters):
            # - jitter runs on the RESIZED image, not before Resize
            #   (camcalib/pano_dataset.py:72-75): pointwise ops commute
            #   with the resample (the fast_decode precedent), and the
            #   decode cache stores pre-jitter pixels so every epoch
            #   draws fresh jitter;
            # - the four ColorJitter passes are composed into ONE fused
            #   affine (jitter_normalize) — same factor distributions
            #   and order semantics, hue as a gray-axis rotation.
            img = jitter_normalize(arr, self.rng)
        else:
            img = normalize_u8(arr)

        with open(self._annot_path(imgname)) as f:
            data = json.load(f)
        pitch = float(data['pitch'])
        roll = float(data['roll'])
        vfov = (np.radians(float(data['vfov'])) if self.dataset == 'pano'
                else float(data['vfov']))

        item = {
            'img': img,
            'imgname': imgname,
            'orig_shape': orig_shape,
            'vfov_angle': np.float32(vfov),
            'pitch_angle': np.float32(pitch),
            'roll_angle': np.float32(roll),
        }
        if jitter_ab is not None:
            item['jitter_A'], item['jitter_b'] = jitter_ab
        item.update(encode_targets(vfov, pitch, roll, self.loss_type))
        return item

    # -- static-shape batching helpers ----------------------------------

    def bucket_of(self, shape) -> tuple:
        m = self.pad_multiple
        h, w = shape[:2]
        return (-(-h // m) * m, -(-w // m) * m)

    def shape_buckets(self) -> dict:
        """Indices grouped by padded bucket (header-only reads)."""
        buckets = defaultdict(list)
        for i, name in enumerate(self.image_filenames):
            path = os.path.join(self.dataset_folder, 'images', name)
            with Image.open(path) as im:
                w, h = im.size
            s = resize_scale(w, h, self.min_size, self.max_size)
            buckets[self.bucket_of((round(h * s), round(w * s)))].append(i)
        return dict(buckets)


def pad_collate(items: Sequence[dict], pad_multiple: int = 64,
                fixed_hw: Optional[tuple] = None) -> dict:
    """Zero-pad variable-size images to a common bucket and stack
    (the reference ImageList pad-collator, pano_dataset.py:223-306, with
    the pad target rounded to a bucket grid for stable XLA shapes)."""
    shapes = np.array([it['img'].shape[:2] for it in items])
    if fixed_hw is None:
        m = pad_multiple
        H = int(-(-shapes[:, 0].max() // m) * m)
        W = int(-(-shapes[:, 1].max() // m) * m)
    else:
        H, W = fixed_hw
    # device-jitter items carry raw uint8 — preserve the dtype (the
    # whole point is the 4x smaller upload)
    imgs = np.zeros((len(items), H, W, 3), items[0]['img'].dtype)
    mask = np.zeros((len(items), H, W), np.float32)
    for i, it in enumerate(items):
        h, w = it['img'].shape[:2]
        imgs[i, :h, :w] = it['img']
        mask[i, :h, :w] = 1.0
    out = {'img': imgs, 'pad_mask': mask,
           'true_shape': shapes.astype(np.int32)}
    for k in items[0]:
        if k == 'img':
            continue
        vals = [it[k] for it in items]
        out[k] = vals if isinstance(vals[0], str) else np.stack(vals)
    return out

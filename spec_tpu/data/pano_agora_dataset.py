"""Pano360 + AGORA merged CamCalib dataset (reference
``camcalib/pano_agora_dataset.py:102-183``): annotations come from one
merged npz (``pano_agora_dataset_{split}.npz`` with imgname / pitch /
roll / vfov in radians) instead of per-image JSONs. The offline merge
lives in :mod:`spec_tpu.datagen.pano_agora` (reference :48-99: AGORA vfov
from focal ``2*atan(1080/2/f)``)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from spec_tpu.core import constants as C
from spec_tpu.data.pano_dataset import (
    aspect_resize,
    encode_targets,
    jitter_normalize,
    normalize_u8,
    sample_jitter_affine,
    resize_scale,
)


class PanoAgoraDataset:
    def __init__(
        self,
        dataset_folder: str,
        is_train: bool = True,
        min_size: int = 600,
        max_size: int = 1000,
        loss_type: str = 'kl',
        num_images: int = -1,
        pad_multiple: int = 64,
        seed: int = 0,
        decode_cache: int = 0,
        device_jitter: bool = False,
    ):
        self.dataset_folder = dataset_folder
        self.is_train = is_train
        self.min_size = min_size
        self.max_size = max_size
        self.loss_type = loss_type
        self.pad_multiple = pad_multiple
        # Decoded+resized uint8 LRU, pre-jitter (see
        # CameraRegressorDataset — identical semantics).
        from spec_tpu.data.cache import FrameCache
        self._decode_cache = (FrameCache(decode_cache) if decode_cache
                              else None)
        # u8 items + per-image jitter affine, applied on device (see
        # CameraRegressorDataset.device_jitter — identical semantics).
        self.device_jitter = bool(device_jitter)
        self.rng = np.random.RandomState(seed)

        split = 'train' if is_train else 'val'
        data = np.load(
            os.path.join(dataset_folder, f'pano_agora_dataset_{split}.npz'),
            allow_pickle=True)
        self.imgname = data['imgname']
        self.pitch = data['pitch'].astype(np.float32)
        self.roll = data['roll'].astype(np.float32)
        self.vfov = data['vfov'].astype(np.float32)
        if num_images > 0:
            sel = self.rng.choice(len(self.imgname), num_images,
                                  replace=False)
            self.imgname = self.imgname[sel]
            self.pitch, self.roll, self.vfov = (
                self.pitch[sel], self.roll[sel], self.vfov[sel])

    def __len__(self):
        return len(self.imgname)

    def _decode_resized(self, imgname: str):
        pil_img = Image.open(imgname).convert('RGB')
        orig_shape = np.array(pil_img.size, np.int32)
        pil_img = aspect_resize(pil_img, self.min_size, self.max_size)
        return np.asarray(pil_img, np.uint8), orig_shape

    def __getitem__(self, index: int) -> dict:
        imgname = os.path.join(self.dataset_folder, str(self.imgname[index]))
        if self._decode_cache is not None:
            arr, orig_shape = self._decode_cache.get_or_compute(
                (imgname, self.min_size, self.max_size),
                lambda: self._decode_resized(imgname))
        else:
            arr, orig_shape = self._decode_resized(imgname)
        jitter_ab = None
        if self.device_jitter:
            img = arr
            if self.is_train:
                A, b = sample_jitter_affine(arr, self.rng)
            else:
                A, b = np.eye(3), np.zeros(3)
            jitter_ab = (A.astype(np.float32), b.astype(np.float32))
        elif self.is_train:
            # fused affine jitter on the RESIZED image (deviations
            # shared with CameraRegressorDataset — see its __getitem__)
            img = jitter_normalize(arr, self.rng)
        else:
            img = normalize_u8(arr)

        vfov = float(self.vfov[index])
        pitch = float(self.pitch[index])
        roll = float(self.roll[index])
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

    def shape_buckets(self) -> dict:
        from collections import defaultdict

        m = self.pad_multiple
        buckets = defaultdict(list)
        for i in range(len(self.imgname)):
            path = os.path.join(self.dataset_folder, str(self.imgname[i]))
            with Image.open(path) as im:
                w, h = im.size
            s = resize_scale(w, h, self.min_size, self.max_size)
            hh, ww = round(h * s), round(w * s)
            buckets[(-(-hh // m) * m, -(-ww // m) * m)].append(i)
        return dict(buckets)

"""Folder-of-images dataset for CamCalib inference
(reference ``camcalib/pano_dataset.py:147-181`` ``ImageFolder``).

torchvision-``Resize(min_size)`` semantics (smaller edge -> min_size,
bilinear, PIL) so released-checkpoint predictions match. For the TPU the
demo groups images by their post-resize shape and runs each group as one
jitted batch (the reference loops batch-1 per image,
``scripts/camcalib_demo.py:95-100``).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import List, Sequence

import numpy as np
from PIL import Image

from spec_tpu.core import constants as C

IMG_EXTS = ('.jpg', '.jpeg', '.png')


def list_images(folder: str) -> List[str]:
    return sorted(
        os.path.join(folder, x) for x in os.listdir(folder)
        if x.lower().endswith(IMG_EXTS) and not x.startswith('.'))


def resize_min_side(pil_img: Image.Image, min_size: int) -> Image.Image:
    w, h = pil_img.size
    s = min_size / min(w, h)
    return pil_img.resize((round(w * s), round(h * s)), Image.BILINEAR)


class ImageFolder:
    def __init__(self, image_list: Sequence[str], min_size: int = 600,
                 normalize: bool = True):
        self.image_filenames = list(image_list)
        self.min_size = min_size
        self.normalize = normalize

    def __len__(self):
        return len(self.image_filenames)

    def __getitem__(self, index: int) -> dict:
        imgname = self.image_filenames[index]
        pil_img = Image.open(imgname).convert('RGB')
        orig_w, orig_h = pil_img.size
        pil_img = resize_min_side(pil_img, self.min_size)
        if self.normalize:
            # fused f32 (x/255 - mean)/std — the f64-broadcast version
            # measured 10.6 ms at 600x900, ~most of serving host prep
            from spec_tpu.data.pano_dataset import normalize_u8
            img = normalize_u8(np.asarray(pil_img, np.uint8))
        else:
            img = np.asarray(pil_img, np.float32) / 255.0
        return {
            'img': np.asarray(img, np.float32),     # HWC (no-copy: both
                                                    # branches emit f32)
            'imgname': imgname,
            'orig_shape': np.array([orig_w, orig_h], np.int32),  # (W, H)
        }

    def shape_buckets(self) -> dict:
        """Group indices by post-resize (H, W) so each bucket compiles one
        static-shape batch. Reads only headers (PIL lazy open)."""
        buckets = defaultdict(list)
        for i, name in enumerate(self.image_filenames):
            with Image.open(name) as im:
                w, h = im.size
            s = self.min_size / min(w, h)
            buckets[(round(h * s), round(w * s))].append(i)
        return dict(buckets)

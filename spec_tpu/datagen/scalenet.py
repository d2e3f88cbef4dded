"""ScaleNet-recipe Pano360 crop generator (reference
``camcalib/datagen/generateCalibrationDataset.py:58-126`` +
``image_extraction.py:28-161``).

Camera sampling (reference :58-126):
  focal (35mm-equiv) ~ lognormal(sigma=0.8, loc=14, scale=17), clamp
  [12, 100] mm; vfov = 2*atan2(24, 2*f35) (24mm full-frame sensor height);
  horizon midline crossing ~ N(0.523, 0.3) clamped (-1, 0.95) as a
  fraction of image height -> pitch = atan((0.5 - horizon) * h / f_px);
  roll ~ Cauchy, two scales (low-roll regime ~33% of the time), clamped
  to +-pi/6; aspect ratio ~ {1:1, 5:4, 4:3, 3:2, 16:9} with probs
  {0.09, 0.01, 0.21, 0.45, 0.24}, landscape 80% / portrait 20%.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from spec_tpu.datagen.projection import equirect_to_perspective

ASPECT_RATIOS = [(1, 1), (5, 4), (4, 3), (3, 2), (16, 9)]
ASPECT_PROBS = [0.09, 0.01, 0.21, 0.45, 0.24]
SENSOR_HEIGHT_MM = 24.0


def sample_scalenet_cam(rng: np.random.RandomState, base_h: int = 600):
    """One ScaleNet camera draw. Returns dict incl. derived vfov/pitch."""
    f35 = 14.0 + 17.0 * np.exp(0.8 * rng.randn())
    f35 = float(np.clip(f35, 12.0, 100.0))
    vfov = 2.0 * np.arctan2(SENSOR_HEIGHT_MM, 2.0 * f35)

    horizon = float(np.clip(rng.normal(0.523, 0.3), -1.0, 0.95))

    scale = 0.022 if rng.rand() < 0.33 else 0.145  # two-regime Cauchy
    roll = float(np.clip(scale * np.tan(np.pi * (rng.rand() - 0.5)),
                         -np.pi / 6, np.pi / 6))

    ar_w, ar_h = ASPECT_RATIOS[rng.choice(len(ASPECT_RATIOS),
                                          p=ASPECT_PROBS)]
    landscape = rng.rand() < 0.8
    if landscape:
        h, w = base_h, int(round(base_h * ar_w / ar_h))
    else:
        h, w = int(round(base_h * ar_w / ar_h)), base_h

    f_px = (h / 2.0) / np.tan(vfov / 2.0)
    pitch = float(np.arctan((0.5 - horizon) * h / f_px))
    return {
        'f35': f35, 'vfov': float(vfov), 'pitch': pitch, 'roll': roll,
        'horizon': horizon, 'yaw': float(rng.uniform(0, 2 * np.pi)),
        'resolution': (h, w),
    }


def generate_calibration_dataset(
    pano_files: List[str],
    out_folder: str,
    crops_per_pano: int = 12,
    seed: int = 0,
    val_ratio: float = 0.1,
) -> dict:
    """Crops + per-image JSONs in the 'pano_scalenet' layout (json next to
    the jpg, vfov in radians — reference pano_dataset.py:122-127)."""
    import cv2
    import joblib

    img_dir = os.path.join(out_folder, 'images')
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    n_val = max(1, int(len(pano_files) * val_ratio)) \
        if len(pano_files) > 1 else 0
    val_panos = set(pano_files[:n_val])
    splits = {'train_images': [], 'val_images': []}

    for pano_path in pano_files:
        # Per-pano fault isolation (the sibling generator in
        # pano_preprocessing logs and continues for the same reason): one
        # corrupt jpg must not abort a multi-hour generation run with
        # nothing written.
        raw = cv2.imread(pano_path)
        if raw is None:
            print(f'[scalenet-datagen] unreadable panorama skipped: '
                  f'{pano_path}')
            continue
        pano = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        stem = os.path.splitext(os.path.basename(pano_path))[0]
        for k in range(crops_per_pano):
            cam = sample_scalenet_cam(rng)
            crop = equirect_to_perspective(
                pano, cam['vfov'], cam['pitch'], cam['roll'], cam['yaw'],
                cam['resolution'])
            name = f'{stem}_sn_{k:02d}.jpg'
            cv2.imwrite(os.path.join(img_dir, name),
                        cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))
            with open(os.path.join(img_dir, name.replace('.jpg', '.json')),
                      'w') as f:
                json.dump({
                    'pitch': cam['pitch'], 'roll': cam['roll'],
                    'vfov': cam['vfov'],  # radians (pano_scalenet)
                    'f_35mm': cam['f35'], 'horizon': cam['horizon'],
                    'yaw': cam['yaw'],
                }, f)
            key = ('val_images' if pano_path in val_panos
                   else 'train_images')
            splits[key].append(name)

    for key, names in splits.items():
        joblib.dump(names, os.path.join(out_folder, f'{key}.pkl'))
    return splits

"""Merge Pano360 crops with AGORA camera annotations into the
``pano_agora_dataset_{split}.npz`` files the PanoAgoraDataset consumes
(reference ``camcalib/pano_agora_dataset.py:48-99`` ``preprocess_data``).

AGORA supplies per-image (pitch, roll, focal); its vfov derives from the
1080p frame height: ``vfov = 2 * atan(1080 / (2 * f))`` (reference :75).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

AGORA_IMG_HEIGHT = 1080.0


def agora_vfov_from_focal(focal_px) -> np.ndarray:
    return 2.0 * np.arctan(AGORA_IMG_HEIGHT / (2.0 * np.asarray(focal_px)))


def merge_pano_agora(
    pano_folder: str,
    agora_annots: Dict[str, dict],
    out_folder: str,
    val_ratio: float = 0.05,
    seed: int = 0,
):
    """Args:
      pano_folder: output of a Pano360 crop generator ('pano' layout).
      agora_annots: {relative_imgname: {'pitch','roll','focal'}}.
    Writes pano_agora_dataset_{train,val}.npz with imgname/pitch/roll/vfov.
    """
    import joblib

    names: List[str] = []
    pitches: List[float] = []
    rolls: List[float] = []
    vfovs: List[float] = []

    # Pano crops (vfov stored in degrees in the 'pano' layout).
    for split in ('train_images.pkl', 'val_images.pkl'):
        path = os.path.join(pano_folder, split)
        if not os.path.exists(path):
            continue
        for name in joblib.load(path):
            annot_path = os.path.join(
                pano_folder, 'annotations',
                name.replace('.jpg', '.json').replace('.png', '.json'))
            with open(annot_path) as f:
                a = json.load(f)
            names.append(os.path.join('images', name))
            pitches.append(float(a['pitch']))
            rolls.append(float(a['roll']))
            vfovs.append(float(np.radians(a['vfov'])))

    # AGORA images.
    for name, a in agora_annots.items():
        names.append(name)
        pitches.append(float(a['pitch']))
        rolls.append(float(a['roll']))
        vfovs.append(float(agora_vfov_from_focal(a['focal'])))

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(names))
    n_val = max(1, int(len(names) * val_ratio))
    val_idx = set(order[:n_val].tolist())

    os.makedirs(out_folder, exist_ok=True)
    for split in ('train', 'val'):
        sel = [i for i in range(len(names))
               if (i in val_idx) == (split == 'val')]
        np.savez(
            os.path.join(out_folder, f'pano_agora_dataset_{split}.npz'),
            imgname=np.array([names[i] for i in sel]),
            pitch=np.array([pitches[i] for i in sel], np.float32),
            roll=np.array([rolls[i] for i in sel], np.float32),
            vfov=np.array([vfovs[i] for i in sel], np.float32))
    return len(names)

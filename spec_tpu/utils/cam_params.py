"""CamCalib result IO (reference ``spec/utils/cam_params.py:24-49``).

The stage-1 -> stage-2 ABI: a per-image pickle with {vfov, f_pix, pitch,
roll}; consumed as a camera rotation R = euler(pitch, 0, roll) and
intrinsics K = [[f,0,cx],[0,f,cy],[0,0,1]] with the principal point at the
image center. Kept for CLI compatibility — the fused pipeline passes these
tensors in HBM instead (SURVEY.md §2.4 last row).
"""

from __future__ import annotations

import os

import joblib
import numpy as np


def read_cam_params(pkl_path: str, img_w: float, img_h: float):
    """-> (cam_rotmat (3,3), cam_int (3,3), vfov, pitch, roll, f_pix)."""
    data = joblib.load(pkl_path)
    pitch = float(data['pitch'])
    roll = float(data['roll'])
    vfov = float(data['vfov'])
    f_pix = float(data['f_pix'])

    # PARE batch_euler2matrix order: Rx(pitch) @ Rz(roll) — shared
    # definition (core.geometry.euler_pitch_roll_np).
    from spec_tpu.core.geometry import euler_pitch_roll_np
    rotmat = euler_pitch_roll_np(pitch, roll)

    K = np.array([[f_pix, 0, img_w / 2.0],
                  [0, f_pix, img_h / 2.0],
                  [0, 0, 1]], np.float32)
    return rotmat, K, vfov, pitch, roll, f_pix


def cam_params_path(out_folder: str, imgname: str) -> str:
    return os.path.join(out_folder, 'camcalib',
                        os.path.basename(imgname) + '.pkl')

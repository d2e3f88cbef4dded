"""Standalone offline metric CLI (reference usage pattern:
``spec/utils/compute_error.py`` run on a dumped ``evaluation_results_{ds}
.pkl``). Recomputes the headline W-MPJPE / PA-MPJPE / W-PVE table from the
saved predicted vertices + dataset annotations, entirely on device.

Usage:
  python -m spec_tpu.cli.compute_error --results_file \
      logs/.../evaluation_results_3dpw-test-cam.pkl
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--results_file', type=str, required=True)
    parser.add_argument('--dataset', type=str, default='',
                        help='override dataset name (default: parsed from '
                             'the filename)')
    args = parser.parse_args(argv)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    import joblib
    from spec_tpu.cli.spec_eval import _pred_rotmats
    from spec_tpu.core import smpl as S
    from spec_tpu.data import CamDataset
    from spec_tpu.eval.evaluator import compute_error
    from spec_tpu.utils import paths

    ds_name = args.dataset or os.path.basename(args.results_file).replace(
        'evaluation_results_', '').replace('.pkl', '')
    annot = paths.dataset_files()[ds_name]
    ds = CamDataset(annot, paths.dataset_folders().get(ds_name, ''),
                    dataset=ds_name, is_train=False)

    results = joblib.load(args.results_file)
    pred_vertices = np.asarray(results['vertices'], np.float32)

    smpl_dir = paths.smpl_model_dir()
    if os.path.isdir(smpl_dir) and os.listdir(smpl_dir):
        assets = S.load_smpl_assets(
            smpl_dir, gender='neutral',
            j_regressor_h36m_path=paths.j_regressor_h36m_path())
    else:
        print('[compute_error] WARNING: SMPL assets missing; synthetic')
        assets = S.create_test_assets()
    jreg = (np.load(paths.j_regressor_h36m_path())
            if os.path.exists(paths.j_regressor_h36m_path())
            else np.asarray(assets.j_regressor_h36m))

    headline = compute_error(
        ds_name, pred_vertices,
        pred_cam_rotmat=_pred_rotmats(ds)[:len(pred_vertices)],
        gt_pose=ds.pose[:len(pred_vertices)],
        gt_betas=ds.betas[:len(pred_vertices)],
        assets=assets, j_regressor_h36m=jreg,
        gt_pose_cam=(ds.pose_cam[:len(pred_vertices)]
                     if ds.pose_cam is not None else None),
        gt_cam_rotmat=(np.asarray(ds.cam_rotmat[:len(pred_vertices)],
                                  np.float32)
                       if ds.cam_rotmat is not None else None))
    print(f'***** RESULTS ON {ds_name.upper()} *****')
    print(json.dumps(headline, indent=2, default=float))

    log_path = args.results_file.replace('.pkl', '_analysis.log')
    with open(log_path, 'a') as f:
        f.write(json.dumps({'dataset': ds_name, **headline},
                           default=float) + '\n')
    return headline


if __name__ == '__main__':
    main()

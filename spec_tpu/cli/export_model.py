"""``spec_export``: package the two-stage pipeline as a ``.specx`` AOT
artifact (serialized StableHLO + weights + config; see
:mod:`spec_tpu.export`).

Typical flow::

    spec_export --spec_ckpt ckpt.pt --camcalib_ckpt cam.ckpt \
        --output spec.specx --platforms cpu,tpu
    spec_serve --exported spec.specx            # or export.load_predictor

No reference equivalent (the reference deploys by cloning the repo and
reloading checkpoints, ``spec/tester.py:49-88``).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Export the SPEC two-stage pipeline to a .specx '
                    'AOT artifact')
    parser.add_argument('--output', type=str, required=True,
                        help='artifact path (convention: *.specx)')
    parser.add_argument('--spec_ckpt', type=str, default='')
    parser.add_argument('--camcalib_ckpt', type=str, default='')
    parser.add_argument('--cfg', type=str, default='',
                        help='SPEC config yaml shipped with the ckpt '
                             '(HMR.BACKBONE / USE_CAM_FEATS)')
    parser.add_argument('--smpl_model_dir', type=str, default='')
    parser.add_argument('--backbone', type=str, default='resnet50')
    parser.add_argument('--camcalib_backbone', type=str, default='resnet50')
    parser.add_argument('--loss_type', type=str,
                        default='softargmax_biased_l2',
                        help='CamCalib bin decode flavor')
    parser.add_argument('--min_size', type=int, default=600,
                        help='stage-1 resize target recorded in the '
                             'artifact (reference Resize(600))')
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--platforms', type=str, default='cpu,tpu',
                        help='comma list of target platforms for the '
                             'cross-platform lowering')
    args = parser.parse_args(argv)

    from spec_tpu.export import export_predictor
    from spec_tpu.serving import SpecPredictor

    # use_fused_lbs=False: the exported program must stay portable
    # across the requested platforms (Pallas custom calls are TPU-only
    # jit-time optimizations, not serialization material).
    pred = SpecPredictor(
        spec_ckpt=args.spec_ckpt, camcalib_ckpt=args.camcalib_ckpt,
        cfg_file=args.cfg, smpl_model_dir=args.smpl_model_dir,
        backbone=args.backbone, camcalib_backbone=args.camcalib_backbone,
        loss_type=args.loss_type, min_size=args.min_size,
        batch_size=args.batch_size, use_fused_lbs=False)
    platforms = tuple(p.strip() for p in args.platforms.split(',')
                      if p.strip())
    out = export_predictor(pred, args.output, platforms=platforms)
    print(f'[export] wrote {out} ({os.path.getsize(out) / 2**20:.1f} MiB, '
          f'platforms={list(platforms)})')


if __name__ == '__main__':
    main()

"""Angle-MAE recovery at reduced serving buckets, measured with the REAL
CameraRegressorNetwork through the SHIPPED surfaces.

CLAUDE.md's round-2 bucket study used a proxy script (resnet18 + custom
training loop on synthetic horizons). This tool re-runs the experiment
end-to-end on the real stack:

  1. synthetic horizon panoramas -> the real ScaleNet datagen CLI
     (spec_tpu.datagen.scalenet, the reference's Pano360 recipe);
  2. base training with the released recipe config
     (configs/camcalib/config_sa_bias_l2.yaml, min-side 600) via the
     camcalib_train CLI;
  3. eval of the base checkpoint SERVED at min-600 (native) vs the
     reduced bucket picked by --min_size (384/448/512 — 512x672 is the
     headline bench bucket);
  4. fine-tune with the shipped reduced-bucket preset
     (configs/camcalib/config_sa_bias_l2_min{N}.yaml,
     TRAINING.PRETRAINED = the base checkpoint) via camcalib_train;
  5. eval of the fine-tuned checkpoint at the reduced bucket (recovery).

Prints one JSON line:
  {"...base_served_at_600": {...MAE deg...}, "...base_served_at_N": ...,
   "...finetuned_at_N": ...}

Run on the TPU chip (the two trainings are a few hundred steps; compile
count is bounded by the aspect-bucket set and cached persistently).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_horizon_panos(pano_dir, n, seed=0, hw=(2048, 4096)):
    """Equirect panoramas with a sharp, finely-textured horizon.

    Two properties make the bucket study meaningful (both were missing
    from a first low-res draft, which measured NO ladder penalty —
    serving min-448 cost nothing because there was nothing to lose):

    - the source must out-resolve the crops: at 512px/360deg a ~60deg
      gnomonic crop spans ~85 source pixels blown up to min-side 600,
      so min-448 serving loses no information. 4096px/360deg puts a
      60deg crop at ~680 source px — min-600 is ~1:1 sampling and
      smaller serving buckets genuinely discard detail;
    - the horizon transition + texture must be high-frequency: angle
      accuracy then depends on localizing a few-pixel-wide boundary,
      i.e. on resolution, like real pano imagery (multi-octave
      azimuthal/latitudinal texture, ~0.5deg sigmoid transition).
    """
    import cv2

    os.makedirs(pano_dir, exist_ok=True)
    H, W = hw
    rng = np.random.RandomState(seed)
    lat = np.linspace(np.pi / 2, -np.pi / 2, H)[:, None]      # +90..-90
    lon = np.linspace(-np.pi, np.pi, W)[None, :]
    for i in range(n):
        sky = 1.0 / (1.0 + np.exp(-lat * (200 + 80 * rng.rand())))
        # multi-octave texture; amplitude damped toward the poles
        tex = np.zeros((H, W))
        for (fl, fa) in ((3, 5), (17, 11), (61, 43), (211, 157)):
            tex += (np.sin(lon * (fl + i % 5) + rng.rand() * 6)
                    * np.cos(lat * (fa + i % 3) + rng.rand() * 6)) / 2.0
        base = 40 + 170 * sky + 30 * tex * (0.3 + 0.7 * np.cos(lat))
        # Roll-sensitive detail (r5): sharp longitude-aligned stripes.
        # World-vertical structure projects to straight lines whose
        # in-crop tilt IS the roll (the datagen applies roll in-plane),
        # and the high lon-frequency square-ish profile makes localizing
        # that tilt depend on serving resolution — the cue real imagery
        # gets from buildings/posts, which the horizon-only first
        # texture lacked (roll MAE floored at 5.4deg in r4's artifact).
        kstr = 211 + 31 * (i % 5)
        stripes = np.tanh(6.0 * np.sin(lon * kstr + rng.rand() * 6.28))
        base += 25 * stripes * np.cos(lat) ** 2
        img = np.stack([base * 0.9, base, base * 1.1], -1)
        img += rng.randn(H, W, 3) * 6
        cv2.imwrite(os.path.join(pano_dir, f'p{i:03d}.jpg'),
                    np.clip(img, 0, 255).astype('u1'))


def eval_mae(ckpt_dir, backbone, min_size, max_size, batch_size=16):
    """Val-split MAE (degrees) of a saved orbax checkpoint, SERVED at the
    given resize bucket (the quantity the bucket ladder trades)."""
    import jax
    import jax.numpy as jnp

    from spec_tpu.core import bins as B
    from spec_tpu.data.pano_dataset import CameraRegressorDataset, pad_collate
    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.train import adam, create_train_state
    from spec_tpu.utils import paths
    from spec_tpu.utils.checkpoints import restore_checkpoint

    model = CameraRegressorNetwork(backbone=backbone)
    template = create_train_state(
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, min_size, min_size, 3))), adam(1e-4))
    # adam trees are identical across LRs, so the adam(1e-4) template
    # restores checkpoints from every recipe this tool trains.
    state = restore_checkpoint(ckpt_dir, template)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    ds = CameraRegressorDataset(
        paths.dataset_folders()['pano360'], dataset='pano_scalenet',
        is_train=False, min_size=min_size, max_size=max_size,
        loss_type='softargmax_biased_l2')

    @jax.jit
    def infer(v, img):
        return B.convert_preds_to_angles(
            *model.apply(v, img), loss_type='softargmax_biased_l2')

    errs = {'vfov': [], 'pitch': [], 'roll': []}
    buckets = ds.shape_buckets()
    for hw, idxs in sorted(buckets.items()):
        for s0 in range(0, len(idxs), batch_size):
            chunk = idxs[s0:s0 + batch_size]
            items = [ds[i] for i in chunk]
            batch = pad_collate(items, fixed_hw=hw)
            vfov, pitch, roll = infer(variables, jnp.asarray(batch['img']))
            for name, pred in (('vfov', vfov), ('pitch', pitch),
                               ('roll', roll)):
                gt = np.array([it[f'{name}_angle'] for it in items])
                errs[name].extend(
                    np.abs(np.asarray(pred)[:len(items)] - gt))
    return {k: round(float(np.degrees(np.mean(v))), 4)
            for k, v in errs.items()}


def latest_ckpt_dir(log_root):
    dirs = sorted(glob.glob(os.path.join(log_root, '**', 'checkpoints'),
                            recursive=True), key=os.path.getmtime)
    assert dirs, f'no checkpoints under {log_root}'
    return dirs[-1]


# Serving-bucket ladder: min-side -> max-side (the reference ratio
# 600/1000, camcalib/config.py MIN/MAX_RES; matches the shipped
# configs/camcalib/config_sa_bias_l2_min{N}.yaml recipes).
BUCKETS = {384: 640, 448: 744, 512: 852}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='bucket-ladder MAE recovery with the real network')
    parser.add_argument('--workdir', default='/tmp/ft_recovery')
    parser.add_argument('--backbone', default='resnet18',
                        help='resnet18 keeps the chip run short; the '
                             'shipped recipes pin resnet50')
    parser.add_argument('--min_size', type=int, default=448,
                        choices=sorted(BUCKETS),
                        help='reduced serving bucket to measure and '
                             'fine-tune at (each has a shipped recipe '
                             'config)')
    parser.add_argument('--panos', type=int, default=40)
    parser.add_argument('--batch', type=int, default=16)
    parser.add_argument('--base_epochs', type=int, default=8)
    parser.add_argument('--ft_epochs', type=int, default=4)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--json', default='',
                        help='also write the result line to this file '
                             '(committed as FT_RECOVERY_r{N}.json)')
    args = parser.parse_args(argv)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    root = os.path.join(args.workdir, 'data')
    pano_src = os.path.join(args.workdir, 'panos')
    out = os.path.join(root, 'dataset_folders', 'pano360')
    os.environ['SPEC_DATA_ROOT'] = root

    from spec_tpu.cli import camcalib_train
    from spec_tpu.datagen import scalenet

    if not os.path.exists(os.path.join(out, 'train_images.pkl')):
        make_horizon_panos(pano_src, args.panos)
        scalenet.main([pano_src, out, '--crops_per_pano', '12',
                       '--val_ratio', '0.15',
                       '--workers', str(args.workers)])

    common = ['MODEL.BACKBONE', args.backbone,
              'DATASET.BATCH_SIZE', str(args.batch),
              'DATASET.NUM_WORKERS', str(args.workers),
              'TRAINING.LOG_SAVE_INTERVAL', '20',
              'TRAINING.LOG_FREQ_TB_IMAGES', '0']

    base_logs = os.path.join(args.workdir, 'logs_base')
    camcalib_train.main(
        ['--cfg', 'configs/camcalib/config_sa_bias_l2.yaml',
         '--log_root', base_logs, '--opts',
         'TRAINING.MAX_EPOCHS', str(args.base_epochs)] + common)
    base_ckpt = latest_ckpt_dir(base_logs)

    mn, mx = args.min_size, BUCKETS[args.min_size]
    base_600 = eval_mae(base_ckpt, args.backbone, 600, 1000, args.batch)
    base_red = eval_mae(base_ckpt, args.backbone, mn, mx, args.batch)

    ft_logs = os.path.join(args.workdir, f'logs_ft{mn}')
    camcalib_train.main(
        ['--cfg', f'configs/camcalib/config_sa_bias_l2_min{mn}.yaml',
         '--log_root', ft_logs, '--opts',
         'TRAINING.PRETRAINED', base_ckpt,
         'TRAINING.MAX_EPOCHS', str(args.ft_epochs)] + common)
    ft_ckpt = latest_ckpt_dir(ft_logs)
    ft_red = eval_mae(ft_ckpt, args.backbone, mn, mx, args.batch)

    import time

    import jax

    result = {
        'backbone': args.backbone,
        'train_crops': 'scalenet datagen, synthetic horizon panos '
                       '(+ roll-sensitive vertical-stripe detail, r5)',
        'MAE_deg_base_served_at_600': base_600,
        f'MAE_deg_base_served_at_{mn}': base_red,
        f'MAE_deg_finetuned_at_{mn}': ft_red,
        'backend': jax.default_backend(),
        'measured_at': time.time(),
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(result, f, indent=1)


if __name__ == '__main__':
    main()
